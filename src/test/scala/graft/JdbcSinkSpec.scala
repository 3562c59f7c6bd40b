package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sinks.{JdbcSink, MergeSink}
import graft.sinks.JdbcSink.{Config, Derby, MySql, Postgres}

/** The live JDBC sink: statement emission per dialect, and the Derby
  * dialect EXECUTED against an embedded in-memory database — create,
  * evolve, MERGE-upsert, tombstone DELETE — checked equal to the
  * Spark-side [[MergeSink]] semantics on the same changelog. */
class JdbcSinkSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("name", StringType, nullable = true),
    StructField("bal", DoubleType, nullable = true)))

  test("MySQL upsert is INSERT .. ON DUPLICATE KEY UPDATE of non-keys") {
    assert(MySql.upsert("t", schema, Seq("id")) === JdbcSink.Native(
      "INSERT INTO `t` (`id`, `name`, `bal`) VALUES (?, ?, ?) " +
        "ON DUPLICATE KEY UPDATE `name`=VALUES(`name`), `bal`=VALUES(`bal`)"))
  }

  test("Postgres upsert is INSERT .. ON CONFLICT DO UPDATE; all-key tables DO NOTHING") {
    assert(Postgres.upsert("t", schema, Seq("id")) === JdbcSink.Native(
      "INSERT INTO \"t\" (\"id\", \"name\", \"bal\") VALUES (?, ?, ?) " +
        "ON CONFLICT (\"id\") DO UPDATE SET \"name\"=EXCLUDED.\"name\", \"bal\"=EXCLUDED.\"bal\""))
    val keysOnly = StructType(schema.fields.take(1))
    assert(Postgres.upsert("t", keysOnly, Seq("id")) === JdbcSink.Native(
      "INSERT INTO \"t\" (\"id\") VALUES (?) ON CONFLICT (\"id\") DO NOTHING"))
  }

  test("Derby upsert is the portable UPDATE-then-INSERT pair") {
    assert(Derby.upsert("t", schema, Seq("id")) === JdbcSink.UpdateThenInsert(
      "UPDATE \"t\" SET \"name\" = ?, \"bal\" = ? WHERE \"id\" = ?",
      "INSERT INTO \"t\" (\"id\", \"name\", \"bal\") VALUES (?, ?, ?)"))
  }

  test("composite-PK delete conjoins all key columns") {
    assert(MySql.deleteSql("t", Seq("a", "b")) ===
      "DELETE FROM `t` WHERE `a` = ? AND `b` = ?")
  }

  test("create DDL maps types per dialect and pins NOT NULL keys") {
    val withTypes = StructType(schema.fields ++ Seq(
      StructField("d", DateType), StructField("ts", TimestampType),
      StructField("dec", DecimalType(12, 2))))
    val mysql = MySql.createTableSql("t", withTypes, Seq("id"))
    assert(mysql.contains("`id` BIGINT NOT NULL"))
    assert(mysql.contains("`name` TEXT"))
    assert(mysql.contains("`ts` TIMESTAMP(6)")) // micros survive
    assert(mysql.contains("`dec` DECIMAL(12,2)"))
    assert(mysql.endsWith("PRIMARY KEY (`id`))"))
    // a string PK needs a bounded type for the index
    val strKey = StructType(Seq(StructField("k", StringType, nullable = false)))
    assert(MySql.createTableSql("t", strKey, Seq("k")).contains("`k` VARCHAR(256)"))
    assert(Postgres.createTableSql("t", withTypes, Seq("id"))
      .contains("\"bal\" DOUBLE PRECISION"))
  }

  private def changelog(rows: Seq[(Long, Option[(Long, String, Double)], Long)]): DataFrame = {
    import spark.implicits._
    rows.toDF("_k", "_v", "seq")
      .select(struct(col("_k").as("id")).as("key"),
        when(col("_v").isNotNull,
          struct(col("_v._1").as("id"), col("_v._2").as("name"),
            col("_v._3").as("bal"))).as("value"),
        col("seq"))
  }

  private def freshCfg(db: String): Config = {
    val cfg = Config(s"jdbc:derby:memory:$db;create=true", "t", Derby, Seq("id"))
    JdbcSink.withConnection(cfg)(c => JdbcSink.dropTableIfExists(c, Derby, "t"))
    cfg
  }

  private def readBack(cfg: Config): DataFrame =
    spark.read.format("jdbc")
      .option("url", cfg.url).option("dbtable", Derby.q(cfg.table)).load()

  test("live Derby: auto-create + upsert + update + tombstone delete end-to-end") {
    val cfg = freshCfg("spec_e2e")
    // batch 1: two inserts
    JdbcSink.applyChangelog(changelog(Seq(
      (1L, Some((1L, "a", 10.0)), 1L),
      (2L, Some((2L, "b", 20.0)), 2L))), cfg)
    // batch 2: update 1 (MATCHED arm), insert 3 (NOT MATCHED arm), delete 2
    JdbcSink.applyChangelog(changelog(Seq(
      (1L, Some((1L, "a2", 11.0)), 3L),
      (3L, Some((3L, "c", 30.0)), 4L),
      (2L, None, 5L))), cfg)
    val got = readBack(cfg).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(got.toSeq === Seq((1L, "a2", 11.0), (3L, "c", 30.0)))
  }

  test("live Derby: within-batch last-write-wins (one statement per key)") {
    val cfg = freshCfg("spec_lww")
    JdbcSink.applyChangelog(changelog(Seq(
      (1L, Some((1L, "old", 1.0)), 1L),
      (1L, Some((1L, "new", 2.0)), 9L),
      (1L, Some((1L, "mid", 1.5)), 5L))), cfg)
    val got = readBack(cfg).collect()
    assert(got.length === 1 && got(0).getString(1) === "new")
  }

  test("live Derby: auto.evolve ALTERs in new nullable columns; old rows NULL") {
    import spark.implicits._
    val cfg = freshCfg("spec_evolve")
    JdbcSink.applyChangelog(changelog(Seq((1L, Some((1L, "a", 1.0)), 1L))), cfg)
    val evolved = Seq((2L, "b", 2.0, "x2"))
      .toDF("id", "name", "bal", "note")
      .select(struct(col("id")).as("key"),
        struct(col("id"), col("name"), col("bal"), col("note")).as("value"),
        lit(2L).as("seq"))
    JdbcSink.applyChangelog(evolved, cfg)
    val got = readBack(cfg).orderBy("id").collect()
    assert(got.map(_.getAs[String]("note")).toSeq === Seq(null, "x2"))
    // a required add must fail loudly, not corrupt the target
    val required = StructType(schema.fields :+
      StructField("must", StringType, nullable = false))
    val err = intercept[IllegalStateException] {
      JdbcSink.withConnection(cfg)(c =>
        JdbcSink.ensureTable(c, cfg, required))
    }
    assert(err.getMessage.contains("auto.evolve"))
  }

  test("live Derby: delete.enabled=false ignores tombstones") {
    val cfg = freshCfg("spec_nodel").copy(deleteEnabled = false)
    JdbcSink.applyChangelog(changelog(Seq(
      (1L, Some((1L, "a", 1.0)), 1L),
      (1L, None, 2L))), cfg)
    // tombstone won the batch reduction but deletes are disabled -> row kept
    assert(readBack(cfg).count() === 1)
  }

  test("Engine 'jdbc' sink: CSV spool streams into a live Derby table") {
    import java.nio.file.{Files, Paths}
    val base = Files.createTempDirectory("jdbc_engine").toString
    val in = s"$base/in"
    Files.createDirectories(Paths.get(in))
    Files.writeString(Paths.get(in, "f1.csv"),
      Seq("id,v,seq,__deleted", "1,a,10,false", "2,b,11,false",
        "1,a2,12,false", "2,,13,true").mkString("\n"))
    val cfg = freshCfg("spec_engine").copy(table = "stream_t", pks = Seq("id"))
    JdbcSink.withConnection(cfg)(c =>
      JdbcSink.dropTableIfExists(c, Derby, "stream_t"))
    val engine = new graft.pipeline.Engine(spark, s"$base/engine")
    val q = engine.registerJson(
      s"""{
         |  "name": "to_jdbc",
         |  "source": {"type": "csv", "path": "$in",
         |    "schemaDdl": "id INT, v STRING, seq LONG, __deleted STRING",
         |    "keyFields": ["id"], "seqColumn": "seq"},
         |  "sink": {"type": "jdbc", "url": "${cfg.url}",
         |    "table": "stream_t", "dialect": "derby", "keys": ["id"]}
         |}""".stripMargin)
    q.processAllAvailable()
    engine.delete("to_jdbc")
    val got = spark.read.format("jdbc")
      .option("url", cfg.url).option("dbtable", Derby.q("stream_t")).load()
      .orderBy("id").collect().map(r => (r.getInt(0), r.getString(1)))
    assert(got.toSeq === Seq((1, "a2"))) // update applied, tombstone deleted
  }

  test("statement replay equals MergeSink.applyBatch on a mixed soak") {
    import spark.implicits._
    // 60 keys, 3 waves mirroring the k9 query shape
    val base = (1L to 60L).map(i => (i, s"n$i", i * 1.5))
    val w1 = base.filter(_._1 % 3 != 2).map { case (i, n, b) => (i, Some((i, n, b)), 1L) }
    val w2 = base.filter(_._1 % 3 != 0).map { case (i, n, b) => (i, Some((i, n, b + 100)), 2L) }
    val w3 = base.filter(_._1 % 5 == 0).map { case (i, _, _) => (i, None, 3L) }
    val cfg = freshCfg("spec_replay")
    Seq(w1, w2, w3).foreach(w => JdbcSink.applyChangelog(changelog(w), cfg))
    val live = readBack(cfg).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))

    // the Spark-side semantics over the SAME concatenated changelog
    val snapshot = Seq.empty[(Long, String, Double)].toDF("id", "name", "bal")
    val merged = MergeSink.applyBatch(snapshot,
      changelog(w1 ++ w2 ++ w3), Seq("id"))
      .orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(live.toSeq === merged.toSeq)
  }

  private def guardedCfg(db: String): Config = {
    val cfg = freshCfg(db).copy(autoCreate = false)
    JdbcSink.withConnection(cfg) { c =>
      val st = c.createStatement()
      try st.executeUpdate(
        """CREATE TABLE "t" ("id" BIGINT NOT NULL, "name" VARCHAR(4000), """ +
          """"bal" DOUBLE, PRIMARY KEY ("id"), CHECK ("bal" >= 0))""")
      finally st.close()
    }
    cfg
  }

  test("errors.tolerance=all: violating rows dead-letter, survivors commit") {
    val cfg = guardedCfg("spec_dlq").copy(errorsTolerance = "all")
    val dlq = JdbcSink.applyChangelogWithDlq(changelog(Seq(
      (1L, Some((1L, "a", 10.0)), 1L),
      (2L, Some((2L, "bad", -5.0)), 2L), // trips the CHECK
      (3L, Some((3L, "c", 30.0)), 3L),
      (9L, None, 4L))), cfg) // delete of a missing key is a clean no-op
    val entries = dlq.collect().map(r =>
      (r.getString(0), r.getString(1), r.getString(2), r.getString(3), r.getString(4)))
    assert(entries.toSeq === Seq(("t", "sink_put", "upsert", "2", "23513")))
    val got = readBack(cfg).orderBy("id").collect().map(_.getLong(0))
    assert(got.toSeq === Seq(1L, 3L), "good rows must commit around the bad one")
    // default tolerance still fails the task on the same changelog
    val strict = guardedCfg("spec_dlq_strict")
    intercept[Exception] {
      JdbcSink.applyChangelog(changelog(Seq(
        (2L, Some((2L, "bad", -5.0)), 1L))), strict)
    }
  }

  test("partial-batch crash then full redelivery converges (commit-per-flush replay)") {
    // commit-per-flush means a mid-partition crash leaves a committed
    // PREFIX; the connector's contract is that redelivering the whole
    // batch after the fix converges — upserts are idempotent per key
    val cfg = guardedCfg("spec_crash").copy(batchSize = 2, maxWriters = 1)
    val rows = (1L to 20L).map(i => (i, Some((i, s"n$i", i.toDouble)), i))
    val poisoned = rows.map(r =>
      if (r._1 == 15L) (15L, Some((15L, "n15", -1.0)), 15L) else r)
    intercept[Exception] { JdbcSink.applyChangelog(changelog(poisoned), cfg) }
    assert(readBack(cfg).count() < 20, "the poisoned flush must roll back")
    // fix upstream, redeliver the FULL batch (exactly what a restarted
    // task does) — the partial prefix upserts over itself
    JdbcSink.applyChangelog(changelog(rows), cfg)
    val got = readBack(cfg).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(got.toSeq === (1L to 20L).map(i => (i, s"n$i", i.toDouble)))
  }

  // ---- bounded retry (errors.retry.timeout) ------------------------------

  private def lockTimeoutFast(cfg: Config): Unit =
    JdbcSink.withConnection(cfg) { c =>
      val st = c.createStatement()
      try st.execute("CALL SYSCS_UTIL.SYSCS_SET_DATABASE_PROPERTY(" +
        "'derby.locks.waitTimeout', '1')")
      finally st.close()
    }

  /** Hold a row lock on `t`.id=1 from a side connection; returns the
   * release thunk (commit + close, idempotent). */
  private def holdRowLock(cfg: Config): () => Unit = {
    val conn = java.sql.DriverManager.getConnection(cfg.url)
    conn.setAutoCommit(false)
    val st = conn.createStatement()
    st.executeUpdate("""UPDATE "t" SET "bal" = 0.5 WHERE "id" = 1""")
    val released = new java.util.concurrent.atomic.AtomicBoolean(false)
    () => if (released.compareAndSet(false, true)) {
      try { conn.commit(); st.close(); conn.close() }
      catch { case _: Throwable => () }
    }
  }

  test("transient lock contention retries with backoff and converges, zero DLQ") {
    val cfg0 = freshCfg("spec_retry_ok")
    JdbcSink.applyChangelog(changelog(Seq((1L, Some((1L, "seed", 1.0)), 1L))), cfg0)
    lockTimeoutFast(cfg0)
    val release = holdRowLock(cfg0)
    try {
      val probe = RetryProbeState.fresh("retry_ok")
      // first backoff releases the lock — deterministic sequencing, no
      // wall-clock coupling beyond Derby's 1s lock wait itself
      RetryProbeState.onSleep("retry_ok", release)
      val cfg = cfg0.copy(errorsTolerance = "all", maxWriters = 1,
        retryTimeoutMs = 600000L, retry = probe)
      val dlq = JdbcSink.applyChangelogWithDlq(changelog(Seq(
        (1L, Some((1L, "updated", 2.0)), 2L),
        (2L, Some((2L, "new", 3.0)), 3L))), cfg)
      assert(dlq.count() == 0, "transient contention must converge, not DLQ")
      val got = readBack(cfg).orderBy("id")
        .collect().map(r => (r.getLong(0), r.getString(1)))
      assert(got.toSeq === Seq((1L, "updated"), (2L, "new")))
      val sleeps = RetryProbeState.sleeps("retry_ok")
      assert(sleeps.nonEmpty, "the retry loop never engaged")
      assert(sleeps.head == 300L, s"first backoff must be 300ms, got $sleeps")
    } finally release()
  }

  test("terminal failures burn no retry budget and DLQ exactly once") {
    val cfg = guardedCfg("spec_retry_term").copy(errorsTolerance = "all",
      maxWriters = 1, retryTimeoutMs = 600000L,
      retry = RetryProbeState.fresh("retry_term"))
    val dlq = JdbcSink.applyChangelogWithDlq(changelog(Seq(
      (1L, Some((1L, "good", 5.0)), 1L),
      (2L, Some((2L, "bad", -5.0)), 2L))), cfg)
    val entries = dlq.collect().map(r => (r.getString(3), r.getString(4)))
    assert(entries.toSeq === Seq(("2", "23513")),
      "a terminal failure must dead-letter exactly once")
    assert(RetryProbeState.sleeps("retry_term").isEmpty,
      "terminal failures must not consume the retry budget")
    assert(readBack(cfg).orderBy("id").collect().map(_.getLong(0)).toSeq
      === Seq(1L))
  }

  test("an exhausted retry deadline dead-letters the transient row, bounded") {
    val cfg0 = freshCfg("spec_retry_dead")
    JdbcSink.applyChangelog(changelog(Seq((1L, Some((1L, "seed", 1.0)), 1L))), cfg0)
    lockTimeoutFast(cfg0)
    val release = holdRowLock(cfg0) // never released during the write
    try {
      val probe = RetryProbeState.fresh("retry_dead")
      val cfg = cfg0.copy(errorsTolerance = "all", maxWriters = 1,
        retryTimeoutMs = 500L, retry = probe) // virtual-clock deadline
      val dlq = JdbcSink.applyChangelogWithDlq(changelog(Seq(
        (1L, Some((1L, "blocked", 2.0)), 2L))), cfg)
      val entries = dlq.collect().map(r => (r.getString(3), r.getString(4)))
      assert(entries.toSeq === Seq(("1", "40XL1")),
        "deadline exhaustion must dead-letter the row exactly once")
      // the backoff schedule respected the deadline: 300, then the 200
      // remaining — never a sleep past the budget
      assert(RetryProbeState.sleeps("retry_dead") === Seq(300L, 200L))
    } finally release()
  }

  test("partitioned JDBC read splits into N range scans and loses no rows") {
    import spark.implicits._
    val url = "jdbc:derby:memory:graft_s11_spec;create=true"
    val cfg = JdbcSink.Config(url, "t_part", JdbcSink.Derby, Seq("id"))
    JdbcSink.withConnection(cfg)(c =>
      JdbcSink.dropTableIfExists(c, JdbcSink.Derby, "t_part"))
    val rows = (1L to 1000L).map(i => (i, s"v$i")).toSeq.toDF("id", "v")
    val props = new java.util.Properties()
    props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    rows.write.mode("append").jdbc(url, "t_part", props)
    val back = JdbcQueries.partitionedJdbc(spark, url, "t_part", "id", 1L, 1000L, 4)
    assert(back.rdd.getNumPartitions == 4,
      "the scan must split into numPartitions range queries")
    // ranges tile the key space: nothing lost, nothing duplicated
    assert(back.count() == 1000)
    assert(back.select(countDistinct("id")).head().getLong(0) == 1000)
  }
}

/** JVM-global virtual-clock retry policy for the bounded-retry specs:
  * local-mode "executors" share the JVM, so the serialized Probe copies
  * (the closure ships only the id string) all read one static registry —
  * the specs observe sleeps and drive release hooks without wall-clock
  * coupling. */
object RetryProbeState {
  import java.util.concurrent.{ConcurrentHashMap, CopyOnWriteArrayList}
  import java.util.concurrent.atomic.AtomicLong

  private val clocks = new ConcurrentHashMap[String, AtomicLong]()
  private val sleepLog =
    new ConcurrentHashMap[String, CopyOnWriteArrayList[java.lang.Long]]()
  private val hooks = new ConcurrentHashMap[String, () => Unit]()

  final case class Probe(id: String) extends JdbcSink.RetryPolicy {
    def nowMs(): Long = clocks.get(id).get()
    def sleepMs(ms: Long): Unit = {
      sleepLog.get(id).add(ms)
      clocks.get(id).addAndGet(ms)
      Option(hooks.get(id)).foreach(_.apply())
    }
  }

  def fresh(id: String): Probe = {
    clocks.put(id, new AtomicLong(0L))
    sleepLog.put(id, new CopyOnWriteArrayList[java.lang.Long]())
    hooks.remove(id)
    Probe(id)
  }

  def onSleep(id: String, f: () => Unit): Unit = hooks.put(id, f)

  def sleeps(id: String): Seq[Long] = {
    import scala.jdk.CollectionConverters._
    sleepLog.get(id).asScala.toSeq.map(_.longValue)
  }
}
