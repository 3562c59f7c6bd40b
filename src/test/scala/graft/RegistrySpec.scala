package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.codec.SchemaRegistry
import graft.codec.SchemaRegistry.Compat

/** Subject/version bookkeeping of the registry model: idempotent
 * registration, global ids, compat gating per level, per-subject
 * overrides, and the rename-needs-NONE lab flow. */
class RegistrySpec extends AnyFunSuite {

  private val base = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("name", StringType, nullable = false)))
  private val addOptional = StructType(base.fields :+
    StructField("phone", StringType, nullable = true))
  private val addRequired = StructType(base.fields :+
    StructField("phone", StringType, nullable = false))
  private val renamed = StructType(base.fields.map(f =>
    if (f.name == "name") f.copy(name = "full_name") else f))

  test("register is idempotent and versions/ids grow monotonically") {
    val reg = new SchemaRegistry()
    val v1 = reg.register("s-value", base).toOption.get
    assert(v1.version == 1)
    assert(reg.register("s-value", base).toOption.get == v1) // same version back
    val v2 = reg.register("s-value", addOptional).toOption.get
    assert(v2.version == 2 && v2.id > v1.id)
    assert(reg.latest("s-value").contains(v2))
    assert(reg.schemaById(v1.id).contains(v1))
    // ids are registry-global: a second subject keeps counting
    val other = reg.register("t-value", base).toOption.get
    assert(other.version == 1 && other.id > v2.id)
  }

  test("BACKWARD accepts optional add and drop, rejects required add and retype") {
    val reg = new SchemaRegistry()
    reg.register("s", base)
    assert(reg.register("s", addOptional).isRight)
    // drop of the optional field (back to base) = compatible... but base
    // is already version 1, so idempotency returns it; use a fresh drop
    val dropped = StructType(Seq(base.fields.head))
    assert(reg.register("s", dropped).isRight)
    val retyped = StructType(Seq(
      StructField("id", StringType, nullable = false)))
    assert(reg.register("s", retyped).isLeft)
    val reg2 = new SchemaRegistry()
    reg2.register("s", base)
    assert(reg2.register("s", addRequired).isLeft)
  }

  test("nullable->non-nullable tightening is rejected (a writer null breaks the reader)") {
    val reg = new SchemaRegistry() // BACKWARD
    val withOptional = StructType(base.fields :+
      StructField("phone", StringType, nullable = true))
    reg.register("s", withOptional)
    val tightened = StructType(base.fields :+
      StructField("phone", StringType, nullable = false))
    assert(reg.register("s", tightened).isLeft,
      "v1 rows may carry phone=null; a non-nullable v2 reader cannot hold them")
    // the reverse direction (non-nullable -> nullable) stays legal
    val reg2 = new SchemaRegistry()
    reg2.register("s", tightened)
    assert(reg2.register("s", withOptional).isRight)
  }

  test("FORWARD rejects dropping a required field, accepts adds") {
    val reg = new SchemaRegistry(Compat.Forward)
    reg.register("s", base)
    assert(reg.register("s", addRequired).isRight) // old reader ignores it
    val droppedRequired = StructType(Seq(base.fields.head))
    assert(reg.register("s", droppedRequired).isLeft) // old reader needs name
  }

  test("rename is rejected under BACKWARD and passes after NONE override") {
    val reg = new SchemaRegistry()
    reg.register("om.customer-value", base)
    assert(reg.register("om.customer-value", renamed).isLeft)
    assert(!reg.testCompatibility("om.customer-value", renamed))
    reg.setCompat("om.customer-value", Compat.None)
    assert(reg.compatLevel("om.customer-value") == Compat.None)
    val v2 = reg.register("om.customer-value", renamed).toOption.get
    assert(v2.version == 2)
    // the override is per-subject: a different subject still gates
    reg.register("other-value", base)
    assert(reg.register("other-value", renamed).isLeft)
  }

  test("transitive levels check all versions, not just latest") {
    val reg = new SchemaRegistry(Compat.BackwardTransitive)
    reg.register("s", base)
    reg.register("s", addOptional)
    // compatible with latest (drops optional phone) AND with v1 (identity
    // modulo nothing) — passes
    assert(reg.register("s", base).isRight) // idempotent short-circuit
    // a retype of a v1 field fails against v1 even if some later schema
    // dropped that field
    val reg2 = new SchemaRegistry(Compat.BackwardTransitive)
    reg2.register("s", base)
    reg2.register("s", StructType(Seq(base.fields.head))) // dropped name
    val nameAsInt = StructType(Seq(base.fields.head,
      StructField("name", IntegerType, nullable = true)))
    assert(reg2.register("s", nameAsInt).isLeft)
    // non-transitive BACKWARD would have accepted it (latest lacks name)
    val reg3 = new SchemaRegistry(Compat.Backward)
    reg3.register("s", base)
    reg3.register("s", StructType(Seq(base.fields.head)))
    assert(reg3.register("s", nameAsInt).isRight)
  }

  test("Confluent framing: header carries the id; mixed-version stream resolves") {
    val spark = SparkSpec.session
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.codec.AvroCodec
    import graft.model.Connect
    val reg = new SchemaRegistry()
    val subject = "s-value"
    def frame(rows: Seq[(Int, String)], extra: Boolean) = {
      val df = if (extra)
        rows.toDF("id", "v").withColumn("w", concat(col("v"), lit("!")))
      else rows.toDF("id", "v")
      Connect.toConnectFrame(df, Seq("id"), "t", "id")
    }
    // batch 1 under v1, batch 2 under evolved v2 (adds optional w)
    val b1 = AvroCodec.encodeFramed(frame(Seq(1 -> "a", 2 -> "b"), extra = false),
      reg, subject)
    val b2 = AvroCodec.encodeFramed(frame(Seq(3 -> "c"), extra = true),
      reg, subject)
    assert(reg.versions(subject).map(_.version) == Seq(1, 2))
    // wire header: magic 0x00 + big-endian id of the writer's version
    val head = b1.select(col("value")).head().getAs[Array[Byte]](0).take(5)
    val expectId = reg.versions(subject).head.id
    assert(head(0) == 0 &&
      java.nio.ByteBuffer.wrap(head, 1, 4).getInt == expectId)
    // one decode over BOTH versions: v1 rows fill w with the null default
    val all = b1.unionByName(b2)
    val out = AvroCodec.decodeFramed(all, reg, subject)
      .select(col("value.id"), col("value.v"), col("value.w"))
      .collect().map(r => (r.getInt(0), r.getString(1), Option(r.getString(2)))).toSet
    assert(out == Set((1, "a", None), (2, "b", None), (3, "c", Some("c!"))))
  }

  test("deleteSubject forgets versions and the compat override") {
    val reg = new SchemaRegistry()
    reg.register("s", base)
    reg.setCompat("s", Compat.None)
    reg.deleteSubject("s")
    assert(reg.versions("s").isEmpty)
    assert(reg.compatLevel("s") == Compat.Backward)
    val again = reg.register("s", base).toOption.get
    assert(again.version == 1 && again.id == 2) // ids never reuse
  }

  test("durable registry: register -> restart -> framed decode still resolves ids") {
    import org.apache.spark.sql.functions._
    import graft.codec.AvroCodec
    import graft.model.Connect
    val spark = SparkSpec.session
    import spark.implicits._
    val path = "target/tmp/registryspec_durable"
    graft.util.Fs.deleteRecursive(java.nio.file.Paths.get(path))

    val reg = SchemaRegistry.durable(spark, path)
    val subject = "s-value"
    // two framed batches under evolving schemas + compat mutations, all
    // journaled through the LogTable at `path`
    def frame(rows: Seq[(Int, String)], extra: Boolean) = {
      val df = if (extra)
        rows.toDF("id", "v").withColumn("w", concat(col("v"), lit("!")))
      else rows.toDF("id", "v")
      Connect.toConnectFrame(df, Seq("id"), "t", "id")
    }
    val b1 = AvroCodec.encodeFramed(frame(Seq(1 -> "a", 2 -> "b"), extra = false),
      reg, subject)
    val b2 = AvroCodec.encodeFramed(frame(Seq(3 -> "c"), extra = true),
      reg, subject)
    reg.setGlobalCompat(Compat.Full)
    reg.setCompat(subject, Compat.None)
    val encoded = b1.unionByName(b2).collect() // pin bytes before restart

    // "restart": a NEW registry instance over the same journal path
    val reg2 = SchemaRegistry.durable(spark, path)
    assert(reg2.subjects == reg.subjects)
    assert(reg2.versions(subject) == reg.versions(subject)) // ids included
    assert(reg2.globalCompat == Compat.Full)
    assert(reg2.compatOverride(subject).contains(Compat.None))
    // the framed decode resolves writer ids against the REPLAYED registry
    val out = AvroCodec.decodeFramed(
        spark.createDataFrame(java.util.List.of(encoded: _*), b1.schema),
        reg2, subject)
      .select(col("value.id"), col("value.v"), col("value.w"))
      .collect().map(r => (r.getInt(0), r.getString(1), Option(r.getString(2)))).toSet
    assert(out == Set((1, "a", None), (2, "b", None), (3, "c", Some("c!"))))

    // ids never reuse across delete + restart (idseq outlives tombstones)
    val maxId = reg2.versions(subject).map(_.id).max
    reg2.deleteSubject(subject)
    val reg3 = SchemaRegistry.durable(spark, path)
    assert(reg3.subjects.isEmpty)
    assert(reg3.register("fresh-value", base).toOption.get.id > maxId)
    reg3.setGlobalCompat(Compat.Backward)

    // deleting a subject that only ever had a compat override (PUT
    // /config/{subject} pre-registration is legal) must tombstone the
    // override too — it cannot resurrect on replay
    reg3.setCompat("ghost-value", Compat.Full)
    reg3.deleteSubject("ghost-value")
    val reg4 = SchemaRegistry.durable(spark, path)
    assert(reg4.compatOverride("ghost-value").isEmpty)

    // the journal fences a stale SECOND registry on the same path: its
    // next op lands behind the committed max (reg3/reg4 have moved the
    // log on) and LogTable's behind-max guard refuses to fork history
    intercept[IllegalStateException](reg2.setGlobalCompat(Compat.Forward))
  }

  test("journal compaction: 100+ mutations replay exactly after restart; fencing holds") {
    // the durable registry compacts its LogTable every 8 journal
    // versions; a long mutation history must cross that threshold many
    // times and still replay to the exact same state — compaction can
    // never lose a schema, an override, a tombstone, or the id sequence
    import graft.sinks.LogTable
    val spark = SparkSpec.session
    val path = "target/tmp/registryspec_compact"
    graft.util.Fs.deleteRecursive(java.nio.file.Paths.get(path))

    def schemaWith(n: Int): StructType = StructType(
      StructField("id", IntegerType, nullable = false) +:
        (1 to n).map(i => StructField(s"f$i", StringType, nullable = true)))

    val reg = SchemaRegistry.durable(spark, path)
    reg.setGlobalCompat(Compat.None)
    val subjects = (0 until 4).map(i => s"c$i-value")
    subjects.foreach(s => reg.setCompat(s, Compat.None))
    // 96 registers (4 subjects x 24 widening versions) + 5 compat ops
    // + 1 delete = 102 journal commits
    for (n <- 1 to 24; s <- subjects)
      assert(reg.register(s, schemaWith(n)).isRight, s"register $s v$n failed")
    reg.deleteSubject(subjects(3))
    assert(LogTable.versions(path).size < 8 + 2,
      "the journal never compacted across 100+ mutations")

    // restart: the replayed state equals the live one, id-for-id
    val reg2 = SchemaRegistry.durable(spark, path)
    assert(reg2.subjects.toSet == subjects.take(3).toSet)
    subjects.take(3).foreach { s =>
      val (live, replayed) = (reg.versions(s), reg2.versions(s))
      assert(replayed == live, s"replay diverged for $s")
      assert(replayed.map(_.version) == (1 to 24))
      assert(replayed.last.schema == schemaWith(24))
    }
    assert(reg2.globalCompat == Compat.None)
    assert(reg2.compatOverride(subjects(0)).contains(Compat.None))
    assert(reg2.compatOverride(subjects(3)).isEmpty, "tombstones must survive compaction")
    // ids never reuse after delete + compaction + restart
    val maxId = subjects.take(3).flatMap(reg2.versions(_)).map(_.id).max
    assert(reg2.register("fresh2-value", schemaWith(1)).toOption.get.id > maxId)
    // stale-writer fencing still holds through a compacted journal: the
    // first handle is now behind the committed max and must not fork
    intercept[IllegalStateException](reg.setGlobalCompat(Compat.Forward))
  }

  test("structFromAvroJson inverts avroSchemaJson across the type subset") {
    import graft.codec.{AvroCodec, RegistryServer}
    val all = StructType(Seq(
      StructField("i", IntegerType, nullable = false),
      StructField("l", LongType, nullable = true),
      StructField("f", FloatType, nullable = false),
      StructField("d", DoubleType, nullable = true),
      StructField("s", StringType, nullable = false),
      StructField("b", BooleanType, nullable = true),
      StructField("raw", BinaryType, nullable = false),
      StructField("dt", DateType, nullable = true),
      StructField("ts", TimestampType, nullable = false),
      StructField("dec", DecimalType(10, 3), nullable = true)))
    assert(RegistryServer.structFromAvroJson(
      AvroCodec.avroSchemaJson(all)) == all)
  }

  test("the REST shim drives register -> evolve -> decode over HTTP") {
    import graft.codec.{RegistryHttpClient, RegistryServer}
    val reg = new SchemaRegistry()
    val server = new RegistryServer(reg)
    val url = server.start()
    try {
      val client = new RegistryHttpClient(url)
      val subject = "t-value"
      val id1 = client.register(subject, base) // v1 over the wire
      assert(client.register(subject, base) == id1) // idempotent re-POST
      val id2 = client.register(subject, addOptional) // v2
      assert(id2 > id1)
      assert(client.subjects() == Seq(subject))
      assert(client.versionsOf(subject) == Seq(1, 2))
      assert(client.schemaById(id1) == base)
      // rename: probe says incompatible, POST 409s, NONE override unblocks
      assert(!client.compatible(subject, renamed))
      assert(client.tryRegister(subject, renamed).isLeft)
      client.setCompat(subject, "NONE")
      assert(client.tryRegister(subject, renamed).isRight)
      assert(client.globalCompat() == "BACKWARD")
      client.setGlobalCompat("FULL")
      assert(client.globalCompat() == "FULL")
      // latest + writer map resolved over HTTP feed the framed decode
      val (v, _, reader) = client.latest(subject)
      assert(v == 3 && reader == renamed)
      val writers = client.writerSchemas(subject)
      assert(writers.keySet == Set(id1, id2, writers.keySet.max))
      assert(RegistryServer.structFromAvroJson(writers(id2)) == addOptional)
      assert(client.deleteSubject(subject) == Seq(1, 2, 3))
      assert(client.subjects().isEmpty)
    } finally server.stop()
  }

  test("REST errors carry protocol codes: 40401/40402/40403 and 409") {
    import graft.codec.{RegistryHttpClient, RegistryServer}
    val reg = new SchemaRegistry()
    val server = new RegistryServer(reg)
    val url = server.start()
    try {
      val client = new RegistryHttpClient(url)
      def status(path: String): Int = {
        val http = java.net.http.HttpClient.newHttpClient()
        http.send(java.net.http.HttpRequest.newBuilder(
            java.net.URI.create(url + path)).GET().build(),
          java.net.http.HttpResponse.BodyHandlers.ofString()).statusCode()
      }
      assert(status("/subjects/none/versions") == 404)
      assert(status("/schemas/ids/99") == 404)
      assert(status("/config/none") == 404)
      client.register("t-value", base)
      assert(status("/subjects/t-value/versions/7") == 404)
      assert(client.tryRegister("t-value", addRequired).isLeft) // 409 path
      // an unparseable PUT /config body is the protocol's 422, not a 500
      val http = java.net.http.HttpClient.newHttpClient()
      def put(path: String, body: String) =
        http.send(java.net.http.HttpRequest.newBuilder(
            java.net.URI.create(url + path))
          .PUT(java.net.http.HttpRequest.BodyPublishers.ofString(body)).build(),
          java.net.http.HttpResponse.BodyHandlers.ofString())
      assert(put("/config", "not json at all").statusCode() == 422)
      assert(put("/config", """{"compatibility":"BOGUS"}""").statusCode() == 422)
      assert(put("/config/t-value", "{broken").statusCode() == 422)
    } finally server.stop()
  }
}
