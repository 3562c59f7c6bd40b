package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.StatefulOps

/** Streaming semantics: cross-batch stateful dedup and watermark-driven
  * late-data handling — the event-time half of the engine's streaming
  * surface (the pipeline half lives in EngineSpec). */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("stateful dedupByKey drops replays across micro-batches") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Int, String)]
    val deduped = StatefulOps.dedupByKey(
      in.toDF().toDF("id", "v"), Seq("id"))
    val q = deduped.writeStream.format("memory")
      .queryName("dedup_out").outputMode("append").start()
    try {
      in.addData((1, "a"), (2, "b"), (1, "a-replay"))
      q.processAllAvailable()
      // replay of key 1 within the same batch dropped
      assert(spark.table("dedup_out").count() == 2)
      in.addData((1, "a-replay2"), (3, "c"))
      q.processAllAvailable()
      // replay ACROSS batches dropped too; new key passes
      val rows = spark.table("dedup_out")
        .collect().map(r => (r.getInt(0), r.getString(1))).toSet
      assert(rows == Set((1, "a"), (2, "b"), (3, "c")))
    } finally q.stop()
  }

  test("dedupByKey survives an input column literally named __gk") {
    // the synthetic group key must not collide with a caller column:
    // a same-named withColumn would replace it IN PLACE and the
    // positional strip would then drop the caller's trailing column
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Int, String, String)]
    val deduped = StatefulOps.dedupByKey(
      in.toDF().toDF("id", "__gk", "v"), Seq("id"))
    val q = deduped.writeStream.format("memory")
      .queryName("dedup_gk_out").outputMode("append").start()
    try {
      in.addData((1, "user-gk-1", "a"), (1, "user-gk-dup", "b"))
      q.processAllAvailable()
      val rows = spark.table("dedup_gk_out").collect()
        .map(r => (r.getInt(0), r.getString(1), r.getString(2)))
      assert(rows.toSeq == Seq((1, "user-gk-1", "a")),
        s"caller's __gk column corrupted: ${rows.toSeq}")
      assert(spark.table("dedup_gk_out").columns.toSeq ==
        Seq("id", "__gk", "v"))
    } finally q.stop()
  }

  test("streaming LSH near-dup: exact/near dups flagged across batches") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val flags = StatefulOps.lshNearDupFlags(
      in.toDF().toDF("doc_id", "text"), "doc_id", "text")
    val q = StatefulOps.nearDupVerdicts(flags)
      .writeStream.format("memory")
      .queryName("neardup_out").outputMode("complete").start()
    try {
      in.addData(
        1L -> "the quick brown fox jumps over the lazy dog",
        2L -> "completely different words entirely here now today")
      q.processAllAvailable()
      in.addData(
        3L -> "the quick brown fox jumps over the lazy dog", // exact dup of 1
        4L -> "the quick brown fox jumps over the lazy cat", // near dup of 1
        5L -> "unrelated fresh content with novel vocabulary throughout")
      q.processAllAvailable()
      val v = spark.table("neardup_out")
        .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      assert(!v(1L) && !v(2L) && !v(5L)) // firsts and unrelated survive
      assert(v(3L))                      // exact dup flagged (all bands collide)
      assert(v(4L))                      // near dup flagged (some band collides)
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark bounds dedup state by event time") {
    // The built-in bounded-state streaming dedup next to the custom
    // TTL'd flatMapGroupsWithState op: replays inside the watermark
    // horizon are dropped, and state for expired keys is evictable —
    // the only streaming-dedup shape that survives an unbounded key
    // domain at 100 TB/day.
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Int, java.sql.Timestamp)]
    def ts(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
    val deduped = in.toDF().toDF("id", "ts")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("id")
    val q = deduped.writeStream.format("memory")
      .queryName("ddww_out").outputMode("append").start()
    try {
      in.addData((1, ts(0)), (2, ts(1)), (1, ts(2)))
      q.processAllAvailable()
      assert(spark.table("ddww_out").count() == 2) // in-batch replay dropped
      in.addData((1, ts(5)), (3, ts(6)))
      q.processAllAvailable()
      // replay across batches within the horizon dropped; new key passes
      assert(spark.table("ddww_out").count() == 3)
      // advance event time far past the horizon, then replay key 1:
      // its state is expired, so the replay is treated as new — bounded
      // state means semantics are "dedup within horizon", by contract
      in.addData((4, ts(40)))
      q.processAllAvailable()
      in.addData((1, ts(41)))
      q.processAllAvailable()
      val ids = spark.table("ddww_out").collect().map(_.getInt(0))
      assert(ids.count(_ == 1) == 2) // once at 10:00, once at 10:41
      assert(ids.toSet == Set(1, 2, 3, 4))
    } finally q.stop()
  }

  test("watermark drops late events from windowed aggregation") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(java.sql.Timestamp, String)]
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val agg = in.toDF().toDF("ts", "k")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("start"), col("n"))
    val q = agg.writeStream.format("memory")
      .queryName("wm_out").outputMode("append").start()
    try {
      in.addData((ts(1), "a"), (ts(2), "b"))   // window 10:00
      q.processAllAvailable()
      in.addData((ts(31), "c"))                // advances watermark to 10:21
      q.processAllAvailable()
      in.addData((ts(3), "LATE"))              // before watermark -> dropped
      q.processAllAvailable()
      in.addData((ts(55), "d"))                // pushes watermark; 10:30 window closes
      q.processAllAvailable()
      val closed = spark.table("wm_out")
        .collect().map(r => (r.getTimestamp(0), r.getLong(1))).toMap
      // the 10:00 window emitted n=2: the late event did NOT count
      assert(closed(ts(0)) == 2L)
      assert(closed(ts(30)) == 1L)
    } finally q.stop()
  }

  test("stream-stream interval join: orders match payments within the window, state bounded by watermarks") {
    implicit val sq = spark.sqlContext
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val orders = MemoryStream[(Int, java.sql.Timestamp)]
    val pays = MemoryStream[(Int, java.sql.Timestamp)]
    // both sides watermarked — Spark derives the state retention bound
    // from the watermark + the interval condition, so neither side's
    // join state grows unboundedly (the 100 TB-stream requirement)
    val o = orders.toDF().toDF("order_id", "ots").withWatermark("ots", "10 minutes")
    val p = pays.toDF().toDF("pay_order_id", "pts").withWatermark("pts", "10 minutes")
    val joined = o.join(p,
      col("order_id") === col("pay_order_id") &&
        col("pts") >= col("ots") && col("pts") <= col("ots") + expr("INTERVAL 5 MINUTES"))
    val q = joined.writeStream.format("memory")
      .queryName("ssj_out").outputMode("append").start()
    try {
      orders.addData((1, ts(0)), (2, ts(1)))
      pays.addData((1, ts(3)))               // within 5 min of order 1
      q.processAllAvailable()
      pays.addData((2, ts(30)))              // 29 min after order 2 -> outside interval
      orders.addData((3, ts(31)))
      pays.addData((3, ts(33)))              // within
      q.processAllAvailable()
      val got = spark.table("ssj_out")
        .select("order_id").collect().map(_.getInt(0)).sorted
      assert(got.sameElements(Array(1, 3)))
    } finally q.stop()
  }
}
