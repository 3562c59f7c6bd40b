package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Shared testdata readers for the query registries. */
object Tables {

  def T(s: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") readEvents(s, dir)
    else s.read.parquet(s"$dir/$name.parquet")

  /** [[T]] plus an explicit repartition to the session's default
   * parallelism. The synthetic testdata packs each table into a SINGLE
   * parquet row group, so Spark cannot split the scan and any
   * compute-heavy narrow pipeline (tokenize + hash) pins to one task; a
   * real corpus has thousands of row groups and needs no such step. The
   * shuffle moves only the raw rows once and buys full-core parallelism
   * for everything downstream. */
  def Tpar(s: SparkSession, dir: String, name: String): DataFrame =
    T(s, dir, name).repartition(s.sparkContext.defaultParallelism)

  /** events.parquet's `ts` physical encoding has varied across testdata
   * generations: TIMESTAMP(NANOS) (which Spark's parquet reader rejects
   * unless the legacy nanos-as-long flag maps it to BIGINT nanos) and
   * plain TIMESTAMP(MICROS). Read under the flag and branch on what the
   * footer actually declared: a LongType column is nanos (truncate to
   * micros — exactly DuckDB's ns->us conversion), anything temporal is
   * already micros. Either way the column surfaces as TIMESTAMP_NTZ like
   * every other no-zone parquet timestamp in the testdata. The legacy
   * flag is scoped to a child session (shared SparkContext, isolated
   * conf) so the caller's session never observes the side effect. */
  def readEvents(s: SparkSession, dir: String): DataFrame =
    eventsCache.getOrElseUpdate((s.sparkContext, dir), {
      val scoped = s.newSession()
      scoped.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      scoped.conf.set("spark.sql.session.timeZone", "UTC")
      val raw = scoped.read.parquet(s"$dir/events.parquet")
      val tsMicros = raw.schema("ts").dataType match {
        case LongType => timestamp_micros(expr("ts div 1000"))
        case _        => col("ts")
      }
      raw.withColumn("ts", tsMicros.cast(TimestampNTZType))
    })

  /** The normalized-events schema as the file-stream gates need it:
   * what [[stageEventsFile]] writes, so `readStream.schema(...)` and the
   * staged files always agree regardless of the generator's encoding. */
  val eventsStreamSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", TimestampNTZType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** Stage a frame as ONE parquet file at `dst`, stamped with
   * `mtimeMillis` (the file source replays files in mtime order —
   * deterministic micro-batch sequencing needs explicit stamps).
   * Always a rewrite, never a hard link of the source file: a link
   * shares the testdata inode, so stamping its mtime would mutate the
   * read-only testdata in place — and a rewrite is what decouples the
   * gates from the generator's physical encoding in the first place. */
  def stageFile(df: DataFrame, dst: java.nio.file.Path, mtimeMillis: Long): Unit =
    stageFile(df, Seq(dst), mtimeMillis)

  /** [[stageFile]] fanned to several destinations (one staged wave
   * feeding N connectors' input dirs). SAFE AGAINST A RUNNING STREAM:
   * everything intermediate is dot-prefixed (the file source's index
   * skips any path component starting with `.` or `_`), the mtime is
   * stamped while the file is still invisible, and ONE atomic same-dir
   * move publishes it — a live `FileStreamSource` can never list a torn
   * file or observe a wave before its mtime is final. */
  def stageFile(df: DataFrame, dsts: Seq[java.nio.file.Path],
                mtimeMillis: Long): Unit = {
    import java.nio.file.{Files, StandardCopyOption}
    import scala.jdk.CollectionConverters._
    val head = dsts.head
    val tmp = head.resolveSibling("." + head.getFileName.toString + ".stage")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = {
      val st = Files.list(tmp)
      try st.iterator().asScala.find(_.toString.endsWith(".parquet")).get
      finally st.close()
    }
    dsts.zipWithIndex.foreach { case (dst, i) =>
      val hidden = dst.resolveSibling("." + dst.getFileName.toString + ".tmp")
      if (i < dsts.size - 1)
        Files.copy(part, hidden, StandardCopyOption.REPLACE_EXISTING)
      else Files.move(part, hidden, StandardCopyOption.REPLACE_EXISTING)
      Files.setLastModifiedTime(hidden,
        java.nio.file.attribute.FileTime.fromMillis(mtimeMillis))
      Files.move(hidden, dst, StandardCopyOption.ATOMIC_MOVE)
    }
    graft.util.Fs.deleteRecursive(tmp)
  }

  /** The converted events frame, memoized per (context, dir): building
   * it costs a child-session spin-up plus a parquet file-listing +
   * footer read at plan time, and a dozen queries read events — paying
   * that per call tripled their wall time at bench scale. Keyed by
   * SparkContext so a restarted context never serves a frame bound to a
   * stopped one; only the (tiny) analyzed plan is held, no data is
   * pinned. The plan's file listing freezes at first read — fine HERE
   * because `Tables` reads the driver's immutable testdata by contract;
   * a general-purpose reader over mutable paths must re-list (read
   * through `spark.read` directly, not this cache). */
  private val eventsCache =
    scala.collection.concurrent.TrieMap.empty[(org.apache.spark.SparkContext, String), DataFrame]
}
