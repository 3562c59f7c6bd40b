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

  /** events.parquet carries TIMESTAMP(NANOS) which Spark's parquet reader
   * rejects; read nanos as long and truncate to micros (exactly DuckDB's
   * ns->us conversion), surfacing the column as TIMESTAMP_NTZ like every
   * other no-zone parquet timestamp in the testdata. The legacy flag is
   * scoped to a child session (shared SparkContext, isolated conf) so the
   * caller's session never observes the side effect. */
  def readEvents(s: SparkSession, dir: String): DataFrame =
    eventsCache.getOrElseUpdate((s.sparkContext, dir), {
      val scoped = s.newSession()
      scoped.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      scoped.conf.set("spark.sql.session.timeZone", "UTC")
      scoped.read.parquet(s"$dir/events.parquet")
        .withColumn("ts", timestamp_micros(expr("ts div 1000")).cast(TimestampNTZType))
    })

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
