package graft.sinks

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.util.Fs

/**
 * Versioned keyed table — a miniature transaction-log format that
 * removes [[graft.pipeline.TableSink]]'s documented scale limit (full
 * state rewrite per batch). The idea is Delta/Iceberg's, reduced to the
 * piece the keyed sink needs:
 *
 *  - each batch appends ONE delta version holding only that batch's
 *    last-per-key rows (tombstones travel as marker rows) — write cost
 *    is O(batch), never O(state);
 *  - reads merge the versions by (version, seq) last-write-wins —
 *    cost bounded by compaction cadence;
 *  - [[compact]] folds everything into a single version that KEEPS
 *    tombstone markers, so a crash between the compacted write and the
 *    old-version cleanup re-merges to the identical state (replay-safe,
 *    like every other graft merge path).
 *
 * Commit protocol: write to a hidden temp dir, then a single atomic
 * directory rename to `v%08d` — a version either exists completely or
 * not at all; leftover temp dirs are ignored by readers and swept by
 * the next writer. (A distributed object store would use a manifest
 * commit instead; the version-listing contract is the same.)
 */
object LogTable {

  // 8+ digits: zero-padding keeps names sortable, but the match must not
  // silently drop a version that outgrows the padding
  private val VersionRe = "v(\\d{8,})".r

  private def versionDirs(path: String): Seq[(Int, Path)] = {
    val root = Paths.get(path)
    if (!Files.isDirectory(root)) Seq.empty
    else {
      val s = Files.list(root)
      try s.iterator().asScala
        .flatMap(p => p.getFileName.toString match {
          case VersionRe(n) => Some(n.toInt -> p)
          case _ => None
        }).toSeq.sortBy(_._1)
      finally s.close()
    }
  }

  private val BatchMarkerRe = "_batchid-(\\d+)".r

  /** Append one batch (connect frame: key struct, value struct or NULL
   * tombstone, seq) as the next delta version.
   *
   * EXACTLY-ONCE on replay: pass the micro-batch id and the append
   * becomes idempotent — the id commits atomically with its version (a
   * `_batchid-N` marker inside the version dir, invisible to parquet
   * readers), and a re-delivered batch whose id is already committed is
   * a no-op. This is the contract `foreachBatch` sinks need: after a
   * crash between sink commit and checkpoint commit, streaming re-runs
   * the last batch, and without the marker the log would hold its rows
   * twice (harmless for last-write-wins reads, but write-amplifying and
   * wrong for any additive consumer). */
  def applyBatch(path: String, batch: DataFrame, keys: Seq[String],
                 batchId: Option[Long] = None): Unit = {
    sweepTemp(path)
    val committedMax = batchId.flatMap(_ => maxCommittedBatchId(path))
    if (batchId.exists(id => committedMax.contains(id)))
      return // the LAST batch re-delivered after a crash — idempotent no-op
    // foreachBatch ids are monotonic per checkpoint and only the last
    // batch can legally replay: an id BELOW the committed max means a
    // second query is writing this path, or a reset checkpoint
    // restarted ids from 0 — silently discarding those batches would
    // masquerade as replay handling, so fail loudly
    for (id <- batchId; max <- committedMax; if id < max)
      throw new IllegalStateException(
        s"batch $id is behind committed batch $max under $path: only the " +
          "last committed batch can replay — this sink path is being " +
          "written by a query whose checkpoint was reset (or by a second " +
          "query); point it at a fresh sink path or delete the log first")
    val keyed = flatten(batch)
    val delta = MergeSink.lastPerKey(keyed, keys, "seq")
    val n = versionDirs(path).lastOption.map(_._1 + 1).getOrElse(1)
    commit(path, n, delta, batchId)
  }

  /** Highest committed batch id. foreachBatch ids are monotonic and only
   * the LAST batch can be re-delivered after a crash, so the max alone
   * decides replay — each commit carries at most one marker and
   * compaction folds them to a single max marker on the base, keeping
   * marker count O(versions) forever instead of O(total batches). */
  def maxCommittedBatchId(path: String): Option[Long] =
    versionDirs(path).flatMap { case (_, p) =>
      val s = Files.list(p)
      try s.iterator().asScala.flatMap(_.getFileName.toString match {
        case BatchMarkerRe(id) => Some(id.toLong)
        case _ => None
      }).toList
      finally s.close()
    }.maxOption

  /** Current table state: merge all versions, newest (version, seq)
   * wins per key, tombstoned keys dropped. One shuffle over the deltas
   * (and the base, if compacted). */
  def read(spark: SparkSession, path: String, keys: Seq[String]): DataFrame = {
    val vs = versionDirs(path)
    require(vs.nonEmpty, s"no committed versions under $path")
    val all = vs.map { case (n, p) =>
      spark.read.parquet(p.toString).withColumn("_v", lit(n))
    }.reduce(_.unionByName(_, allowMissingColumns = true))
    val merged = MergeSink.lastPerKey(
      all.withColumn("_ord", struct(col("_v"), col("seq"))), keys, "_ord")
    merged.filter(!col("_tombstone"))
      .drop("_tombstone", "_v", "_ord", "seq")
  }

  /** Fold all versions into one. Tombstone markers are preserved so the
   * compacted base re-merges idempotently with any delta a crash left
   * behind; old versions are deleted only after the new base commits. */
  def compact(spark: SparkSession, path: String, keys: Seq[String]): Unit = {
    val vs = versionDirs(path)
    if (vs.size <= 1) return
    val all = vs.map { case (n, p) =>
      spark.read.parquet(p.toString).withColumn("_v", lit(n))
    }.reduce(_.unionByName(_, allowMissingColumns = true))
    val merged = MergeSink.lastPerKey(
        all.withColumn("_ord", struct(col("_v"), col("seq"))), keys, "_ord")
      .drop("_v", "_ord") // seq rides along in the payload unchanged
    // the folded versions' max batch marker moves onto the compacted
    // base, so replay detection survives compaction
    commit(path, vs.last._1 + 1, merged,
      batchId = maxCommittedBatchId(path))
    vs.foreach { case (_, p) => Fs.deleteRecursive(p) }
  }

  def versions(path: String): Seq[Int] = versionDirs(path).map(_._1)

  /** Flatten a connect frame to (key fields..., payload..., _tombstone,
   * seq) rows — tombstones become marker rows carrying only their key.
   * Key columns keep their struct-field names (the names `keys`
   * callers pass); same-named value fields are the key's copy and drop. */
  private def flatten(batch: DataFrame): DataFrame = {
    val (keyNames, keyCols) = batch.schema("key").dataType match {
      case s: org.apache.spark.sql.types.StructType =>
        (s.fieldNames.toSeq, s.fieldNames.toSeq.map(f => col(s"key.$f").as(f)))
      case _ => (Seq("key"), Seq(col("key")))
    }
    // value-struct copies of the key fields and of the frame-level
    // `seq` (Engine frames carry the ordering column in both places)
    // would collide with the flattened columns — the frame's own are
    // authoritative, the copies drop
    val valueFields = batch.schema("value").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
      .fieldNames.toSeq
      .filterNot(f => keyNames.contains(f) || f == "seq" || f == "_tombstone")
    batch.select(
      keyCols ++
        valueFields.map(f => col(s"value.$f").as(f)) ++
        Seq(col("value").isNull.as("_tombstone"), col("seq")): _*)
  }

  private def commit(path: String, n: Int, df: DataFrame,
                     batchId: Option[Long] = None): Unit = {
    Files.createDirectories(Paths.get(path))
    val tmp = Paths.get(path, f".tmp-v$n%08d")
    df.write.mode("overwrite").parquet(tmp.toString)
    // the marker rides inside the dir so the atomic rename commits it
    // with the data; the leading underscore hides it from parquet
    batchId.foreach(id =>
      Files.createFile(tmp.resolve(s"_batchid-$id")))
    Files.move(tmp, Paths.get(path, f"v$n%08d"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  private def sweepTemp(path: String): Unit = {
    val root = Paths.get(path)
    if (Files.isDirectory(root)) {
      val s = Files.list(root)
      try s.iterator().asScala
        .filter(_.getFileName.toString.startsWith(".tmp-v"))
        .foreach(Fs.deleteRecursive)
      finally s.close()
    }
  }
}
