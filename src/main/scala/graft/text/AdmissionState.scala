package graft.text

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/**
 * The admission-state STORAGE layout shared by the streamed admission
 * runners (w12/w14's text artifacts, m22's media fingerprints): a
 * `seed/` bootstrap dir plus one `b<id>/` dir per admitted batch, each
 * holding the same sub-tables (`art`, `sh`, `imgfp`, ... — the runner
 * decides). Growing one dir per trigger is correct but accumulates
 * small files: at production trigger counts every trigger's state read
 * pays a listing + a parquet footer per historical batch — the classic
 * small-files problem, the same one [[graft.ml.IndexStore]] folds away
 * for the vector delta log. [[fold]] is that compaction verb applied
 * here: seed + `b<=upTo` collapse into ONE `fold=<upTo>` dir (staged
 * dot-prefixed, published by a single atomic rename — a crash leaves
 * an invisible `.tmp`), and [[parts]] resolves the newest fold plus
 * the unfolded tail.
 *
 * Concurrency contract (the [[graft.ml.IndexStore.compact]] shape):
 * fold runs in a maintenance window — either the admission stream is
 * quiesced, or `upTo` is strictly below the stream's frontier batch id
 * (committed ids never replay, so no writer can touch a folded dir;
 * only the FRONTIER id can be rewritten by a crash-replay). Readers
 * racing a fold must re-list on a miss, exactly like a vacuum grace.
 */
object AdmissionState {

  private def list(stateDir: String): Seq[Path] = {
    val d = Paths.get(stateDir)
    if (!Files.isDirectory(d)) Nil
    else {
      val listing = Files.list(d)
      try listing.iterator().asScala.toList finally listing.close()
    }
  }

  private def batchId(name: String): Option[Long] =
    if (name.startsWith("b") && name.drop(1).forall(_.isDigit))
      Some(name.drop(1).toLong) else None

  private def foldId(name: String): Option[Long] =
    if (name.startsWith("fold=")) Some(name.stripPrefix("fold=").toLong)
    else None

  /** The state part dirs a trigger with batch id `belowId` reads: the
   * newest committed fold strictly below `belowId` (which covers seed
   * and every `b<=foldId`), plus `seed`/`b<id>` dirs above that fold
   * horizon and strictly below `belowId`. Strictly-below keeps the
   * replay discipline: a crashed attempt's own leftovers are never
   * its replay's reference. */
  def parts(stateDir: String, belowId: Long): Seq[String] = {
    val entries = list(stateDir).map(p => p.getFileName.toString -> p)
    val fold = entries.flatMap { case (n, p) =>
      foldId(n).filter(_ < belowId).map(_ -> p)
    }.sortBy(_._1).lastOption
    val horizon = fold.map(_._1).getOrElse(-1L)
    val tail = entries.collect {
      case (n, p) if batchId(n).exists(id => id > horizon && id < belowId) =>
        (batchId(n).get, p)
    }.sortBy(_._1).map(_._2)
    val seed = if (fold.isEmpty)
      entries.collect { case ("seed", p) => p } else Nil
    (fold.map(_._2).toSeq ++ seed ++ tail).map(_.toString)
  }

  /** Fold `seed` + every `b<=upTo` into `fold=<upTo>` — one compacted
   * dir per sub-table, staged under a dot-prefixed temp and published
   * by ONE atomic rename; the folded inputs (and any older fold) are
   * deleted after the publish. No-op when nothing new would fold.
   * See the concurrency contract above. */
  def fold(spark: SparkSession, stateDir: String, upTo: Long,
           subs: Seq[String]): Boolean = {
    val entries = list(stateDir).map(p => p.getFileName.toString -> p)
    val priorFold = entries.flatMap { case (n, p) => foldId(n).map(_ -> p) }
      .sortBy(_._1).lastOption
    val horizon = priorFold.map(_._1).getOrElse(-1L)
    require(upTo > horizon,
      s"fold upTo=$upTo is not above the current fold horizon $horizon")
    // a fold PAST the newest batch would publish as fold=<upTo> yet be
    // invisible to parts(belowId) for every belowId <= upTo — with seed
    // already retired, those readers would resolve nothing: refuse
    val maxBatch = entries.flatMap { case (n, _) => batchId(n) }
      .foldLeft(-1L)(math.max)
    require(upTo <= maxBatch,
      s"fold upTo=$upTo exceeds the newest state batch $maxBatch")
    val inputs = parts(stateDir, upTo + 1)
    val toRetire = entries.collect {
      case (n, p) if n == "seed" && priorFold.isEmpty => p
      case (n, p) if batchId(n).exists(id => id > horizon && id <= upTo) => p
    } ++ priorFold.map(_._2).toSeq
    if (inputs.isEmpty) false
    else {
      val tmp = Paths.get(stateDir, s".fold=$upTo.tmp")
      graft.util.Fs.deleteRecursive(tmp)
      subs.foreach { sub =>
        spark.read.parquet(inputs.map(_ + s"/$sub"): _*)
          .write.parquet(tmp.resolve(sub).toString)
      }
      Files.move(tmp, Paths.get(stateDir, s"fold=$upTo"),
        StandardCopyOption.ATOMIC_MOVE)
      toRetire.foreach(graft.util.Fs.deleteRecursive)
      true
    }
  }
}
