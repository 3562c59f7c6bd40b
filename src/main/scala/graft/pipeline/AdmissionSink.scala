package graft.pipeline

import java.nio.file.Paths

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.CacheScope
import graft.text.{AdmissionState, Dedup}

/**
 * L13 — the INGEST GATE as a Connect-lifecycle sink: the reference's
 * whole UX is declarative configs over REST (L1/L9), and until this
 * sink the engine's flagship admission operators were reachable only
 * through the bespoke stream runners. A `{"type": "admission"}` sink
 * makes a w12-shape dedup-at-admission pipeline a first-class
 * [[PipelineSpec]]: registrable via [[ConnectServer]], pausable,
 * resumable from the checkpoint, deletable — with the lifecycle verbs
 * mapping onto the fenced [[AdmissionState]] contract:
 *
 *  - **register / resume** acquire the admission-writer epoch
 *    ([[AdmissionState.acquireWriter]]) — a paused-then-resumed
 *    pipeline supersedes its previous incarnation, so a zombie query
 *    (e.g. a stop that raced a trigger) refuses its next state append
 *    deterministically instead of interleaving;
 *  - **the checkpoint identity binds to the state dir**
 *    ([[AdmissionState.bindCheckpoint]]) — pointing a different
 *    pipeline name (= different checkpoint) at the same gate root
 *    refuses at entry, because fresh batch ids would overwrite
 *    committed `b<id>` state;
 *  - **offset reset** (L4) wipes the gate root with the checkpoint:
 *    batch ids restart at 0, so keeping admission state would corrupt
 *    (its `b<id>` dirs would collide with the restarted stream) —
 *    re-ingesting from scratch is exactly Debezium's
 *    re-snapshot-after-offset-delete semantics, applied to the gate.
 *
 * The per-trigger body IS w12's: the batch's derived artifacts
 * (digest + MinHash signature + shingle set) against the PRECOMPUTED
 * reference state only — O(batch) hashing plus joins against state
 * that grows only by admitted artifacts; reference text is never
 * re-read after the seed bootstrap. Dials match the w12 gate
 * (k=3 shingles, 16 perms, 4 bands) so the REST-registered pipeline's
 * verdicts hash-match the bespoke runner's on the same waves.
 */
object AdmissionSink {

  private val ShingleK = 3
  private val NumPerms = 16
  private val Bands = 4
  private val FoldThreshold = 6

  /** First-start bootstrap: derive the seed corpus's artifact state
   * ONCE (idempotent — a restart on an existing state dir skips it;
   * the stream then resumes from the checkpoint against the state its
   * committed batches built). */
  def bootstrap(spark: SparkSession, seedPath: String, root: String): Unit = {
    val seedArt = Paths.get(root, "state", "seed", "art")
    if (AdmissionState.parts(s"$root/state", Long.MaxValue).nonEmpty) return
    val seed = spark.read.parquet(seedPath).select("doc_id", "text")
    seed.write.mode("overwrite").parquet(s"$root/ref/seed")
    Dedup.admissionArtifacts(seed, "doc_id", "text",
        k = ShingleK, numPerms = NumPerms)
      .write.mode("overwrite").parquet(seedArt.toString)
  }

  /** One micro-batch through the gate: verdict from state, admitted
   * survivors' text to `ref/`, their artifacts appended to state, the
   * maintenance fold once the unfolded tail exceeds the threshold —
   * the exact replay-safe shape of the bespoke runner (verdict and
   * appends land in per-batch overwrite dirs; the state read excludes
   * ids at or above the current batch). */
  def applyBatch(spark: SparkSession, root: String, epoch: Long,
                 batch: DataFrame, id: Long): Unit = {
    val stateDir = s"$root/state"
    CacheScope.withScope { implicit scope =>
      val b = scope.persist(batch).toDF()
      AdmissionState.guard(stateDir, epoch)
      val parts = AdmissionState.parts(stateDir, id)
      val stateArt = spark.read.parquet(parts.map(_ + "/art"): _*)
      val batchArt = scope.persist(Dedup.admissionArtifacts(
        b, "doc_id", "text", k = ShingleK, numPerms = NumPerms)).toDF()
      val verdict = scope.persist(Dedup.admissionVerdictIncremental(
        batchArt, stateArt, numBands = Bands, numPerms = NumPerms)).toDF()
      verdict.write.mode("overwrite").parquet(s"$root/out/batch=$id")
      val admIds = verdict.filter(col("admitted")).select("doc_id")
      b.join(admIds, "doc_id")
        .write.mode("overwrite").parquet(s"$root/ref/adm$id")
      if (parts.size > FoldThreshold)
        Dedup.maintenanceFold(spark, stateDir, upTo = id - 1,
          subs = Seq("art"), epoch = epoch)
      batchArt.join(admIds, "doc_id")
        .write.mode("overwrite").parquet(s"$stateDir/b$id/art")
    }
  }

  /** L4 for the gate: the offset reset deletes the WHOLE gate root
   * alongside the checkpoint — a reset stream restarts batch ids at 0,
   * which would collide with committed `b<id>` state dirs, so state,
   * verdicts and the admitted-corpus product go with the offsets (the
   * ingest-gate analog of Debezium re-snapshotting after its offsets
   * are deleted). The checkpoint-identity marker lives under the state
   * dir and dies with it; the next start bootstraps and binds fresh.
   * Only called while the pipeline is paused (the engine enforces
   * that). */
  def resetState(root: String): Unit =
    graft.util.Fs.deleteRecursive(Paths.get(root))

  /** The connect-frame → document unwrap: admission consumes
   * (doc_id, text) rows; tombstones (null value) carry no document. */
  def documentsOf(framed: DataFrame): DataFrame =
    framed.filter(col(graft.model.Connect.ValueCol).isNotNull)
      .select(
        col(s"${graft.model.Connect.ValueCol}.doc_id").cast("long")
          .as("doc_id"),
        col(s"${graft.model.Connect.ValueCol}.text").cast("string")
          .as("text"))
}
