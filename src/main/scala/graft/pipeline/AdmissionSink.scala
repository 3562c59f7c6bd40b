package graft.pipeline

import java.nio.file.Paths

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.LlmQueries
import graft.ml.Similarity

/**
 * L13/L14 — the INGEST GATE as a Connect-lifecycle sink: the reference's
 * whole UX is declarative configs over REST (L1/L9), and until this
 * sink the engine's flagship admission operators were reachable only
 * through the bespoke stream runners. A `{"type": "admission"}` sink
 * makes an admission pipeline a first-class [[PipelineSpec]]:
 * registrable via [[ConnectServer]], pausable, resumable from the
 * checkpoint, deletable — with the lifecycle verbs mapping onto the
 * fenced [[graft.text.AdmissionState]] contract:
 *
 *  - **register / resume** acquire the admission-writer epoch
 *    ([[graft.text.AdmissionState.acquireWriter]]) — a paused-then-
 *    resumed pipeline supersedes its previous incarnation, so a zombie
 *    query (e.g. a stop that raced a trigger) refuses its next state
 *    append deterministically instead of interleaving;
 *  - **the checkpoint identity binds to the state dir**
 *    ([[graft.text.AdmissionState.bindCheckpoint]]) — pointing a
 *    different pipeline name (= different checkpoint) at the same gate
 *    root refuses at entry, because fresh batch ids would overwrite
 *    committed `b<id>` state;
 *  - **offset reset** (L4) wipes the gate root with the checkpoint:
 *    batch ids restart at 0, so keeping admission state would corrupt
 *    (its `b<id>` dirs would collide with the restarted stream) —
 *    re-ingesting from scratch is exactly Debezium's
 *    re-snapshot-after-offset-delete semantics, applied to the gate.
 *
 * Every admission AXIS is a sink config key (r17 — the reference
 * toggles every behavior per connector by config key:
 * pk.mode/delete.enabled/auto.evolve in `실습수행/JDBC Sink Connector
 * 실습.md:331-363`, per-connector feature flags across the
 * `connector_configs` JSON files):
 * `fused` adds the quality + novelty legs, `benchPath` the frozen
 * benchmark decontamination leg, `containment`/`semantic` their
 * postings/embedding legs, `media`+`benchMediaPath` the fingerprint
 * axes. The per-trigger body, state layout and maintenance fold are
 * [[graft.LlmQueries.AdmissionGateCore]] — the SAME implementation the
 * bespoke w12–w18 runners drive, so a REST-registered gate's verdicts
 * hash-match the runners' on identical waves. With every key absent
 * the gate is the plain w12 dedup shape (k=3 shingles, 16 perms, 4
 * bands). The semantic dial (`semPlanes`, a plane COUNT) is part of
 * the declarative config; the frozen center derives from the seed at
 * bootstrap and persists beside the state, and a RESUMED gate rebuilds
 * the live dials from state alone
 * ([[graft.LlmQueries.AdmissionGateCore.resumeDials]]).
 */
object AdmissionSink {

  /** The gate core a sink spec declares. Dim is the engine-wide
   * hashed-embedding width; plane count defaults to the fixture dial
   * (8) — production specs pass the corpus-scaled count (expected
   * bucket ≈ 16 docs). */
  def coreFor(sink: SinkSpec): LlmQueries.AdmissionGateCore =
    new LlmQueries.AdmissionGateCore(
      sink.path,
      fused = sink.fused,
      hasBench = sink.benchPath.nonEmpty,
      containment = sink.containment,
      semantic = sink.semantic,
      media = sink.media,
      hasBenchMedia = sink.benchMediaPath.nonEmpty,
      semPlanes0 =
        Similarity.hyperplanes(sink.semPlanes.getOrElse(8), LlmQueries.Dim))

  /** First-start bootstrap: derive the seed corpus's state ONCE
   * (idempotent — a restart on a completed state dir skips straight to
   * [[graft.LlmQueries.AdmissionGateCore.resumeDials]]; the stream then
   * resumes from the checkpoint against the state its committed batches
   * built). The benchmark corpora freeze here — benchmarks change
   * rarely; re-registering with a new `benchPath` requires an offset
   * reset (fresh gate) by design. */
  def bootstrapOrResume(spark: SparkSession, sink: SinkSpec,
                        core: LlmQueries.AdmissionGateCore): Unit =
    if (core.bootstrapped) core.resumeDials(spark)
    else {
      def docs(p: String): DataFrame =
        spark.read.parquet(p).select("doc_id", "text")
      core.bootstrap(spark, docs(sink.seedPath.get),
        sink.benchPath.map(docs), sink.benchMediaPath.map(docs))
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
