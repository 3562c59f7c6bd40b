package graft.pipeline

/**
 * The Connect-worker lifecycle surface [[ConnectServer]] serves —
 * implemented by the standalone [[Engine]] (one worker owning every
 * pipeline) and by [[Cluster#runtime]] (distributed mode: N workers, a
 * shared config/offset substrate, requests routed to the owner — the
 * in-process analog of Connect REST forwarding to the worker that
 * runs the connector).
 *
 * `monitor` is the object compound REST routes synchronize on: for a
 * standalone engine the engine itself; for a cluster the CLUSTER, so
 * check-then-act sequences stay atomic even when two workers' REST
 * servers race on the same name.
 */
trait ConnectRuntime {
  def monitor: AnyRef = this
  def registerJson(json: String): Any
  def register(spec: PipelineSpec): Any
  /** Register with an explicit initial target state; `running = false`
   * installs the spec PAUSED with no query started — the config-update
   * path for paused connectors (register-then-pause would let a
   * micro-batch commit in the window, violating Connect's contract that
   * a paused connector runs no batch through a config change). */
  def adopt(spec: PipelineSpec, running: Boolean): Unit
  def validate(spec: PipelineSpec): Unit
  def list(): Seq[String]
  def delete(name: String): Unit
  def pause(name: String): Unit
  def resume(name: String): Any
  def restart(name: String): Unit
  def status(name: String): (String, String)
  def resetOffsets(name: String): Unit
  def latestBatchId(name: String): Option[Long]
  /** Distributed mode: which worker runs this pipeline (Connect's
   * `worker_id` in the status payload). None for a standalone engine. */
  def workerId(name: String): Option[String] = None
  /** The registered spec, for config-update rollback: a failed update
   * restores THIS, so updates work on connectors registered through any
   * channel (engine API or REST), not just ones whose JSON body the
   * REST surface happens to hold. */
  def specOf(name: String): Option[PipelineSpec]
}
