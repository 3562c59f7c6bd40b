package graft.pipeline

import scala.collection.concurrent.TrieMap
import scala.collection.mutable

import org.apache.spark.sql.SparkSession

/**
 * Distributed-mode Connect worker group — the `connect-distributed`
 * semantics the reference starts (`scripts/connect_start.sh:1`,
 * `connect_configs/connect-distributed.properties`): N workers share
 * one config/offset/status substrate, every connector runs on exactly
 * one worker, any worker's REST surface serves any request, and
 * membership changes rebalance ownership without losing progress.
 *
 * What maps where (the group protocol itself rides Kafka's consumer
 * coordinator in the reference deployment and is consumed here as an
 * in-process contract, like the broker transport — SURVEY §7.5):
 *
 *  - config topic            → `specs`/`targets` (shared maps; specs
 *                              survive worker loss because no worker
 *                              owns them)
 *  - offset/status topics    → one shared checkpoint `root`: a moved
 *                              pipeline resumes from the SAME
 *                              checkpoint dir on its new worker, so
 *                              offsets survive rebalances by
 *                              construction (the connect-offsets
 *                              contract)
 *  - worker                  → an [[Engine]] per member over the
 *                              shared root; ownership = which engine
 *                              has the pipeline registered (the
 *                              single-writer rule, now cluster-wide)
 *  - REST forwarding         → [[runtime]]: every worker's view routes
 *                              to the owner through the cluster
 *
 * Rebalancing is INCREMENTAL-COOPERATIVE (the KIP-415 shape, not the
 * classic eager stop-the-world): assignment is sticky — a connector
 * moves only when its worker left or a join requires shedding load to
 * rebalance — and only the moved connectors bounce; everything else
 * keeps streaming through the rebalance. Deterministic rules so tests
 * and oracles can predict placements: new/orphaned connectors go to
 * the least-loaded member (ties: smallest worker id); a join revokes
 * exactly the over-target excess from the most-loaded members,
 * largest connector names first. A paused connector moves with its
 * target state and stays paused on the new worker.
 */
final class Cluster(spark: SparkSession, root: String) {

  private val specs = TrieMap.empty[String, PipelineSpec]
  private val targets = TrieMap.empty[String, Boolean] // running? (false = paused)
  private val members = mutable.SortedMap.empty[String, Engine]
  private val owners = TrieMap.empty[String, String]
  private val leases = TrieMap.empty[String, Long] // last heartbeat per member

  /** `now` seeds the member's lease (the session.timeout.ms clock is
   * injected, never read from the wall — tests and replays stay
   * deterministic, and the parameter is REQUIRED so a wall-clock caller
   * cannot accidentally seed a lease at epoch 0 and have the next sweep
   * evict the brand-new worker). A worker that never heartbeats again
   * is evicted by the first sweep past `now + timeout`. */
  def addWorker(id: String, now: Long): ConnectRuntime = synchronized {
    require(!members.contains(id), s"worker '$id' already in the group")
    members(id) = new Engine(spark, root)
    leases(id) = now
    rebalance()
    runtime(id)
  }

  /** The member's periodic liveness beacon (heartbeat.interval.ms). */
  def heartbeat(id: String, now: Long): Unit = synchronized {
    require(members.contains(id), s"no worker '$id'")
    leases(id) = now
  }

  /** Coordinator liveness sweep — the session.timeout.ms eviction a
   * real Connect group runs when a member misses heartbeats: every
   * worker whose lease is older than `timeoutMs` is declared dead and
   * its connectors re-place on the survivors, WITHOUT anyone calling
   * [[removeWorker]]. The corpse's queries are fenced best-effort (in a
   * real group the process is already gone — in-process the stop is the
   * stand-in); committed offsets live in the shared checkpoint root, so
   * the moved connector resumes exactly after its last committed batch
   * and the keyed sinks absorb the one legal replay. Returns the
   * evicted worker ids. */
  def sweepExpired(now: Long, timeoutMs: Long): Seq[String] = synchronized {
    val dead = members.keys
      .filter(id => now - leases.getOrElse(id, Long.MinValue) > timeoutMs)
      .toSeq.sorted
    dead.foreach { id =>
      val engine = members.remove(id).get
      leases.remove(id)
      owners.filter(_._2 == id).keys.toSeq.sorted.foreach { n =>
        try engine.delete(n)
        catch { case _: Exception => () } // a dead engine can't object
        owners.remove(n)
      }
    }
    if (dead.nonEmpty) rebalance()
    dead
  }

  /** TEST SEAM — simulate worker `id`'s process dying (its queries stop
   * dead, nothing is deregistered, the group is NOT told). Pair with
   * [[sweepExpired]] to drive the missed-heartbeat eviction path. */
  def crashWorker(id: String): Unit = synchronized {
    members(id).crash()
  }

  /** A worker leaves (gracefully or by death — either way its queries
   * stop and its connectors are orphaned for reassignment; committed
   * offsets are in the shared root, so recovery is the checkpoint's). */
  def removeWorker(id: String): Unit = synchronized {
    val engine = members.remove(id).getOrElse(
      throw new NoSuchElementException(s"no worker '$id'"))
    leases.remove(id)
    owners.filter(_._2 == id).keys.toSeq.sorted.foreach { n =>
      engine.delete(n) // stops the query; checkpoint (offsets) retained
      owners.remove(n)
    }
    rebalance()
  }

  def workerIds: Seq[String] = synchronized(members.keys.toSeq)

  /** name → owning worker, sorted by name (the group's assignment). */
  def assignments(): Seq[(String, String)] =
    synchronized(owners.toSeq.sortBy(_._1))

  // ---- group-internal mechanics ------------------------------------------

  private def load(id: String): Int = owners.count(_._2 == id)

  private def leastLoaded: String =
    members.keys.minBy(id => (load(id), id))

  private def place(name: String): Unit = {
    val owner = leastLoaded
    members(owner).adopt(specs(name), running = targets(name))
    owners(name) = owner
  }

  /** Incremental-cooperative rebalance: assign orphans to the least
   * loaded; if membership grew, revoke exactly the over-target excess
   * (most-loaded donors, largest names first) and re-place it. Never
   * touches a connector whose placement already fits the balance. */
  private def rebalance(): Unit = {
    if (members.isEmpty) return
    val total = specs.size
    val k = members.size
    val base = total / k
    val extras = total % k // the first `extras` members by id carry +1
    val targetLoad = members.keys.toSeq.zipWithIndex
      .map { case (id, i) => id -> (base + (if (i < extras) 1 else 0)) }
      .toMap
    members.foreach { case (id, engine) =>
      val owned = owners.filter(_._2 == id).keys.toSeq.sorted
      // revoke the largest names beyond this member's target load
      owned.drop(targetLoad(id)).foreach { n =>
        engine.delete(n)
        owners.remove(n)
      }
    }
    // one connector failing to START must not abort the rebalance and
    // strand every later orphan: it stays ownerless (status UNASSIGNED)
    // and the next membership change retries it
    specs.keys.toSeq.sorted.filterNot(owners.contains).foreach { n =>
      try place(n) catch { case _: Exception => () }
    }
  }

  private def owner(name: String): Engine =
    members(owners.getOrElse(name,
      throw new NoSuchElementException(s"no pipeline '$name'")))

  /**
   * A worker's view of the group — the [[ConnectRuntime]] its REST
   * surface serves. Views are functionally identical on every worker
   * (a request for a connector owned elsewhere routes through the
   * cluster to the owner — the forwarding contract); the id only
   * labels the serving worker.
   */
  def runtime(id: String): ConnectRuntime = new ConnectRuntime {
    private val cluster = Cluster.this
    override def monitor: AnyRef = cluster

    def registerJson(json: String): Any = register(PipelineSpec.fromJson(json))

    // register IS adopt with a RUNNING target: one registration/
    // rollback protocol, not two copies to keep in sync
    def register(spec: PipelineSpec): Any = adopt(spec, running = true)

    def adopt(spec: PipelineSpec, running: Boolean): Unit =
      cluster.synchronized {
        if (members.isEmpty)
          throw new IllegalStateException("no workers in the group")
        if (specs.contains(spec.name))
          throw new IllegalStateException(
            s"pipeline '${spec.name}' already registered (single-writer rule; delete it first)")
        validate(spec)
        specs(spec.name) = spec
        targets(spec.name) = running // place() adopts with this target
        // rollback on a failed START (e.g. an environment-bound
        // source): a spec that never ran must not wedge the registry —
        // Engine's register has the same start-before-commit ordering
        try place(spec.name)
        catch {
          case e: Throwable =>
            specs.remove(spec.name); targets.remove(spec.name)
            owners.remove(spec.name)
            throw e
        }
      }

    def validate(spec: PipelineSpec): Unit = cluster.synchronized {
      // under the cluster monitor: `members` is a plain SortedMap mutated
      // by add/removeWorker, and an empty group must surface the same
      // 409 'no workers' that register() produces (not a bare head-crash)
      if (members.isEmpty)
        throw new IllegalStateException("no workers in the group")
      members.head._2.validate(spec) // stateless pre-flight; any engine
    }

    def list(): Seq[String] = specs.keys.toSeq.sorted

    def specOf(name: String): Option[PipelineSpec] =
      cluster.synchronized(specs.get(name))

    // an OWNERLESS pipeline (registered, but the last worker left or
    // its start failed during a rebalance) is still registered state:
    // delete must forget it, status reports UNASSIGNED, and target-
    // state changes record for the next placement — only ops that need
    // a live query (restart, offsets) still 404 on it
    private def requireKnown(name: String): Unit =
      if (!specs.contains(name))
        throw new NoSuchElementException(s"no pipeline '$name'")

    def delete(name: String): Unit = cluster.synchronized {
      requireKnown(name)
      owners.get(name).foreach(w => members.get(w).foreach(_.delete(name)))
      owners.remove(name); specs.remove(name); targets.remove(name)
    }

    def pause(name: String): Unit = cluster.synchronized {
      requireKnown(name)
      owners.get(name).foreach(w => members(w).pause(name))
      targets(name) = false
    }

    def resume(name: String): Any = cluster.synchronized {
      requireKnown(name)
      val q = owners.get(name).map(w => members(w).resume(name)).orNull
      targets(name) = true
      q
    }

    def restart(name: String): Unit = cluster.synchronized {
      owner(name).restart(name)
    }

    // reads route under the cluster monitor too: mid-rebalance a moving
    // connector is momentarily owner-less (revoked, not yet re-placed),
    // and an unsynchronized read would 404 a connector that IS
    // registered — found by the ClusterSpec storm
    def status(name: String): (String, String) = cluster.synchronized {
      requireKnown(name)
      owners.get(name) match {
        case Some(w) => members(w).status(name)
        case scala.None => (name, "UNASSIGNED")
      }
    }

    def resetOffsets(name: String): Unit = cluster.synchronized {
      owner(name).resetOffsets(name)
    }

    def latestBatchId(name: String): Option[Long] = cluster.synchronized {
      owner(name).latestBatchId(name)
    }

    override def workerId(name: String): Option[String] =
      cluster.synchronized(owners.get(name))
  }
}
