package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.storage.StorageLevel

/**
 * Owns the lifetime of DataFrames persisted inside graft operators.
 *
 * Operators that materialize intermediates (LSH signature tables,
 * inverted indexes) take a scope and register every persist with it; the
 * caller decides when the caches die. A bare `.persist` inside a library
 * function leaks executor storage in a long-lived session, and because
 * Spark's CacheManager matches entries by analyzed plan, a later call
 * over the same source path after the underlying data changed can
 * silently serve stale cached results.
 */
final class CacheScope extends AutoCloseable {
  private val tracked = scala.collection.mutable.ArrayBuffer.empty[Dataset[_]]

  /** Persist (MEMORY_AND_DISK) and register for release at [[close]]. */
  def persist[T](ds: Dataset[T]): Dataset[T] = synchronized {
    tracked += ds
    ds.persist(StorageLevel.MEMORY_AND_DISK)
  }

  /** Unpersist everything registered, newest first. */
  override def close(): Unit = synchronized {
    tracked.reverseIterator.foreach(_.unpersist(blocking = false))
    tracked.clear()
  }
}

object CacheScope {

  /** Run `f` with a fresh scope, unpersisting its caches on exit. The
   * block must CONSUME (collect/write/checkpoint) anything that depends
   * on the scoped caches — results returned lazily recompute from
   * scratch once the scope closes. */
  def withScope[A](f: CacheScope => A): A = {
    val s = new CacheScope
    try f(s) finally s.close()
  }

  /** Build a small result through scoped caches and hand it back
   * materialized (`localCheckpoint`): the intermediates are freed
   * eagerly, the result survives the scope with its lineage truncated,
   * and its storage is released by Spark's ContextCleaner once the
   * caller drops the reference — no CacheManager entry to leak or to
   * match stale plans against. Meant for operator outputs that are small
   * relative to their inputs (candidate pairs, contamination reports);
   * large outputs should instead be written to storage inside
   * [[withScope]], which also restores full lineage fault tolerance. */
  def materialized(build: CacheScope => DataFrame): DataFrame =
    withScope(scope => build(scope).localCheckpoint())
}
