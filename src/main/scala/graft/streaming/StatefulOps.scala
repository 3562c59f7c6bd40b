package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Custom stateful streaming operators via `KeyValueGroupedDataset`
 * state APIs — the engine's `flatMapGroupsWithState` surface.
 *
 * The flagship is cross-batch key dedup: at-least-once sources replay
 * records; keyed state remembers seen keys so replays drop. This is the
 * streaming complement of the idempotent merge sink (K1) — use the sink
 * when the target is keyed storage, this operator when downstream is
 * append-only (e.g. a training-data export).
 *
 * Scale: state is per-key-group and lives in the state store (RocksDB in
 * production configs), partitioned by the grouping key — the same
 * shuffle the aggregation would need anyway. TTL via processing-time
 * timeout bounds state size for unbounded key spaces.
 */
object StatefulOps {

  /**
   * Emit only the FIRST record seen for each key (by `keyCols`), across
   * all micro-batches. `ttlMs` > 0 expires key state after that many ms
   * of processing time (bounded-state mode for unbounded key domains).
   */
  def dedupByKey(df: DataFrame, keyCols: Seq[String],
                 ttlMs: Long = 0L): DataFrame = {
    val schema = df.schema
    val keyIdx = keyCols.map(schema.fieldIndex)
    val timeout =
      if (ttlMs > 0) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    // Unambiguous composite-key encoding: nulls get a sentinel no value
    // can produce (values are length-prefixed, so they always start with
    // a digit), and the length prefix makes separator collisions
    // impossible -- ("a|b","c") and ("a","b|c") encode differently.
    df.groupByKey { r =>
        keyIdx.map { i =>
          if (r.isNullAt(i)) ""
          else { val s = String.valueOf(r.get(i)); s"${s.length}:$s" }
        }.mkString("|")
      }(Encoders.STRING)
      .flatMapGroupsWithState[Boolean, Row](
        OutputMode.Append(), timeout) {
        (_: String, rows: Iterator[Row], state: GroupState[Boolean]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else if (state.exists) Iterator.empty
          else {
            state.update(true)
            if (ttlMs > 0) state.setTimeoutDuration(ttlMs)
            rows.take(1)
          }
      }(Encoders.scalaBoolean, Encoders.row(schema))
  }
}
