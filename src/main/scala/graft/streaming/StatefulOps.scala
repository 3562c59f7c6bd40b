package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
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
   *
   * State-format note: the group key is the row's `to_json` rendering of
   * the key columns (nulls kept) — type-aware, so STRUCT keys cannot
   * alias across nested separators and BINARY keys compare by content
   * (base64), not object identity; a `String.valueOf` encoding gets
   * both wrong. Checkpoints written by an earlier encoding do not
   * resolve against it — restart such a query from a fresh checkpoint.
   */
  def dedupByKey(df: DataFrame, keyCols: Seq[String],
                 ttlMs: Long = 0L): DataFrame = {
    val schema = df.schema
    val timeout =
      if (ttlMs > 0) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    // collision-proof synthetic name: if the input already had a __gk
    // column, withColumn would replace it IN PLACE and the positional
    // strip below would drop the caller's real trailing column instead
    val gkName = Iterator.iterate("__gk")(_ + "_")
      .dropWhile(schema.fieldNames.contains).next()
    val keyed = df.withColumn(gkName,
      to_json(struct(keyCols.map(col): _*),
        Map("ignoreNullFields" -> "false")))
    val gkIdx = keyed.schema.fieldIndex(gkName)
    keyed.groupByKey(_.getString(gkIdx))(Encoders.STRING)
      .flatMapGroupsWithState[Boolean, Row](
        OutputMode.Append(), timeout) {
        (_: String, rows: Iterator[Row], state: GroupState[Boolean]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else if (state.exists) Iterator.empty
          else {
            state.update(true)
            if (ttlMs > 0) state.setTimeoutDuration(ttlMs)
            // strip the synthetic key — appended last (name is unique)
            rows.take(1).map(r => Row.fromSeq(r.toSeq.init))
          }
      }(Encoders.scalaBoolean, Encoders.row(schema))
  }

  /**
   * Streaming MinHash near-dup detection — the in-stream complement of
   * [[graft.text.Dedup.minhashCandidates]]: as documents arrive, each
   * LSH band bucket remembers the FIRST document that claimed it; a
   * later document colliding in ANY band is a near-dup candidate of an
   * earlier one.
   *
   * Emits one row per (doc, band): `(doc_id, band_dup)` where
   * `band_dup` is true iff that band's bucket was already owned by a
   * different document. The per-document verdict is
   * `bool_or(band_dup)` grouped by doc — a downstream aggregation,
   * legal after `flatMapGroupsWithState` in Append mode (see
   * [[nearDupVerdicts]]).
   *
   * Scale: state is ONE long (owner id) per occupied bucket, keyed by
   * (band, bucket key) — the same partitioning the batch LSH join
   * shuffles on; `ttlMs` bounds state for unbounded streams. Ties
   * within a micro-batch resolve by arrival order inside the group
   * iterator (any owner is a valid dedup representative).
   */
  def lshNearDupFlags(docs: DataFrame, idCol: String, textCol: String,
                      numPerms: Int = 16, bands: Int = 4,
                      ttlMs: Long = 0L): DataFrame = {
    import graft.text.Dedup
    import graft.functions.Hashing
    // bands > numPerms would give zero-row bands (every bucket key
    // empty → the whole stream flags as one giant dup cluster), and a
    // non-divisor silently ignores trailing permutations — reject both
    require(bands >= 1 && bands <= numPerms && numPerms % bands == 0,
      s"bands ($bands) must divide numPerms ($numPerms)")
    val perms = Hashing.minhashPerms(numPerms)
    val rows = numPerms / bands
    val banded = docs
      .select(col(idCol).cast("long").as("_id"),
        Dedup.tokens(col(textCol)).as("_t"))
      .filter(size(col("_t")) >= 3)
      .select(col("_id"), Dedup.tokenHashes31(col("_t")).as("_th"))
      .select(col("_id"), Dedup.shingleHashesFromTokenHashes(col("_th"), 3).as("_h"))
      .select(col("_id"), Dedup.minhashSignature(col("_h"), perms).as("_sig"))
      .select(col("_id"),
        explode(Dedup.lshBands(col("_sig"), bands, rows)).as("_b"))
      .select(col("_id"), col("_b.band").as("_band"), col("_b.bkey").as("_bkey"))
    val timeout =
      if (ttlMs > 0) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    banded
      .groupByKey(r => s"${r.getInt(1)}:${r.getString(2)}")(Encoders.STRING)
      .flatMapGroupsWithState[Long, (Long, Boolean)](
        OutputMode.Append(), timeout) {
        (_: String, recs: Iterator[Row], state: GroupState[Long]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var owner = state.getOption
            val out = recs.map { r =>
              val id = r.getLong(0)
              owner match {
                case None => owner = Some(id); (id, false)
                case Some(o) => (id, o != id)
              }
            }.toVector
            owner.foreach { o =>
              state.update(o)
              if (ttlMs > 0) state.setTimeoutDuration(ttlMs)
            }
            out.iterator
          }
      }(Encoders.scalaLong, Encoders.product[(Long, Boolean)])
      .toDF("doc_id", "band_dup")
  }

  /** Per-document near-dup verdicts over [[lshNearDupFlags]] output:
   * `(doc_id, is_dup)` — true iff any band collided with an earlier
   * document. Run with Update/Complete output mode (it is a streaming
   * aggregation). */
  def nearDupVerdicts(flags: DataFrame): DataFrame =
    flags.groupBy("doc_id")
      .agg(bool_or(col("band_dup")).as("is_dup"))
}
