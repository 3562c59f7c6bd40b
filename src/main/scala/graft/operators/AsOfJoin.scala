package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/**
 * As-of join: for each left row, attach the right row with the greatest
 * `rightTs <= leftTs` for the same key (the time-series "latest state at
 * event time" join; Spark has no built-in).
 *
 * Implementation is the union-tag pattern, NOT a range join: both sides
 * union into one stream tagged by side, then a single
 * `last(_, ignoreNulls)` running-window over (key, ts, side) carries the
 * most recent right payload forward into each left row.
 *
 * Scale: one shuffle + per-partition sort on (key, ts) — the same cost
 * as a sort-merge join, with NO row explosion regardless of how many
 * right rows precede each left row (a naive `join + groupBy max` is
 * O(|L| x |R|) per key). Skewed keys split fine under AQE because the
 * window partitions by key only.
 */
object AsOfJoin {

  /**
   * `left` rows keep all their columns; matched right columns appear as
   * a nullable struct column `asof` (null = no right row at or before
   * the left timestamp). Right-side ties on (key, ts) must be resolved
   * by the caller (dedup first) for determinism.
   */
  def asof(left: DataFrame, right: DataFrame,
           leftKey: String, rightKey: String,
           leftTs: String, rightTs: String): DataFrame = {
    val lSchema = StructType(left.schema.fields)
    val rSchema = StructType(right.schema.fields)
    val lPayload = struct(left.columns.map(col).toIndexedSeq: _*)
    val rPayload = struct(right.columns.map(col).toIndexedSeq: _*)
    val l = left.select(
      col(leftKey).as("_k"), col(leftTs).as("_ts"), lit(1).as("_side"),
      lPayload.as("_l"), lit(null).cast(rSchema).as("_r"))
    val r = right.select(
      col(rightKey).as("_k"), col(rightTs).as("_ts"), lit(0).as("_side"),
      lit(null).cast(lSchema).as("_l"), rPayload.as("_r"))
    // right rows sort BEFORE left rows at equal ts => inclusive (<=) match
    val w = Window.partitionBy("_k").orderBy(col("_ts"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("_m", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(col("_l.*"), col("_m").as("asof"))
  }
}
