package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.BinaryType

/**
 * Broadcast Bloom-filter pruning, the asymmetric-join scale pattern:
 * aggregate the SMALL side's keys into a Bloom filter once, ship the
 * serialized bits to every task as a plan literal, and drop big-side
 * rows BEFORE they reach the join shuffle. False positives survive the
 * prune and are eliminated by the exact join that follows; there are no
 * false negatives, so results are identical to the unpruned plan.
 *
 * Spark ships these expressions for its own runtime row-level filters
 * (`spark.sql.optimizer.runtimeFilter.*`) but does not register them as
 * public functions; constructing them directly through the bridge keeps
 * the codegen'd fast path without a UDF.
 */
object Blooms {

  /** Aggregate a LONG key column into a serialized Bloom filter
   * (distributed agg; only the final ~numBits/8 bytes reach the
   * driver). Returns null when `items` is empty — callers treat that as
   * "prune everything". */
  def build(items: DataFrame, h: Column,
            expectedItems: Long, numBits: Long): Array[Byte] =
    items.select(ColumnBridge.column(
        new BloomFilterAggregate(ColumnBridge.expression(h),
          Literal(expectedItems), Literal(numBits)).toAggregateExpression())
        .as("bf"))
      .head().getAs[Array[Byte]]("bf")

  /** Membership probe against a built filter, embedded as a plan
   * literal (the "broadcast" — every task reads the same constant). */
  def mightContain(bloom: Array[Byte], h: Column): Column =
    ColumnBridge.column(new BloomFilterMightContain(
      Literal(bloom, BinaryType), ColumnBridge.expression(h)))
}
