package graft.ml

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/**
 * Typed `Aggregator` UDAF: element-wise mean of embedding vectors — the
 * class-centroid computation of a training pipeline (per-label average
 * embedding, cluster centers for IVF training, etc.).
 *
 * Why an Aggregator and not explode+groupBy(pos)+avg: the explode path
 * shuffles one row per (vector, dimension) — 64x the data; this UDAF
 * shuffles one 64-float buffer per key per map task (partial
 * aggregation), the same shape as any built-in agg.
 */
object VectorAgg {

  /** Ragged inputs would silently drop the longer vector's tail (or walk
   * off the buffer) — a wrong sum must be a loud failure instead. */
  private def requireSameLength(have: Int, got: Int): Unit =
    if (have != got) throw new IllegalArgumentException(
      s"vector aggregate over ragged lengths: buffer has $have dims, row has $got")

  final case class AvgBuffer(sums: Array[Double], n: Long)

  val vectorAvg: Aggregator[Seq[Float], AvgBuffer, Seq[Double]] =
    new Aggregator[Seq[Float], AvgBuffer, Seq[Double]] {
      override def zero: AvgBuffer = AvgBuffer(Array.empty, 0L)
      override def reduce(b: AvgBuffer, v: Seq[Float]): AvgBuffer = {
        require(v != null, // loud-failure policy: name the bad input,
          "vectorAvg: NULL vector input — filter nulls before aggregating")
        val s = if (b.sums.isEmpty) new Array[Double](v.length) else b.sums
        requireSameLength(s.length, v.length)
        var i = 0
        while (i < v.length) { s(i) += v(i); i += 1 }
        AvgBuffer(s, b.n + 1)
      }
      override def merge(a: AvgBuffer, b: AvgBuffer): AvgBuffer =
        if (a.sums.isEmpty) b
        else if (b.sums.isEmpty) a
        else {
          requireSameLength(a.sums.length, b.sums.length)
          var i = 0
          while (i < a.sums.length) { a.sums(i) += b.sums(i); i += 1 }
          AvgBuffer(a.sums, a.n + b.n)
        }
      override def finish(b: AvgBuffer): Seq[Double] =
        if (b.n == 0) Seq.empty else b.sums.toSeq.map(_ / b.n)
      override def bufferEncoder: Encoder[AvgBuffer] = Encoders.product[AvgBuffer]
      override def outputEncoder: Encoder[Seq[Double]] =
        org.apache.spark.sql.catalyst.encoders.AgnosticEncoders.IterableEncoder(
          scala.reflect.classTag[Seq[Double]],
          org.apache.spark.sql.catalyst.encoders.AgnosticEncoders.PrimitiveDoubleEncoder,
          containsNull = false, lenientSerialization = false)
    }

  /** Column form: `df.groupBy("label").agg(vectorAvgCol(col("embedding")))`. */
  def vectorAvgCol(c: Column): Column = udaf(vectorAvg).apply(c)

  final case class SumBuffer(sums: Array[Long])

  /** Element-wise LONG sum of int vectors (quantized embeddings) — same
   * partial-aggregation shape as [[vectorAvg]], but integer addition is
   * associative, so the result is independent of partitioning and
   * engine-exact against an oracle (the float mean above is not — it is
   * spec-tested instead). */
  val vectorSumLong: Aggregator[Seq[Int], SumBuffer, Seq[Long]] =
    new Aggregator[Seq[Int], SumBuffer, Seq[Long]] {
      override def zero: SumBuffer = SumBuffer(Array.empty)
      override def reduce(b: SumBuffer, v: Seq[Int]): SumBuffer = {
        require(v != null, // loud-failure policy: name the bad input
          "vectorSumLong: NULL vector input — filter nulls before aggregating")
        val s = if (b.sums.isEmpty) new Array[Long](v.length) else b.sums
        requireSameLength(s.length, v.length)
        var i = 0
        while (i < v.length) { s(i) += v(i); i += 1 }
        SumBuffer(s)
      }
      override def merge(a: SumBuffer, b: SumBuffer): SumBuffer =
        if (a.sums.isEmpty) b
        else if (b.sums.isEmpty) a
        else {
          requireSameLength(a.sums.length, b.sums.length)
          var i = 0
          while (i < a.sums.length) { a.sums(i) += b.sums(i); i += 1 }
          a
        }
      override def finish(b: SumBuffer): Seq[Long] = b.sums.toSeq
      override def bufferEncoder: Encoder[SumBuffer] = Encoders.product[SumBuffer]
      override def outputEncoder: Encoder[Seq[Long]] =
        org.apache.spark.sql.catalyst.encoders.AgnosticEncoders.IterableEncoder(
          scala.reflect.classTag[Seq[Long]],
          org.apache.spark.sql.catalyst.encoders.AgnosticEncoders.PrimitiveLongEncoder,
          containsNull = false, lenientSerialization = false)
    }

  def vectorSumCol(c: Column): Column = udaf(vectorSumLong).apply(c)
}
