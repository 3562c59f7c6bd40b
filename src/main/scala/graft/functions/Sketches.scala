package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/**
 * X20 — KMV (k-minimum-values) distinct-count sketch, the bottom-k /
 * Theta-sketch family (Bar-Yossef et al. 2002, "Counting distinct
 * elements in a data stream"): keep the k smallest DISTINCT 60-bit
 * hashes of a group's values. If fewer than k distinct hashes exist
 * the count is exact; otherwise the k-th smallest hash h₍ₖ₎ estimates
 * the cardinality as (k−1)·2⁶⁰ / h₍ₖ₎ (k−1 points uniformly spread
 * below h₍ₖ₎ over a 2⁶⁰ domain).
 *
 * Shape at 100 TB: a typed Aggregator whose buffer is a bounded sorted
 * array — partial aggregation keeps ≤ k longs per (group, map task)
 * and merge is a bounded sorted-array union, so the shuffle carries
 * sketch partials, never the distinct-value set. The
 * distinct+window formulation would shuffle EVERY distinct hash; this
 * is the [[graft.ml.VectorAgg]] bounded-partials pattern applied to
 * cardinality estimation. Sketches for different groups/days/sources
 * merge losslessly (the union IS the merge), which is what makes the
 * estimator incremental across ingestion batches.
 *
 * Determinism: the hash domain is the dedup family's md5-derived
 * [[Hashing.h60]], which DuckDB computes bit-identically; the estimate
 * is one exact-product literal divided by one long→double cast, both
 * correctly-rounded IEEE ops — so even the ESTIMATE hash-matches the
 * oracle.
 */
object Sketches {

  /** Sorted ascending, distinct, length ≤ k. */
  final case class KmvBuffer(mins: Array[Long])

  private def insert(arr: Array[Long], h: Long, k: Int): Array[Long] = {
    val i = java.util.Arrays.binarySearch(arr, h)
    if (i >= 0) arr // already present: set semantics
    else {
      val ins = -i - 1
      if (ins >= k) arr // larger than the current k-th minimum
      else {
        val n = math.min(arr.length + 1, k)
        val out = new Array[Long](n)
        System.arraycopy(arr, 0, out, 0, ins)
        out(ins) = h
        System.arraycopy(arr, ins, out, ins + 1, n - ins - 1)
        out
      }
    }
  }

  private def union(a: Array[Long], b: Array[Long], k: Int): Array[Long] = {
    val out = new Array[Long](math.min(a.length + b.length, k))
    var (i, j, n) = (0, 0, 0)
    while (n < out.length && (i < a.length || j < b.length)) {
      val takeA = j >= b.length || (i < a.length && a(i) <= b(j))
      val v = if (takeA) a(i) else b(j)
      if (takeA) i += 1 else j += 1
      if (n == 0 || out(n - 1) != v) { out(n) = v; n += 1 }
    }
    if (n == out.length) out else java.util.Arrays.copyOf(out, n)
  }

  def kmv(k: Int): Aggregator[Long, KmvBuffer, KmvBuffer] = {
    require(k >= 2, s"kmv needs k >= 2, got $k")
    new Aggregator[Long, KmvBuffer, KmvBuffer] {
      override def zero: KmvBuffer = KmvBuffer(Array.empty)
      override def reduce(b: KmvBuffer, h: Long): KmvBuffer =
        KmvBuffer(insert(b.mins, h, k))
      override def merge(a: KmvBuffer, b: KmvBuffer): KmvBuffer =
        KmvBuffer(union(a.mins, b.mins, k))
      override def finish(b: KmvBuffer): KmvBuffer = b
      override def bufferEncoder: Encoder[KmvBuffer] = Encoders.product[KmvBuffer]
      override def outputEncoder: Encoder[KmvBuffer] = Encoders.product[KmvBuffer]
    }
  }

  /** Column form over a LONG hash column:
   * `df.groupBy(g).agg(kmvCol(h, 64).as("sk"))` → struct(mins). */
  def kmvCol(hash: Column, k: Int): Column =
    udaf(kmv(k), Encoders.scalaLong).apply(hash)

  /** 2⁶⁰ as an exact double — the hash domain size of [[Hashing.h60]]. */
  val Domain60: Double = 1152921504606846976.0d

  /** Cardinality estimate from a sketch struct: exact size when the
   * buffer never filled, else (k−1)·2⁶⁰ / h₍ₖ₎. The multiplication is
   * a driver-side exact product (≤ 11 significant bits × 2⁶⁰), so the
   * runtime does ONE division — reproducible in any engine. */
  def kmvEstimate(sketch: Column, k: Int): Column = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.DoubleType
    val m = size(sketch.getField("mins"))
    val hk = element_at(sketch.getField("mins"), m)
    when(m < k, m.cast(DoubleType))
      .otherwise(lit((k - 1).toDouble * Domain60) / hk.cast(DoubleType))
  }
}
