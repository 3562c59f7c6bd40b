package graft

import org.apache.spark.sql.functions._

import graft.functions.{Hashing, Sketches}

/** KMV bottom-k sketch: buffer invariants, lossless mergeability, the
  * exact-below-k contract, and estimate quality on a real hash domain. */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private val k = 16
  private val agg = Sketches.kmv(k)

  private def sketchOf(vs: Seq[Long]) =
    vs.foldLeft(agg.zero)((b, v) => agg.reduce(b, v))

  test("buffer stays sorted, distinct, and bounded by k") {
    val vs = Seq.tabulate(500)(i => Hashing.h60(s"v$i")) ++
      Seq.tabulate(100)(i => Hashing.h60(s"v$i")) // duplicates
    val b = sketchOf(vs)
    assert(b.mins.length == k)
    assert(b.mins.toSeq == b.mins.toSeq.distinct.sorted)
    assert(b.mins.toSeq == vs.distinct.sorted.take(k))
  }

  test("merge is the sketch of the union (lossless mergeability)") {
    val (l, r) = Seq.tabulate(300)(i => Hashing.h60(s"u$i")).splitAt(120)
    val merged = agg.merge(sketchOf(l), sketchOf(r ++ l.take(30)))
    assert(merged.mins.toSeq == sketchOf(l ++ r).mins.toSeq)
  }

  test("below k distinct values the count is exact; above, estimate lands near truth") {
    val small = Seq("a", "b", "c", "a").map(Hashing.h60)
    assert(sketchOf(small).mins.length == 3) // exact m, never filled
    val n = 5000
    val big = sketchOf(Seq.tabulate(n)(i => Hashing.h60(s"tok$i")))
    val est = (k - 1).toDouble * Sketches.Domain60 / big.mins.last
    // stderr ~ 1/sqrt(k-2) ~ 27% at k=16; the fixed hash set is
    // deterministic, so this is a regression pin, not a flaky bound
    assert(math.abs(est - n) / n < 0.5, s"estimate $est vs true $n")
  }

  test("grouped aggregation matches a driver-side fold of the same hashes") {
    val df = Seq.tabulate(400)(i => (s"g${i % 3}", s"w${i % 57}"))
      .toDF("g", "w")
      .select(col("g"), Hashing.h60(col("w")).as("h"))
    val got = df.groupBy("g").agg(Sketches.kmvCol(col("h"), k).as("sk"))
      .select(col("g"), col("sk.mins")).as[(String, Seq[Long])]
      .collect().toMap
    val want = Seq.tabulate(400)(i => (s"g${i % 3}", Hashing.h60(s"w${i % 57}")))
      .groupBy(_._1).map { case (g, vs) => g -> sketchOf(vs.map(_._2)).mins.toSeq }
    assert(got == want)
  }
}
