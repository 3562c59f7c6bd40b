package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.Hashing

/**
 * Similarity search over embedding columns (`array<float>`):
 *
 *  - brute-force cosine top-k — the exact baseline, O(N·Q); fine when Q
 *    is small or N fits a broadcast, the correctness reference otherwise;
 *  - random-hyperplane LSH ANN — the scale path: each vector hashes to a
 *    bucket (8 sign bits), search touches only the query's bucket. At
 *    100 TB the bucketing is a narrow map + one shuffle on (bucket),
 *    and recall/latency trade via nPlanes.
 *
 * Dot products fold left-to-right in double precision (`aggregate` over
 * `zip_with`), which the DuckDB oracle mirrors exactly — cosine scores
 * are bit-identical, so even float outputs hash-compare.
 */
object Similarity {

  /** Sequential double-precision dot product. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /**
   * Brute-force cosine top-k: for each query vector, the k nearest other
   * vectors. Ties break by neighbor id (deterministic).
   * `queries`/`corpus`: (id, vec). Broadcast the query side — the corpus
   * streams past it, one window per query partition ranks.
   */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = queries.select(col("id").as("query_id"), col("vec").as("qvec"))
    val c = corpus.select(col("id").as("neighbor_id"), col("vec").as("cvec"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qvec"), col("cvec")).as("sim"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Deterministic pseudo-random hyperplanes: component (j, d) =
   * (h60("plane_j_d") mod 2001) - 1000, literal-embedded in the plan and
   * reproducible in SQL. */
  def hyperplanes(nPlanes: Int, dim: Int): Seq[Seq[Long]] =
    (0 until nPlanes).map(j => (0 until dim).map(d =>
      Hashing.h60(s"plane_${j}_$d") % 2001 - 1000))

  /** LSH bucket id: sign bit of each hyperplane dot product. */
  def lshBucket(vec: Column, planes: Seq[Seq[Long]]): Column = {
    val bits = planes.zipWithIndex.map { case (w, j) =>
      val wLit = array(w.map(x => lit(x.toDouble)): _*)
      when(dot(wLit, vec) > 0, lit(1L << j)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /**
   * ANN via hyperplane LSH: queries search only their own bucket, then
   * rank by exact cosine. Same output shape as [[bruteForceTopK]]
   * (minus whatever true neighbors hash elsewhere — the recall trade).
   */
  def annTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              nPlanes: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dim = 64
    val planes = hyperplanes(nPlanes, dim)
    val q = queries.select(col("id").as("query_id"), col("vec").as("qvec"),
      lshBucket(col("vec"), planes).as("bucket"))
    val c = corpus.select(col("id").as("neighbor_id"), col("vec").as("cvec"),
      lshBucket(col("vec"), planes).as("bucket"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qvec"), col("cvec")).as("sim"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
