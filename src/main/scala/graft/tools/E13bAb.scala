package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType}

import graft.ml.Similarity
import graft.operators.CacheScope

/** r19 — the e13b shape A/B the r18 verdict demanded: the r18 rewrite
  * (12 corpus-side probe-join/rank passes → 3 scored joins + 12 window
  * filters) was bench-NEGATIVE at sf0.1 (0.91×, fixed per-job floors
  * dominate) and its asymptotic claim had no measurement at any SF.
  * This times OLD (per-(assign, nprobe) `ivfSearchMultiAssigned`
  * sweep, reconstructed verbatim from the pre-r18 source at 3a865ff)
  * vs NEW (`annRecallTrainedBuild`) as the COMPLETE gate body —
  * CacheScope.materialized + orderBy, consumed through the noop sink —
  * in alternating reps so ambient load decorrelates, and prints
  * min/median per shape plus a canary.
  *
  * Usage: runMain graft.tools.E13bAb [reps]
  *   SPARK_GRAFT_SF_DIR picks the data dir, SPARK_GRAFT_CPUS the cores.
  */
object E13bAb {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val topK = 10

    // the pre-r18 sweep body, verbatim shape (12 probe joins)
    def oldBuild(emb: DataFrame, q: DataFrame,
                 cents: Seq[Seq[Double]]): DataFrame =
      CacheScope.materialized { implicit scope =>
        val exact = scope.persist(Similarity.bruteForceTopK(q, emb, topK)
          .select("query_id", "neighbor_id")).toDF()
        (for (a <- graft.LlmQueries.RecallAssigns) yield {
          val assigned = scope.persist(
            Similarity.ivfMultiAssign(emb, cents, a)).toDF()
          (for (np <- graft.LlmQueries.RecallProbes) yield {
            val approx = Similarity
              .ivfSearchMultiAssigned(q, assigned, topK, cents, np)
              .select(col("query_id"), col("neighbor_id"), lit(1).as("hit"))
            exact.join(approx, Seq("query_id", "neighbor_id"), "left")
              .groupBy("query_id")
              .agg(count(col("hit")).as("_n"))
              .select(lit(np).as("nprobe"), lit(a).as("n_assign"),
                col("query_id"), lit(topK).as("k"),
                col("_n").cast(IntegerType).as("n_hit"),
                (col("_n").cast(DoubleType) / lit(topK.toDouble))
                  .as("recall_at_k"))
          }).reduce(_.unionByName(_))
        }).reduce(_.unionByName(_))
      }.orderBy("nprobe", "n_assign", "query_id")

    def newBuild(emb: DataFrame, q: DataFrame,
                 cents: Seq[Seq[Double]]): DataFrame =
      CacheScope.materialized { implicit scope =>
        graft.LlmQueries.annRecallTrainedBuild(emb, q, cents)
      }.orderBy("nprobe", "n_assign", "query_id")

    def canary(): Double = {
      val t0 = System.nanoTime()
      spark.range(0, 20000000L, 1, 32)
        .selectExpr("id % 1000 AS k", "hash(id) AS h")
        .groupBy("k").agg(sum("h")).agg(sum("sum(h)")).collect()
      (System.nanoTime() - t0) / 1e9
    }

    def time(build: () => DataFrame): Double = {
      val t0 = System.nanoTime()
      build().write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    // inputs (incl. the k-means training) resolve ONCE, outside the
    // timed region — both shapes consume the identical frames, and the
    // suite amortizes training the same way
    val (emb, q, cents) = graft.LlmQueries.annRecallTrainedInputs(spark, dir)
    emb.count() // pay parquet listing/footers before either side

    // warmup one rep each (codegen), then alternate timed reps
    canary()
    time(() => oldBuild(emb, q, cents))
    time(() => newBuild(emb, q, cents))
    val olds = scala.collection.mutable.ArrayBuffer[Double]()
    val news = scala.collection.mutable.ArrayBuffer[Double]()
    val cans = scala.collection.mutable.ArrayBuffer[Double]()
    (1 to reps).foreach { _ =>
      cans += canary()
      olds += time(() => oldBuild(emb, q, cents))
      news += time(() => newBuild(emb, q, cents))
    }
    def fmt(v: Double) = f"$v%.2f"
    println(s"""{"tool":"e13b_ab","dir":"$dir","cpus":$cpus,"reps":$reps,""" +
      s""""old_secs":[${olds.map(fmt).mkString(",")}],""" +
      s""""new_secs":[${news.map(fmt).mkString(",")}],""" +
      s""""old_min":${fmt(olds.min)},"new_min":${fmt(news.min)},""" +
      s""""speedup_min":${fmt(olds.min / news.min)},""" +
      s""""canaries":[${cans.map(fmt).mkString(",")}]}""")
    spark.stop()
  }
}
