package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ml.Similarity

/**
 * ANN recall at the PRODUCTION cell dial: e13/e13b sweep recall over
 * the gate fixture's 16 cells; this probe re-measures recall@10 with
 * the √n-scaled trained centroids the e9c/d10b gates run (more cells =
 * smaller scanned fraction per probe, so recall must be re-established
 * at the production dial, not assumed from the fixture's). Prints one
 * JSON line per (nprobe, assign) grid point.
 *
 * Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.tools.RecallProbe
 */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val n = emb.count()
    val k = 10
    val q = emb.filter(col("id") < 20)
    val exact = Similarity.bruteForceTopK(q, emb, k)
      .select(col("query_id"), col("neighbor_id"))
    val cents = graft.LlmQueries.trainedCentsScaled(spark, dir)
    for (np <- Seq(2, 4, 8); a <- Seq(1, 3)) {
      val approx = Similarity.ivfTopKMulti(q, emb, k, cents, np, a)
        .select(col("query_id"), col("neighbor_id"), lit(1).as("hit"))
      val recall = exact.join(approx, Seq("query_id", "neighbor_id"), "left")
        .agg((count(col("hit")).cast("double") / count(lit(1))).as("r"))
        .head().getDouble(0)
      println(f"""{"probe":"recall_scaled","sf":"$dir","rows":$n,"nCells":${cents.size},"nprobe":$np,"assign":$a,"recall_at_$k":$recall%.3f}""")
    }
    spark.stop()
  }
}
