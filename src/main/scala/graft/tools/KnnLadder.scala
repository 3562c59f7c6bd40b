package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ml.Similarity

/**
 * Scale-ladder probe for the k-NN graph (e9): times
 * [[Similarity.knnGraph]] over a SF dir's embeddings at a list of
 * nCells values, printing one JSON line per config.
 *
 * Why this exists: the round-7 ladder measured e9 at 5.8x wall for 5x
 * data with the gate's FIXED 16 test cells — expected, since candidate
 * pairs are sum_cells |cell| x |probes| = n^2 * nprobe / nCells, which
 * is quadratic in n when nCells is pinned. The production dial the
 * SURVEY's scale row promises is nCells growing with the corpus
 * (classically nCells ~ sqrt(n), balancing the O(n*nCells) assignment
 * scan against the O(n^2/nCells) pair generation). This probe measures
 * that dial so the claim is a recorded curve, not an assertion.
 *
 * Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.tools.KnnLadder 16 36 80
 */
object KnnLadder {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val cellArgs = args.filterNot(_.startsWith("--"))
    val cells = if (cellArgs.nonEmpty) cellArgs.map(_.toInt).toSeq else Seq(16, 36, 80)
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
    // --scaled: time the e9c gate path itself (trained centroids,
    // nCells ∝ √n) instead of the fixed-grid nCells sweep — min-of-2
    // reports steady state (training memoizes on the first run)
    if (args.contains("--scaled")) {
      val secs = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        graft.LlmQueries.knnGraphScaledQ(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"""{"probe":"knn_ladder_scaled","sf":"$dir","rows":$n,"sec":${secs.min}%.3f}""")
      spark.stop()
      return
    }
    cells.foreach { nc =>
      val cents = Similarity.ivfCentroids(nc, 64).map(_.map(_.toDouble))
      // min-of-2 runs, same convention as Bench
      val secs = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        Similarity.knnGraph(emb, k = 3, cents, nprobe = 2).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"""{"probe":"knn_ladder","sf":"$dir","rows":$n,"nCells":$nc,"sec":${secs.min}%.3f}""")
    }
    spark.stop()
  }
}
