package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ml.Similarity

/**
 * Codebook-size ladder for PQ encode (the corpus-side pass of e6/e7):
 * times encoding a SF dir's embeddings at a list of codes-per-subspace
 * values. Production PQ uses 256 codewords (one byte per code); the
 * gate's fixture uses 16 — this probe prices the gap and guards the
 * encode path against the literal-explosion cliff IvfRankCells fixed
 * for the IVF quantizer.
 *
 * Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.tools.PqLadder 16 64 256
 */
object PqLadder {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val codesList = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(16, 64, 256)
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
    codesList.foreach { codes =>
      val books = Similarity.pqCodebooks(8, 8, codes)
      val cns = Similarity.pqCellNorms(books)
      val secs = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        Similarity.pqEncode(emb, "id", books, cns).agg(sum(element_at(col("codes"), 1))).head()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"""{"probe":"pq_ladder","sf":"$dir","rows":$n,"codes":$codes,"sec":${secs.min}%.3f}""")
    }
    spark.stop()
  }
}
