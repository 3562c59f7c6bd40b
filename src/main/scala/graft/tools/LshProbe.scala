package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ml.Similarity
object LshProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "target/scaledata/sf0.5")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    Seq(8, 16, 32).foreach { np =>
      val planes = Similarity.hyperplanes(np, 64)
      val secs = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        emb.select(Similarity.lshBucket(col("vec"), planes).as("b"))
          .agg(sum(col("b"))).head()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"""{"probe":"lsh","planes":$np,"sec":${secs.min}%.3f}""")
    }
    spark.stop()
  }
}
