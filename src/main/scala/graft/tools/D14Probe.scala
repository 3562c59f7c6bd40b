package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ml.Similarity
import graft.text.{Dedup, TextAnalysis}

/** Scratch diagnosis for d14b: bucket-size distribution of hyperplane
 * LSH over hashed text embeddings, raw vs mean-centered, across plane
 * counts. */
object D14Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/scaledata/sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id").as("id"),
        TextAnalysis.hashedEmbedding(
          Dedup.tokens(lower(col("text"))), 64).as("vec"))
      .cache()
    val n = emb.count()
    // corpus mean per component (exact decimal)
    val mean = emb.select(
      array((0 until 64).map(i =>
        sum(element_at(col("vec"), i + 1).cast("decimal(27,12)"))): _*).as("s"))
      .collect()(0).getSeq[java.math.BigDecimal](0)
      .map(_.doubleValue / n)
    val centered = emb.select(col("id"),
      zip_with(col("vec").cast("array<double>"),
        typedLit(mean.toSeq), (a, b) => a - b).as("vec"))
    for (nP <- Seq(8, 12, 16, 20)) {
      val planes = Similarity.hyperplanes(nP, 64)
      def stats(df: org.apache.spark.sql.DataFrame, tag: String): Unit = {
        val sizes = df.select(Similarity.lshBucket(col("vec"), planes).as("b"))
          .groupBy("b").count().select("count").collect().map(_.getLong(0))
        val pairs = sizes.map(s => s * (s - 1) / 2).sum
        println(s"$tag nP=$nP buckets=${sizes.length} " +
          s"max=${sizes.max} pairs=$pairs")
      }
      stats(emb, "raw     ")
      stats(centered, "centered")
    }
    spark.stop()
  }
}
