package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object X16Probe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "target/scaledata/sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .filter(length(col("text")) >= 2)
    val nDocs = docs.count()
    val totChars = docs.agg(sum(length(col("text")))).head().getLong(0)
    val counts = graft.text.TextAnalysis.bigramCounts(docs, "text")
    println(s"docs=$nDocs chars=$totChars distinctBigrams=${counts.count()}")
    val t0 = System.nanoTime()
    val perDoc = docs
      .select(col("doc_id"), (length(col("text")) - 1).as("_n"),
        explode(transform(sequence(lit(1), length(col("text")) - 1),
          i => substr(col("text"), i, lit(2)))).as("_b"))
      .groupBy(col("doc_id"), col("_n"), col("_b"))
      .agg(count(lit(1)).as("_cnt"))
    println(s"perDocRows=${perDoc.count()} explodeSec=${(System.nanoTime()-t0)/1e9}")
    val t1 = System.nanoTime()
    val full = graft.text.TextAnalysis.bigramLmScore(docs, "doc_id", "text", counts)
    println(s"fullRows=${full.count()} fullSec=${(System.nanoTime()-t1)/1e9}")
    spark.stop()
  }
}
