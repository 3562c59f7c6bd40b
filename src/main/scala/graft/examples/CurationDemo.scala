package graft.examples

import org.apache.spark.sql.functions._

import graft.Graft
import graft.operators.CacheScope
import graft.text.{Dedup, TextAnalysis}

/**
 * End-to-end usage demo for the TRAINING-DATA side of the library — what
 * a pipeline author writes to curate a corpus: heuristic filtering
 * (Gopher rules + classifier head), exact + near dedup with cluster
 * representatives, temperature-balanced source mixing, and token-budget
 * sequence packing. Every operator here is the same public API the
 * oracle-checked queries drive.
 *
 * Run: `sbt "runMain graft.examples.CurationDemo [sfDir]"`.
 */
object CurationDemo {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = Graft.sessionBuilder("graft-curation-demo", Some(8))
      .master("local[8]").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text", "source")
    println(s"--- corpus: ${docs.count()} docs from $dir")

    // 1. heuristic quality filtering: Gopher rule battery + linear head
    val scored = docs
      .withColumn("_g", TextAnalysis.gopherRules(col("text"), minStopWords = 1))
      .withColumn("_logit",
        TextAnalysis.classifierLogit(TextAnalysis.qualityFeatures(col("text"))))
    val quality = scored.filter(col("_g.keep") && col("_logit") >= 0.0)
      .select("doc_id", "text", "source")
    println(s"--- after quality filters: ${quality.count()} docs")

    // 2. exact + near dedup: keep one representative per cluster
    val deduped = CacheScope.withScope { implicit scope =>
      val exact = Dedup.exactDedup(quality, "doc_id", "text").select("doc_id")
      val survivors = quality.join(exact, "doc_id")
      val cands = Dedup.minhashCandidates(survivors, "doc_id", "text")
        .select("ida", "idb")
      val verified = Dedup.jaccardVerify(cands, survivors, "doc_id", "text", k = 3)
        .filter(col("jaccard") >= 0.5).select("ida", "idb")
      val labels = Dedup.duplicateClusters(verified)
      survivors
        .join(labels, col("doc_id") === col("node"), "left")
        .filter(coalesce(col("label"), col("doc_id")) === col("doc_id"))
        .select("doc_id", "text", "source")
        .localCheckpoint()
    }
    println(s"--- after dedup (cluster representatives): ${deduped.count()} docs")

    // 3. temperature-balanced mixing across sources (alpha = 0.5)
    val counts = deduped.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    val quotas = TextAnalysis.temperatureQuotas(counts, target = deduped.count() / 2)
    val mixed = TextAnalysis.quotaSample(deduped, "source", "doc_id",
      quotas.map { case (s, _, q) => s -> q }.toMap)
    println(s"--- after temperature mix: ${mixed.count()} docs over ${quotas.size} sources")

    // 4. token-budget sequence packing (per contiguous id shard)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val packed = mixed
      .withColumn("n_tokens", TextAnalysis.tokenCountWs(col("text")).cast("long"))
      .withColumn("shard", floor(col("doc_id") / 100))
      .withColumn("seq_id",
        floor((sum(col("n_tokens")).over(w) - col("n_tokens")) / 256))
      .groupBy("shard", "seq_id")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("n_tokens"))
    println(s"--- packed into ${packed.count()} training sequences (budget 256 tokens):")
    packed.orderBy("shard", "seq_id").show(5, truncate = false)

    spark.stop()
  }
}
