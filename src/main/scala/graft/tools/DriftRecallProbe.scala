package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ml.Similarity

/**
 * The r14 REINDEX-recall probe: does retraining (e33's cutover) beat
 * the surgical verbs (e18 split) at ISO-CELL-BUDGET once admission has
 * genuinely DRIFTED the corpus — not merely skewed it?
 *
 * r13's probe admitted held-out vectors into the hottest trained cell:
 * occupancy skew, but the admitted vectors still lay inside the base
 * distribution, so retraining landed on the same recall frontier as
 * splitting (an honest tie, kept as a watch item). Here the admitted
 * waves are DISPLACED: wave w adds held-out vectors shifted by
 * w·step along the hot centroid's direction — four progressively
 * drifted cluster means the frozen quantizer funnels into a few cells
 * (the "crawl source changes over months" shape). The drift magnitude
 * is quantified (mean distance of each wave's vectors to the nearest
 * BASE centroid, vs the base corpus's own mean) so a negative result
 * would be interpretable too.
 *
 * Frontier points: recall@topk (IVF candidate-level, exact cosine
 * within probed cells vs brute-force ground truth) and mean probed
 * occupancy (the Σ|probed cells| that bounds search I/O) at nprobe
 * 1/2/4, measured for (a) the frozen base table, (b) 3 surgical
 * splits of the fullest cell (19 cells), (c) REINDEX retrained on the
 * full drifted corpus at the SAME 19 cells. Output: one JSON object,
 * archived as bench/lifecycle_recall_r14.json.
 */
object DriftRecallProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val step = if (args.length > 1) args(1).toDouble else 0.6
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val Dim = 64; val NCells = 16; val TopK = 10; val Waves = 4
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val base = emb.filter(col("id") < 400).cache()
    val cents0 = Similarity.trainIvfCentroids(base, NCells, Dim, iters = 5)

    def occupancy(corpus: DataFrame, cents: Seq[Seq[Double]]): Map[Int, Long] =
      corpus.select(Similarity.ivfAssignD(col("vec"), cents).as("cell"))
        .groupBy("cell").count().collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap

    val occBase = occupancy(base, cents0)
    val hot = (0 until NCells).maxBy(j => (occBase.getOrElse(j, 0L), -j.toLong))
    // the drift direction: the hot centroid's unit vector — admitted
    // waves march outward along the densest region's axis
    val hotC = cents0(hot)
    val norm = math.sqrt(hotC.map(x => x * x).sum) max 1e-12
    val u = hotC.map(_ / norm)

    // wave w (1-based): held-out slice pmod Waves == w-1, every vector
    // displaced by w*step along u — four progressively shifted means
    def shifted(w: Int): DataFrame = {
      val delta = u.map(x => (x * step * w).toFloat)
      emb.filter(col("id") >= 400 && pmod(col("id"), lit(Waves)) === (w - 1))
        .select(col("id"),
          zip_with(col("vec"), typedlit(delta), (a, b) => a + b).as("vec"))
    }
    val waves = (1 to Waves).map(shifted)
    val corpus = waves.foldLeft(base)(_ unionByName _).cache()
    val nCorpus = corpus.count()

    // drift magnitude: mean distance to the nearest BASE centroid, per
    // wave, vs the base corpus's own mean — the number that makes a
    // negative result interpretable
    def meanNearestDist(df: DataFrame): Double = {
      val d2 = (0 until NCells).map { j =>
        val c = cents0(j).map(_.toFloat)
        aggregate(zip_with(col("vec"), typedlit(c),
            (a, b) => (a - b) * (a - b)),
          lit(0.0), (acc, x) => acc + x.cast("double"))
      }.reduce((a, b) => least(a, b))
      df.select(sqrt(d2).as("d")).agg(avg("d")).head().getDouble(0)
    }
    val baseDist = meanNearestDist(base)
    val waveDists = waves.map(meanNearestDist)

    // queries: 20 base members + 5 from each wave
    val qIds = (base.select("id").orderBy("id").limit(20).collect().map(_.getLong(0)) ++
      (1 to Waves).flatMap(w => waves(w - 1).select("id").orderBy("id")
        .limit(5).collect().map(_.getLong(0)))).toSeq
    val queries = corpus.filter(col("id").isin(qIds: _*)).cache()
    val exact = Similarity.bruteForceTopK(queries, corpus, TopK)
      .select("query_id", "neighbor_id").cache()
    exact.count()

    def point(cents: Seq[Seq[Double]], np: Int): (Double, Double) = {
      val approx = Similarity.ivfTopKWith(queries, corpus, TopK, cents, np)
        .select(col("query_id"), col("neighbor_id"), lit(1).as("hit"))
      val recall = exact.join(approx, Seq("query_id", "neighbor_id"), "left")
        .agg(count(col("hit")).cast("double") / count(lit(1))).head().getDouble(0)
      val occ = occupancy(corpus, cents)
      val probeRows = queries
        .select(col("id"), Similarity.ivfProbesD(col("vec"), cents, np).as("p"))
        .collect()
      val cost = probeRows.map(_.getSeq[Int](1).map(c =>
        occ.getOrElse(c, 0L)).sum.toDouble).sum / probeRows.length
      (recall, cost)
    }
    val probes = Seq(1, 2, 4, 8)
    def sweep(cents: Seq[Seq[Double]]): String = probes.map { np =>
      val (r, c) = point(cents, np)
      f""""nprobe$np": {"recall": $r%.3f, "mean_candidates": $c%.1f}"""
    }.mkString("{", ", ", "}")

    def splitOnce(cents: Seq[Seq[Double]]): Seq[Seq[Double]] = {
      val occ = occupancy(corpus, cents)
      val c = cents.indices.maxBy(j => (occ.getOrElse(j, 0L), -j.toLong))
      val subs = Similarity.trainIvfCentroids(
        corpus.filter(Similarity.ivfAssignD(col("vec"), cents) === c),
        nCells = 2, dim = Dim, iters = 3)
      cents.updated(c, subs(0)) :+ subs(1)
    }
    val cents3 = splitOnce(splitOnce(splitOnce(cents0)))
    // two retrains at the split table's cell budget: the synthetic-grid
    // init (what the frozen table trained from) vs the corpus-stride
    // seeding a production reindex uses — a drifted corpus's mass only
    // attracts centroids the init actually reaches
    val centsReGrid = Similarity.trainIvfCentroids(corpus, cents3.size,
      Dim, iters = 5)
    val centsRe = Similarity.trainIvfCentroidsFrom(corpus,
      Similarity.strideSeeds(corpus, cents3.size), Dim, iters = 5)

    val occ0 = occupancy(corpus, cents0)
    val occ3 = occupancy(corpus, cents3)
    val occReG = occupancy(corpus, centsReGrid)
    val occRe = occupancy(corpus, centsRe)
    def fmt(d: Double) = f"$d%.3f"
    println(s"""{
      |"probe": "graft.tools.DriftRecallProbe",
      |"dir": "$dir", "corpus": $nCorpus, "drift_step": $step,
      |"drift": {"base_mean_nearest_centroid_dist": ${fmt(baseDist)},
      |  "wave_mean_nearest_centroid_dist": [${waveDists.map(fmt).mkString(", ")}]},
      |"skew": {"hot_cell": $hot,
      |  "frozen_max_occ": ${occ0.values.max},
      |  "split3_max_occ": ${occ3.values.max},
      |  "reindex_grid_init_max_occ": ${occReG.values.max},
      |  "reindex_stride_init_max_occ": ${occRe.values.max}},
      |"frozen_base_table": ${sweep(cents0)},
      |"split3_table_${cents3.size}_cells": ${sweep(cents3)},
      |"reindex_grid_init_${centsReGrid.size}_cells": ${sweep(centsReGrid)},
      |"reindex_stride_init_${centsRe.size}_cells": ${sweep(centsRe)}
      |}""".stripMargin.replace("\n", " "))
    spark.stop()
  }
}
