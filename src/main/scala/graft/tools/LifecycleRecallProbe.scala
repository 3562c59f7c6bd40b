package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ml.Similarity

/**
 * Measures what e13b never does: the recall/cost point of an index
 * AFTER heavy admission has skewed its cell occupancy — the very
 * condition the e18 split verb exists to fix — and whether splitting
 * restores it. Skew is planted realistically without fabricating data:
 * the admitted batch is the slice of held-out corpus vectors that land
 * in the base quantizer's hottest cell (the "crawl suddenly ingests one
 * domain" shape), so that cell's occupancy explodes while the trained
 * centroids stay frozen. Recall is IVF candidate-level (exact cosine
 * within probed cells vs the brute-force ground truth — the cells are
 * what the split changes; PQ codes are orthogonal), and cost is the
 * per-query probed-occupancy sum, the Σ|probed cells| that bounds
 * search I/O. Output: one JSON object (archived as
 * bench/lifecycle_recall_r11.json).
 */
object LifecycleRecallProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val Dim = 64; val NCells = 16; val TopK = 10
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val base = emb.filter(col("id") < 400).cache()
    val cents0 = Similarity.trainIvfCentroids(base, NCells, Dim, iters = 5)

    def occupancy(corpus: DataFrame, cents: Seq[Seq[Double]]): Map[Int, Long] =
      corpus.select(Similarity.ivfAssignD(col("vec"), cents).as("cell"))
        .groupBy("cell").count().collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap

    // the skewed admission: held-out vectors that land in the hottest
    // base cell
    val occBase = occupancy(base, cents0)
    val hot = (0 until NCells).maxBy(j => (occBase.getOrElse(j, 0L), -j.toLong))
    val incoming = emb.filter(col("id") >= 400)
      .filter(Similarity.ivfAssignD(col("vec"), cents0) === hot)
    val corpus = base.unionByName(incoming).cache()
    val nCorpus = corpus.count()

    // queries: 20 pre-admission members + 20 admitted (hot-cell) members
    val qIds = (base.select("id").orderBy("id").limit(20).collect() ++
      incoming.select("id").orderBy("id").limit(20).collect())
      .map(_.getLong(0)).toSeq
    val queries = corpus.filter(col("id").isin(qIds: _*)).cache()

    val exact = Similarity.bruteForceTopK(queries, corpus, TopK)
      .select("query_id", "neighbor_id").cache()
    exact.count()

    def pointOver(crp: DataFrame, qs: DataFrame, gt: DataFrame,
                  cents: Seq[Seq[Double]], np: Int): (Double, Double) = {
      val approx = Similarity.ivfTopKWith(qs, crp, TopK, cents, np)
        .select(col("query_id"), col("neighbor_id"), lit(1).as("hit"))
      val recall = gt.join(approx, Seq("query_id", "neighbor_id"), "left")
        .agg(count(col("hit")).cast("double") / count(lit(1))).head().getDouble(0)
      val occ = occupancy(crp, cents)
      val probeRows = qs
        .select(col("id"), Similarity.ivfProbesD(col("vec"), cents, np).as("p"))
        .collect()
      val cost = probeRows.map(_.getSeq[Int](1).map(c =>
        occ.getOrElse(c, 0L)).sum.toDouble).sum / probeRows.length
      (recall, cost)
    }
    def point(cents: Seq[Seq[Double]], np: Int): (Double, Double) =
      pointOver(corpus, queries, exact, cents, np)

    // iterative surgical splits of the current fullest cell
    def splitOnce(cents: Seq[Seq[Double]]): Seq[Seq[Double]] = {
      val occ = occupancy(corpus, cents)
      val c = cents.indices.maxBy(j => (occ.getOrElse(j, 0L), -j.toLong))
      val subs = Similarity.trainIvfCentroids(
        corpus.filter(Similarity.ivfAssignD(col("vec"), cents) === c),
        nCells = 2, dim = Dim, iters = 3)
      cents.updated(c, subs(0)) :+ subs(1)
    }

    val probes = Seq(1, 2, 4)
    def sweep(cents: Seq[Seq[Double]]): String = probes.map { np =>
      val (r, c) = point(cents, np)
      f""""nprobe$np": {"recall": $r%.3f, "mean_candidates": $c%.1f}"""
    }.mkString("{", ", ", "}")

    val occ0 = occupancy(corpus, cents0)
    val pre = sweep(cents0)
    val cents1 = splitOnce(cents0)
    val cents3 = splitOnce(splitOnce(cents1))
    val occ3 = occupancy(corpus, cents3)
    val post1 = sweep(cents1)
    val post3 = sweep(cents3)

    // DELETION HOLES — the other drift source a long-lived index
    // accrues (r12 extension): a takedown tombstones 70% of the
    // admitted hot-cell rows (the "domain removed" shape — deletion is
    // never uniform), the tombstones compact away physically, and the
    // survivors serve under centroids trained BEFORE the delete. Ground
    // truth, queries and occupancy all re-derive over the survivor
    // corpus: the curve isolates what the frozen quantizer loses (or
    // doesn't) when cells it still probes have been hollowed out —
    // measured under both the pre-split table and the 3-split table the
    // journey would actually be serving by then.
    val tombs = incoming.filter(pmod(col("id"), lit(10)) < 7).select("id")
    val survivors = corpus.join(tombs, Seq("id"), "left_anti").cache()
    val nSurvivors = survivors.count()
    val qSurv = survivors.filter(col("id").isin(qIds: _*)).cache()
    val exactSurv = Similarity.bruteForceTopK(qSurv, survivors, TopK)
      .select("query_id", "neighbor_id").cache()
    exactSurv.count()
    def sweepSurv(cents: Seq[Seq[Double]]): String = probes.map { np =>
      val (r, c) = pointOver(survivors, qSurv, exactSurv, cents, np)
      f""""nprobe$np": {"recall": $r%.3f, "mean_candidates": $c%.1f}"""
    }.mkString("{", ", ", "}")
    val occDel = occupancy(survivors, cents3)
    val delPre = sweepSurv(cents0)
    val delPost3 = sweepSurv(cents3)

    // ... and the REMEDY (e26's verb): merge the two least-occupied
    // cells of the post-delete table, twice — does reclaiming the
    // hollowed slots move the iso-cost frontier back out?
    def mergeOnce(cents: Seq[Seq[Double]]): Seq[Seq[Double]] = {
      val occ = occupancy(survivors, cents)
      val Seq(a, b) = cents.indices
        .sortBy(j => (occ.getOrElse(j, 0L), j.toLong)).take(2).sorted
      val (na, nb) = (occ.getOrElse(a, 0L), occ.getOrElse(b, 0L))
      val m =
        if (na + nb == 0L) cents(a).zip(cents(b)).map(t => (t._1 + t._2) / 2.0)
        else cents(a).zip(cents(b)).map(t =>
          (na * t._1 + nb * t._2) / (na + nb).toDouble)
      cents.updated(a, m).patch(b, Nil, 1)
    }
    val centsMerged = mergeOnce(mergeOnce(cents3))
    val delMerged = sweepSurv(centsMerged)

    // ... and the RESET (e33's verb, the r13 extension): the surgical
    // verbs above only BEND the drifted frontier — they re-cut cells
    // under centroids still trained on the pre-admission slice. The
    // REINDEX retrains the quantizer on the surviving corpus itself
    // (exactly what IndexStore.cutover publishes) at the SAME cell
    // count as the split3 table, so the comparison is iso-cell-budget:
    // any frontier gap between `after_delete_split3_table` and this
    // curve is purely what retraining recovers.
    val centsReindex = Similarity.trainIvfCentroids(
      survivors, cents3.size, Dim, iters = 5)
    val occRe = occupancy(survivors, centsReindex)
    val delReindex = sweepSurv(centsReindex)

    println(s"""{
      |"probe": "graft.tools.LifecycleRecallProbe",
      |"dir": "$dir",
      |"corpus": $nCorpus,
      |"skew": {"hot_cell": $hot, "pre_admission_occ": ${occBase(hot)},
      |  "post_admission_max_occ": ${occ0.values.max},
      |  "post_admission_mean_nonempty_occ": ${f"${occ0.values.sum.toDouble / occ0.size}%.1f"},
      |  "after_3_splits_max_occ": ${occ3.values.max}},
      |"pre_split": $pre,
      |"after_1_split": $post1,
      |"after_3_splits": $post3,
      |"delete": {"survivors": $nSurvivors,
      |  "surviving_queries": ${qSurv.count()},
      |  "empty_cells_of_${cents3.size}_after_delete":
      |    ${cents3.indices.count(j => occDel.getOrElse(j, 0L) == 0L)},
      |  "after_delete_presplit_table": $delPre,
      |  "after_delete_split3_table": $delPost3,
      |  "after_delete_merge2_of_${centsMerged.size}_cells": $delMerged},
      |"reindex": {"cells": ${centsReindex.size},
      |  "max_occ": ${occRe.values.max},
      |  "empty_cells": ${centsReindex.indices.count(j => occRe.getOrElse(j, 0L) == 0L)},
      |  "after_delete_retrained_table": $delReindex}
      |}""".stripMargin.replace("\n", " "))
    spark.stop()
  }
}
