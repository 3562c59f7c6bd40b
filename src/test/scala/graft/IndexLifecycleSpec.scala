package graft

import org.apache.spark.sql.functions._
import graft.ml.Similarity

/** The index lifecycle's deletion/compaction half (e17): logical
  * tombstone deletion, physical compaction, and serve-time bucket
  * pruning over the persisted index table. The build/admit half is
  * gated by e14/e16; here we pin the three facts the gate's oracle
  * can't see — compaction equivalence, physical removal, and the
  * scan-level I/O claim (a probe reads only its buckets). */
class IndexLifecycleSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = (0 until 240).map { i =>
    val a = Array.fill(8)(0.0f)
    a(i % 8) = 1.0f; a((i + 3) % 8) = 0.01f * (i % 37)
    (i.toLong, a)
  }.toDF("id", "vec")

  private val cents = Similarity.ivfCentroids(4, 8).map(_.map(_.toDouble))
  private val books = Similarity.pqCodebooks(2, 4, 4)

  test("logical delete == compacted == rebuilt-without-deleted; tombstones physically gone") {
    val vecs = corpus
    val tombs = vecs.filter(col("id") % 5 === 2).select("id")
    val index = Similarity.ivfPqIndex(vecs, books, cents)
    val live = Similarity.ivfPqDelete(index, tombs)

    // compaction: the same frame written back over storage, read back
    val dir = "target/tmp/idx_lifecycle_compact"
    graft.util.Fs.deleteRecursive(java.nio.file.Paths.get(dir))
    live.write.mode("overwrite").parquet(dir)
    val compacted = spark.read.parquet(dir)

    // rebuilt form: index derived from only the surviving corpus
    val rebuilt = Similarity.ivfPqIndex(
      vecs.join(tombs, Seq("id"), "left_anti"), books, cents)

    def serve(idx: org.apache.spark.sql.DataFrame) =
      Similarity.ivfPqSearchIndex(vecs.filter(col("id") < 4), idx, 5,
        books, cents, 2)
        .select("query_id", "rank", "neighbor_id")
        .orderBy("query_id", "rank").collect().toSeq

    val logical = serve(live)
    assert(logical == serve(compacted), "compacted serve drifted from logical")
    assert(logical == serve(rebuilt), "logical delete drifted from rebuild")

    // physical removal: no tombstoned id survives in the compacted files
    assert(compacted.join(tombs, "id").count() == 0)
    // and nothing else was lost
    assert(compacted.count() == vecs.count() - tombs.count())
  }

  test("takedown-sized tombstone delete plans as a broadcast anti-join") {
    // the 100 TB claim: the tombstone side is 8-byte ids, so a
    // takedown-sized list broadcasts — the index side never shuffles
    val index = Similarity.ivfPqIndex(corpus, books, cents)
    val tombs = corpus.filter(col("id") < 5).select("id")
    val plan = Similarity.ivfPqDelete(index, tombs)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"small tombstone set should broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"delete must not sort-merge on a broadcastable tombstone list:\n$plan")
  }

  test("cell split is surgical: only the split cell's members move, everything else is untouched") {
    val vecs = corpus
    val index = Similarity.ivfPqIndex(vecs, books, cents)
    val occupancy = index.groupBy("cell").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val c = (0 until cents.size).maxBy(j => (occupancy.getOrElse(j, 0L), -j.toLong))
    val subs = Similarity.trainIvfCentroids(
      vecs.filter(Similarity.ivfAssignD(col("vec"), cents) === c),
      nCells = 2, dim = 8, iters = 3)
    val updated = Similarity.ivfPqSplit(index, vecs, c, subs,
      newCell = cents.size)

    assert(updated.count() == index.count(), "split lost or duplicated entries")
    // non-members keep their exact rows
    val drifted = updated.as("u").join(index.as("i"), "id")
      .filter(col("i.cell") =!= c)
      .filter(col("u.cell") =!= col("i.cell") || col("u.codes") =!= col("i.codes"))
    assert(drifted.count() == 0, "a non-member entry changed")
    // members land only in the two sub-cells, and both semantics agree
    val landed = updated.join(index.filter(col("cell") === c).select("id"), "id")
      .select("cell").distinct().collect().map(_.getInt(0)).toSet
    assert(landed.subsetOf(Set(c, cents.size)))
    // the hot spot shrank: members distribute across BOTH sub-cells
    val subSizes = updated.filter(col("cell").isin(c, cents.size))
      .groupBy("cell").count().collect().map(_.getLong(1))
    assert(subSizes.sum == occupancy(c))
    assert(subSizes.length == 2 && subSizes.max < occupancy(c),
      s"2-means split degenerated: ${subSizes.toSeq} vs ${occupancy(c)}")
  }

  test("residual index keeps the lifecycle contract: admit == rebuild, delete composes") {
    // ivfPqResidualIndex entries are row-local functions of (vector,
    // frozen constants) exactly like the raw index, so ivfPqAdmit's
    // union-equivalence and ivfPqDelete's anti-join carry over verbatim
    val vecs = corpus
    val resBooks = Similarity.trainResidualBooks(vecs, 2, 4, 4, cents,
      iters = 2, sampleMod = 4)
    val a = vecs.filter(col("id") < 150)
    val b = vecs.filter(col("id") >= 150)
    val admitted = Similarity.ivfPqResidualIndex(a, resBooks, cents)
      .unionByName(Similarity.ivfPqResidualIndex(b, resBooks, cents))
    val rebuilt = Similarity.ivfPqResidualIndex(vecs, resBooks, cents)
    assert(admitted.exceptAll(rebuilt).count() == 0 &&
           rebuilt.exceptAll(admitted).count() == 0,
      "residual admit drifted from rebuild")
    val tombs = vecs.filter(col("id") % 5 === 2).select("id")
    val live = Similarity.ivfPqDelete(rebuilt, tombs)
    assert(live.count() == vecs.count() - tombs.count())
    assert(live.join(tombs, "id").count() == 0)
  }

  test("residual split re-encodes moved members; equals an independent rebuild under the subs") {
    val vecs = corpus
    val resBooks = Similarity.trainResidualBooks(vecs, 2, 4, 4, cents,
      iters = 2, sampleMod = 4)
    val occupancy = Similarity.ivfPqResidualIndex(vecs, resBooks, cents)
      .groupBy("cell").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val c = (0 until cents.size).maxBy(j => (occupancy.getOrElse(j, 0L), -j.toLong))
    val subs = Similarity.trainIvfCentroids(
      vecs.filter(Similarity.ivfAssignD(col("vec"), cents) === c),
      nCells = 2, dim = 8, iters = 3)
    val resIndex = Similarity.ivfPqResidualIndex(vecs, resBooks, cents)
    val split = Similarity.ivfPqResidualSplit(resIndex, vecs, c, subs,
      newCell = cents.size, books = resBooks)

    assert(split.count() == resIndex.count())
    // non-members keep their exact rows (cell AND codes)
    val drifted = split.as("u").join(resIndex.as("i"), "id")
      .filter(col("i.cell") =!= c)
      .filter(col("u.cell") =!= col("i.cell") || col("u.codes") =!= col("i.codes"))
    assert(drifted.count() == 0, "a non-member entry changed")
    // the surgical path equals the build-from-scratch path: a fresh
    // residual index of ONLY the members under the 2-entry sub table,
    // with its 0/1 cells mapped onto (c, nCells)
    val memberVecs = vecs.join(
      resIndex.filter(col("cell") === c).select("id"), "id")
    val rebuilt = Similarity.ivfPqResidualIndex(memberVecs, resBooks, subs)
      .withColumn("cell",
        when(col("cell") === 0, lit(c)).otherwise(lit(cents.size)))
    val movedRows = split.join(memberVecs.select("id"), "id")
    assert(movedRows.exceptAll(rebuilt).count() == 0 &&
           rebuilt.exceptAll(movedRows).count() == 0,
      "surgical residual split drifted from the independent rebuild")
  }

  test("rerank stage fetches candidate vectors via broadcast, never a corpus shuffle") {
    // e20's scale claim: stage 2's exact-vector fetch must plan the
    // candidate frame (queries×n, behind a window agg that defeats the
    // static size estimate) as the BROADCAST side of the corpus join
    val vecs = corpus
    val books = Similarity.pqCodebooks(2, 4, 4)
    val plan = Similarity.ivfPqRerankTopK(
        vecs.filter(col("id") < 3), vecs, 5, 15, books, cents, 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"candidate fetch should broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"rerank must not shuffle the corpus vector table:\n$plan")
  }

  test("rerank from a prebuilt index table keeps the broadcast shape and cannot resurface deleted ids") {
    // e21's serving verb: candidates come ONLY from the (possibly
    // deleted-from) index table, and the exact-vector fetch stays a
    // broadcast probe of the candidate frame
    val vecs = corpus
    val index = Similarity.ivfPqDelete(
      Similarity.ivfPqIndex(vecs, books, cents),
      vecs.filter(col("id") % 5 === 2).select("id"))
    val served = Similarity.ivfPqRerankSearchIndex(
      vecs.filter(col("id") < 3), index, vecs, 5, 15, books, cents, 2)
    val plan = served.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"candidate fetch should broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"rerank must not shuffle the corpus vector table:\n$plan")
    // no tombstoned id can come back, even though the rerank joins the
    // FULL vector table for exact vectors
    assert(served.filter(col("neighbor_id") % 5 === 2).count() == 0,
      "a deleted id resurfaced through the rerank stage")
  }

  test("the composed journey equals its rebuild at unit scale, raw and residual") {
    // the e21/e23 invariant guarded cheaply: admit-then-split-then-
    // delete over a stored index is row-identical to split-then-delete
    // over a from-scratch rebuild — for the raw family (codes never
    // move) and the residual family (moved members re-encode)
    val vecs = corpus
    val occupancy = Similarity.ivfPqIndex(vecs, books, cents)
      .groupBy("cell").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val c = (0 until cents.size).maxBy(j => (occupancy.getOrElse(j, 0L), -j.toLong))
    val subs = Similarity.trainIvfCentroids(
      vecs.filter(Similarity.ivfAssignD(col("vec"), cents) === c),
      nCells = 2, dim = 8, iters = 3)
    val tombs = vecs.filter(col("id") % 5 === 2).select("id")

    def assertSame(a: org.apache.spark.sql.DataFrame,
                   b: org.apache.spark.sql.DataFrame, what: String): Unit =
      assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0,
        s"$what journey drifted from rebuild")

    val rawJourney = Similarity.ivfPqDelete(
      Similarity.ivfPqSplit(
        Similarity.ivfPqAdmit(
          Similarity.ivfPqIndex(vecs.filter(col("id") < 150), books, cents),
          vecs.filter(col("id") >= 150), books, cents),
        vecs, c, subs, newCell = cents.size),
      tombs)
    val rawRebuild = Similarity.ivfPqDelete(
      Similarity.ivfPqSplit(
        Similarity.ivfPqIndex(vecs, books, cents),
        vecs, c, subs, newCell = cents.size),
      tombs)
    assertSame(rawJourney, rawRebuild, "raw")

    val resBooks = Similarity.trainResidualBooks(vecs, 2, 4, 4, cents,
      iters = 2, sampleMod = 4)
    def resIdx(df: org.apache.spark.sql.DataFrame) =
      Similarity.ivfPqResidualIndex(df, resBooks, cents)
    val resJourney = Similarity.ivfPqDelete(
      Similarity.ivfPqResidualSplit(
        resIdx(vecs.filter(col("id") < 150))
          .unionByName(resIdx(vecs.filter(col("id") >= 150))),
        vecs, c, subs, newCell = cents.size, books = resBooks),
      tombs)
    val resRebuild = Similarity.ivfPqDelete(
      Similarity.ivfPqResidualSplit(resIdx(vecs),
        vecs, c, subs, newCell = cents.size, books = resBooks),
      tombs)
    assertSame(resJourney, resRebuild, "residual")

    // and serving the residual journey from the post-split table ranks
    // identically to serving the rebuild
    val newCents = cents.updated(c, subs(0)) :+ subs(1)
    def serveRes(i: org.apache.spark.sql.DataFrame) =
      Similarity.ivfPqResidualSearchIndex(vecs.filter(col("id") < 4), i, 5,
        resBooks, newCents, 2)
        .select("query_id", "rank", "neighbor_id")
        .orderBy("query_id", "rank").collect().toSeq
    assert(serveRes(resJourney) == serveRes(resRebuild))
  }

  test("probe over the bucketed index table prunes to its buckets at the scan") {
    Similarity.ivfPqIndex(corpus, books, cents)
      .write.mode("overwrite").bucketBy(8, "cell").saveAsTable("b_idx_prune")
    // without a join/agg in the plan the auto-bucketed-scan rule falls
    // back to a plain file scan, which silently forfeits bucket pruning
    // — a serving deployment keeps bucketed reads on for probe queries
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try {
      // a query's nprobe cells arrive as an IN-list on the bucket
      // column — the scan must select only those buckets' files, the
      // file-level form of "search I/O = nprobe/nCells of the index"
      val probed = spark.table("b_idx_prune")
        .filter(col("cell").isin(1, 3))
      val scan = probed.queryExecution.executedPlan.toString
      val sel = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
      sel.findFirstMatchIn(scan) match {
        case Some(m) =>
          assert(m.group(1).toInt < m.group(2).toInt,
            s"probe filter did not prune buckets:\n$scan")
        case None => fail(s"no bucket pruning in plan:\n$scan")
      }
      assert(probed.count() > 0)
    } finally {
      spark.conf.unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")
      spark.sql("DROP TABLE IF EXISTS b_idx_prune")
    }
  }
}
