package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Plan-shape assertions: the optimizations the engine RELIES on must
  * actually fire (pushdown, rank-limit pushdown, broadcast, top-k).
  * Guards against silent plan regressions across Spark upgrades. */
class PlanQualitySpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private def plan(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.executedPlan.toString

  test("incremental watermark predicate pushes into the parquet scan") {
    val df = spark.read.parquet(s"$dir/orders.parquet")
      .filter(col("o_orderkey") > 42).select("o_orderkey")
    assert(plan(df).contains("PushedFilters: [IsNotNull(o_orderkey), GreaterThan(o_orderkey,42)]"))
  }

  test("rank-only window + filter plans as WindowGroupLimit (heap top-k per key)") {
    val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc)
    val df = spark.read.parquet(s"$dir/orders.parquet")
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
    assert(plan(df).contains("WindowGroupLimit"))
  }

  test("global top-k plans as TakeOrderedAndProject, not a full sort") {
    val df = spark.read.parquet(s"$dir/orders.parquet")
      .orderBy(col("o_totalprice").desc).limit(5)
    assert(plan(df).contains("TakeOrderedAndProject"))
  }

  test("small dimension joins broadcast") {
    val o = spark.read.parquet(s"$dir/orders.parquet")
    val n = spark.read.parquet(s"$dir/nation.parquet")
    val df = o.join(broadcast(n), o("o_custkey") % 25 === n("n_nationkey"))
    assert(plan(df).contains("BroadcastHashJoin"))
  }

  test("chunk dedup: boilerplate removal is a left-anti join, no window over the corpus") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val p = plan(graft.text.Dedup.chunkDedup(docs, "doc_id", "text"))
    assert(p.contains("LeftAnti"))
    assert(!p.contains("Window"), "reassembly must be array_sort in the agg, not a window")
  }

  test("repeated n-gram mining groups on the 16-byte digest, not the gram text") {
    val df = LlmQueries.queries("x14_repeated_ngrams")(spark, dir)
    // no aggregate may key on a string: the gram text must never be a
    // shuffle key (16-byte digest + long doc_id only; min(gram) rides as
    // an aggregate buffer, one exemplar per key per map task)
    val aggs = df.queryExecution.optimizedPlan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate
          if a.groupingExpressions.nonEmpty => a
    }
    assert(aggs.nonEmpty)
    aggs.foreach { a =>
      assert(a.groupingExpressions.forall(
        _.dataType != org.apache.spark.sql.types.StringType),
        s"gram text used as grouping key: ${a.groupingExpressions.map(_.dataType)}")
      assert(a.groupingExpressions.exists(
        _.dataType == org.apache.spark.sql.types.BinaryType))
    }
    assert(plan(df).contains("TakeOrderedAndProject"))
  }

  test("semDedup candidates come from a cell equi-join, never a cartesian") {
    for (q <- Seq("d10_semdedup", "d10b_semdedup_scaled")) {
      val df = LlmQueries.queries(q)(spark, dir)
      val p = plan(df)
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$q: within-cell pairing must be an equi-join on cell")
      assert(p.contains("LeftAnti"), s"$q: survivors via anti-join, not a window")
    }
  }

  test("date-partitioned layout prunes partitions at scan time") {
    val out = "target/tmp/orders_by_year"
    spark.read.parquet(s"$dir/orders.parquet")
      .withColumn("year", date_format(col("o_orderdate"), "yyyy"))
      .write.mode("overwrite").partitionBy("year").parquet(out)
    val df = spark.read.parquet(out).filter(col("year") === "1997")
    val p = plan(df)
    assert(p.contains("PartitionFilters") && p.contains("year"),
      "the year predicate must prune directories, not filter rows")
    val want = spark.read.parquet(s"$dir/orders.parquet")
      .filter(date_format(col("o_orderdate"), "yyyy") === "1997").count()
    assert(df.count() == want)
  }

  test("tpch q5: dimension chain broadcasts, date filter reaches the orders scan") {
    val p = plan(RelationalQueries.tpchQ5Join(spark, dir))
    assert(p.contains("BroadcastHashJoin"))
    assert(p.contains("PushedFilters") && p.contains("o_orderdate"))
  }

  test("correlated EXISTS decorrelates to a semi join, not a subquery per row") {
    val p = plan(RelationalQueries.existsSemiJoinSql(spark, dir))
    assert(p.toLowerCase.contains("leftsemi"))
    assert(!p.contains("InSubquery"))
  }

  test("tf-idf is one-pass: the corpus scans exactly once") {
    // df comes from a window over term on tf — a second groupBy branch
    // loses exchange reuse (column pruning strips its count), silently
    // re-tokenizing the whole corpus. The document TEXT must be read by
    // exactly one scan; the only other corpus scan is the zero-column
    // count-star for N (metadata-only, ReadSchema: struct<>)
    val df = LlmQueries.tfIdfTopTerms(spark, dir)
    assert("text:string".r.findAllIn(plan(df)).size == 1)
  }

  test("pivot via conditional aggregates plans one shuffle, no distinct job") {
    val df = RelationalQueries.pivotAgg(spark, dir)
    val p = plan(df)
    // single aggregation chain: partial + final = exactly one hash
    // exchange before the output sort (`.pivot` would add a second)
    assert(p.contains("HashAggregate"))
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1)
  }

  test("decontamination: rare-postings subtree is cached, derived once") {
    import graft.operators.CacheScope
    import graft.text.Dedup
    CacheScope.withScope { implicit scope =>
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val d = Dedup.decontaminate(docs, "doc_id", "text",
        benchPred = col("doc_id") < 20)
      d.count()
      // both the bench and train branches read the persisted postings:
      // the executed plan shows InMemoryTableScan (cache hits), and the
      // tokenize+hash scan appears under at most one live subtree
      assert(plan(d).contains("InMemoryTableScan"))
    }
  }

  test("quantized top-k: corpus streams past a broadcast query side") {
    val df = LlmQueries.quantizedTopK(spark, dir)
    val p = plan(df)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"))
    // the rank filter compiles to the per-key heap, not a full sort
    assert(p.contains("WindowGroupLimit"))
  }

  test("bloom decontamination: might_contain prunes BEFORE the join exchange") {
    import graft.operators.CacheScope
    import graft.text.Dedup
    CacheScope.withScope { implicit scope =>
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val d = Dedup.decontaminateBloom(docs, "doc_id", "text",
        benchPred = col("doc_id") < 20)
      val p = plan(d)
      // the probe appears as a Filter feeding the train-side exchange
      assert(p.contains("might_contain"))
      val probeIdx = p.indexOf("might_contain")
      val joinIdx = p.indexOf("SortMergeJoin") max p.indexOf("ShuffledHashJoin")
      assert(probeIdx >= 0)
      // filter sits below (prints after) the join operator in the tree
      assert(joinIdx < 0 || probeIdx > joinIdx)
    }
  }

  test("approximate sketches: HLL distinct and CountMinSketch frequency") {
    val o = spark.read.parquet(s"$dir/orders.parquet")
    val exact = o.select(countDistinct("o_custkey")).head().getLong(0)
    val approx = o.select(approx_count_distinct("o_custkey", 0.02))
      .head().getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.1)
    val cms = o.stat.countMinSketch("o_orderstatus", eps = 0.01,
      confidence = 0.95, seed = 42)
    val f = o.filter(col("o_orderstatus") === "F").count()
    assert(cms.estimateCount("F") >= f) // CMS never under-counts
    // approx_percentile within its accuracy contract vs the exact median
    val exactMed = o.stat.approxQuantile("o_totalprice", Array(0.5), 0.0)(0)
    val approxMed = o.select(
      percentile_approx(col("o_totalprice"), lit(0.5), lit(1000)))
      .head().getDouble(0)
    val rank = o.filter(col("o_totalprice") <= approxMed).count().toDouble /
      o.count()
    assert(math.abs(rank - 0.5) < 0.01, s"approx median $approxMed vs $exactMed")
  }

  test("NOT EXISTS decorrelates to an anti join with the date filter pushed down") {
    val p = plan(RelationalQueries.notExistsAntiSql(spark, dir))
    assert(p.toLowerCase.contains("leftanti"),
      "correlated NOT EXISTS must become a left anti join")
    assert(!p.contains("InSubquery") && !p.contains("CartesianProduct"))
    // the o_orderdate >= bound must reach the orders parquet scan so the
    // anti build side is the recent slice, not full history
    assert(p.contains("PushedFilters") && p.contains("o_orderdate"))
  }

  test("near-dedup verdict: small label frames auto-broadcast WITHOUT a hint") {
    // the verdict join carries no broadcast hint by design (a 30%-dup
    // corpus has corpus-scale labels and must shuffle) — the size-based
    // threshold, not a hint, makes the small case broadcast
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val labels = Seq((1L, 1L), (7L, 1L)).toDF("node", "label")
    val df = docs.select(col("doc_id"))
      .join(labels, col("doc_id") === col("node"), "left")
      .select(col("doc_id"), coalesce(col("label"), col("doc_id")).as("cluster_id"))
    val p = plan(df)
    assert(p.contains("BroadcastHashJoin"),
      "a tiny label frame should auto-broadcast via the size threshold")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("knn graph: cell-partitioned shuffle join (corpus never broadcasts), heap-bounded top-k") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val cents = graft.ml.Similarity.ivfCentroids(16, 64).map(_.map(_.toDouble))
    val p = plan(graft.ml.Similarity.knnGraph(emb, 3, cents))
    assert(p.contains("ShuffledHashJoin") || p.contains("SortMergeJoin"),
      "corpus-to-corpus candidates must equi-shuffle on cell, not broadcast")
    assert(!p.contains("BroadcastHashJoin") && !p.contains("CartesianProduct"))
    assert(p.contains("WindowGroupLimit"), "top-k per node must heap-bound before the window")
  }

  test("e14 index admission is a narrow map: no shuffle, no join, no window") {
    // the whole point of incremental maintenance: folding a batch into
    // an existing index must cost O(batch) — assign + encode are
    // row-local against frozen constants, so the admitted side's plan
    // may contain NOTHING that repartitions or compares rows
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val cents = graft.ml.Similarity.ivfCentroids(16, 64).map(_.map(_.toDouble))
    val books = graft.ml.Similarity.pqCodebooks(8, 8, 16)
    val admitted = graft.ml.Similarity.ivfPqIndex(
      emb.filter(col("id") >= 400), books, cents)
    val p = plan(admitted)
    Seq("Exchange", "Join", "Window", "Sort").foreach(op =>
      assert(!p.contains(op), s"index admission must not plan a $op:\n$p"))
  }

  test("d13 incremental dedup: admission joins are threshold-decided, never hinted") {
    graft.operators.CacheScope.withScope { implicit scope =>
      val df = LlmQueries.incrementalDedupBuild(spark, dir)
      // no forced broadcast anywhere in the d13 plan: nearIds is
      // batch-proportional (largest when the batch is duplicate-heavy)
      assert(!df.queryExecution.analyzed.toString.contains("ResolvedHint"),
        "d13 must carry no broadcast hints — the size threshold decides")
      assert(plan(df).contains("BroadcastHashJoin"),
        "at tiny SF the threshold should still pick broadcast on its own")
      // with the threshold disabled the same plan must degrade to a
      // shuffle join — proof the broadcast was threshold-decided
      val key = "spark.sql.autoBroadcastJoinThreshold"
      val prev = spark.conf.get(key)
      try {
        spark.conf.set(key, "-1")
        assert(!plan(LlmQueries.incrementalDedupBuild(spark, dir))
          .contains("BroadcastHashJoin"),
          "threshold=-1 must force every d13 join to degrade to a shuffle")
      } finally spark.conf.set(key, prev)
    }
  }

  test("w5 stream-static enrich: dim join threshold-decided (degrades to shuffle)") {
    val scoped = spark.newSession()
    // the nanos flag is a no-op on a micros-encoded file, so this read is
    // encoding-proof without Tables.readEvents (whose memoized frame is
    // bound to ITS child session — this test must flip broadcast conf on
    // the frame's OWN session for the threshold assertions to bite)
    scoped.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val events = scoped.read.parquet(s"$dir/events.parquet")
      .select("event_id", "user_id", "event_type")
    val dim = scoped.read.parquet(s"$dir/customer.parquet")
      .select(col("c_custkey"), col("c_mktsegment"))
    val df = RelationalQueries.streamStaticEnrich(events, dim)
    assert(!df.queryExecution.analyzed.toString.contains("ResolvedHint"),
      "customer is fact-proportional — the enrich join must not be hinted")
    assert(plan(df).contains("BroadcastHashJoin"),
      "under the threshold the dim still auto-broadcasts")
    scoped.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    assert(!plan(RelationalQueries.streamStaticEnrich(events, dim))
      .contains("BroadcastHashJoin"),
      "above the threshold the join must degrade to the shuffle shape")
  }

  test("x16 bigram LM: model is a joined frame — no map literals, hint-free counts joins") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .filter(length(col("text")) >= 2)
    val mb = graft.text.TextAnalysis.bigramCounts(docs, "text")
    val df = graft.text.TextAnalysis.bigramLmScore(docs, "doc_id", "text", mb)
    // the model must never be embedded as a plan literal (charset²-sized
    // on a multilingual corpus): zero MapType literals anywhere
    val mapLits = df.queryExecution.optimizedPlan.collect { case p =>
      p.expressions.flatMap(_.collect {
        case l: org.apache.spark.sql.catalyst.expressions.Literal
            if l.dataType.isInstanceOf[org.apache.spark.sql.types.MapType] => l
      })
    }.flatten
    assert(mapLits.isEmpty, "bigram model must join as a frame, not embed as typedLit")
    // the counts joins stay threshold-decided; the only hint is the
    // 1-row vocabulary scalar
    val hints = df.queryExecution.analyzed.collect {
      case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
    }
    assert(hints.size <= 1, "only the 1-row V scalar may carry a hint")
  }

  test("x16 at wide charset: 1e5+ distinct bigrams, no map literals, join degrades to shuffle") {
    // the scale claim behind the round-6 rework, demonstrated: a
    // CJK-style corpus whose bigram vocabulary could never ride the plan
    // as a literal, scored through the exact same code path the ASCII
    // documents take. 2000 docs × 200 chars over a 400-char alphabet →
    // ~150k distinct bigrams (≥1e5 asserted, not assumed).
    val scoped = spark.newSession()
    val alphabet = (0x4E00 until 0x4E00 + 400).map(_.toChar).mkString
    val wide = scoped.range(2000).select(col("id").as("doc_id"),
      concat_ws("", transform(sequence(lit(0), lit(199)),
        i => substr(lit(alphabet),
          pmod(hash(col("id"), i), lit(400)) + 1, lit(1)))).as("text"))
    val counts = graft.text.TextAnalysis.bigramCounts(wide, "text")
    assert(counts.count() >= 100000L, "fixture must be genuinely wide-charset")

    def mapLiterals(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.optimizedPlan.collect { case p =>
        p.expressions.flatMap(_.collect {
          case l: org.apache.spark.sql.catalyst.expressions.Literal
              if l.dataType.isInstanceOf[org.apache.spark.sql.types.MapType] => l
        })
      }.flatten
    val scored = graft.text.TextAnalysis.bigramLmScore(wide, "doc_id", "text", counts)
    assert(mapLiterals(scored).isEmpty,
      "a 1e5-bigram model must never be embedded in the plan")

    // under the default threshold the aggregated counts frame still
    // auto-broadcasts; past it (threshold off) the SAME query must
    // degrade to shuffle joins on the bigram key — only the hinted
    // 1-row vocabulary scalar may stay broadcast
    assert("BroadcastHashJoin".r.findAllIn(plan(scored)).size >= 2,
      "under the threshold the counts joins broadcast")
    scoped.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p = plan(graft.text.TextAnalysis.bigramLmScore(wide, "doc_id", "text", counts))
      assert("BroadcastHashJoin".r.findAllIn(p).size <= 1,
        "past the threshold only the 1-row V scalar may broadcast")
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
        "the counts join must take the shuffle shape")
      // and the degraded plan still computes: scores are probabilities
      val sample = graft.text.TextAnalysis
        .bigramLmScore(wide, "doc_id", "text", counts)
        .filter(col("doc_id") < 5).collect()
      assert(sample.length == 5 &&
        sample.forall { r =>
          val v = r.getAs[Double]("lm_score"); v > 0.0 && v <= 1.0 })
    } finally scoped.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("temperature mix: one rank window on the domain key, quotas as plan literals") {
    val df = LlmQueries.queries("x17_temperature_mix")(spark, dir)
    val p = plan(df)
    assert("Window ".r.findAllIn(p).size <= 1 && p.contains("row_number"))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("LATERAL top-n decorrelates: WindowGroupLimit + one equi-join, no per-row loop") {
    val p = plan(RelationalQueries.queries("q18_lateral_topn")(spark, dir))
    assert(p.contains("WindowGroupLimit"), "rank-k pushdown must fire")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "the correlated subquery must not survive as a nested loop")
  }

  test("kmv sketch: partial aggregation before the exchange (bounded sketch partials)") {
    val p = plan(LlmQueries.queries("x20_kmv_distinct")(spark, dir))
    // ObjectHashAggregate runs the Aggregator in partial mode map-side;
    // the exchange then carries <= k longs per (group, task)
    assert(p.contains("ObjectHashAggregate"))
    assert("ObjectHashAggregate".r.findAllIn(p).size >= 2,
      "partial + final aggregate expected around the exchange")
  }

  // the shared claim of the shingle family's r12 additions: text never
  // rides a shuffle — every join condition and grouping key is a hash
  // (long), a digest (binary) or an id
  private def assertNoTextShuffle(df: org.apache.spark.sql.DataFrame): Unit = {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join}
    import org.apache.spark.sql.types.StringType
    val lp = df.queryExecution.optimizedPlan
    val joins = lp.collect { case j: Join => j }
    assert(joins.nonEmpty, "expected at least one join")
    joins.foreach { j =>
      val refs = j.condition.toSeq.flatMap(_.references.toSeq)
      assert(refs.forall(_.dataType != StringType),
        s"document text in a join key: ${refs.map(r => s"${r.name}:${r.dataType}")}")
    }
    lp.collect { case a: Aggregate if a.groupingExpressions.nonEmpty => a }
      .foreach { a =>
        assert(a.groupingExpressions.forall(_.dataType != StringType),
          s"document text as a grouping key: ${a.groupingExpressions.map(_.dataType)}")
      }
    assert(!plan(df).contains("CartesianProduct"))
  }

  test("containment pairs: posting join shuffles hashes and ids, never text") {
    graft.operators.CacheScope.withScope { implicit scope =>
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      assertNoTextShuffle(graft.text.Dedup.containmentPairs(
        docs, "doc_id", "text", k = 3, tauNum = 1, tauDen = 2, maxDf = 20))
    }
  }

  test("novelty score: both aggregations key on the hash, never text") {
    graft.operators.CacheScope.withScope { implicit scope =>
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      assertNoTextShuffle(graft.text.Dedup.noveltyScore(
        docs, "doc_id", "text", k = 3))
    }
  }

  test("admission decontamination: the posting join shuffles hashes and ids, never text") {
    graft.operators.CacheScope.withScope { implicit scope =>
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      assertNoTextShuffle(graft.text.Dedup.decontaminateAtAdmission(
        docs.filter(col("doc_id") < 20), docs.filter(col("doc_id") >= 20),
        "doc_id", "text", k = 3, minShared = 5, maxDf = 10))
    }
  }

  test("containment at admission: the posting join shuffles hashes and ids, never text") {
    graft.operators.CacheScope.withScope { implicit scope =>
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val stateArt = graft.text.Dedup.admissionArtifacts(
        docs.filter(col("doc_id") < 20), "doc_id", "text", 3, 16)
      val cposts = graft.text.Dedup.containmentPostings(stateArt, maxDf = 10)
      val batchArt = graft.text.Dedup.admissionArtifacts(
        docs.filter(col("doc_id") >= 20), "doc_id", "text", 3, 16)
      assertNoTextShuffle(graft.text.Dedup.containedIds(
        batchArt, cposts, tauNum = 4, tauDen = 5, minShingles = 10))
    }
  }

  test("span-dedup repair: window digests and positions shuffle, never text") {
    graft.operators.CacheScope.withScope { implicit scope =>
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      assertNoTextShuffle(graft.text.Dedup.spanDedupRepair(
        docs, "doc_id", "text", k = 15))
    }
  }

  test("shot near-dup: the banded shot join shuffles 8-byte codes keyed by band, never frames") {
    graft.operators.CacheScope.withScope { implicit scope =>
      import org.apache.spark.sql.catalyst.plans.logical.Join
      import org.apache.spark.sql.types.{BinaryType, StringType}
      val docs = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("text")).limit(40)
      val packed = graft.multimodal.Multimodal.packAsY4m(docs,
        "doc_id", "text", cutAtFrame = 2, cutDelta = 40)
      val pairs = graft.multimodal.Multimodal.videoShotNearDupPairs(
        graft.multimodal.Multimodal.videoShotFingerprints(packed))
      val lp = pairs.queryExecution.optimizedPlan
      val joins = lp.collect { case j: Join => j }
      assert(joins.nonEmpty, "expected the banded self-join")
      joins.foreach { j =>
        val refs = j.condition.toSeq.flatMap(_.references.toSeq)
        assert(refs.forall(r =>
            r.dataType != BinaryType && r.dataType != StringType),
          s"payload bytes in the shot join: " +
            refs.map(r => s"${r.name}:${r.dataType}").mkString(", "))
      }
      assert(!plan(pairs).contains("CartesianProduct"))
    }
  }
}
