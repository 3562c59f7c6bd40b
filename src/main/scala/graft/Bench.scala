package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query at the target scale factor
  * and prints ONE JSON line. A warmup pass at sf0.001 first pays the
  * one-time JVM/codegen/parquet-footer costs so the timed numbers measure
  * the queries, not session bring-up. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Optional args = subset of query names to run (local iteration);
    // the driver passes none and gets the full suite.
    val names =
      if (args.nonEmpty) args.toSeq.filter(SparkEntry.queries.contains).distinct.sorted
      else SparkEntry.queries.keys.toSeq.sorted
    // locale-pinned formatting: the driver parses this line as JSON, and
    // a comma-decimal default locale would corrupt it
    def fmt(dec: Int, v: Double): String =
      String.format(java.util.Locale.ROOT, s"%.${dec}f", Double.box(v))
    // Two warmup passes (ignore failures — the timed run reports them
    // as -1): sf0.001 pays session/plan/parquet-footer bring-up; sf0.01
    // pushes enough rows through the hot loops that C2 actually
    // compiles the generated code BEFORE timing. Measured: the heavy
    // wire-path query swings 2.3s..11.8s purely with JIT maturity, so
    // without the second pass the numbers measure compiler scheduling,
    // not the queries.
    // Gates whose cost lives in columns a bare count() lets Catalyst
    // prune — aggregate expressions under groupBy/rollup/cube/window
    // (count needs only the keys) and expensive narrow projections
    // (x23's embedding kernel read ~0.2 s at ANY SF). These consume
    // through a checksum over every output column — nothing prunable,
    // one row back to the driver. Set audited empirically
    // (tools/PruneAudit, sf0.1 consume/count ratio >= 1.4, archived in
    // bench/prune_audit_r12.csv); their numbers re-baseline at r12
    // (bench/watchitems_r12.md) — compare r12+ values against
    // BENCH_r12, not earlier rounds.
    val consumeAll: Set[String] = Set(
      "q1_agg", "q2_join_broadcast", "q4_rollup", "q7_asof_join",
      "q13_window_frames", "q14_cube", "d9_chunk_dedup", "d10_semdedup",
      "e13b_ann_recall_trained", "m6_image_phash_dedup",
      "m11_video_fp_dedup", "x2_quality_score", "x5_repetition",
      "x13_mix_report", "x15_quality_classifier", "x19_gopher_rules",
      "x23_hashed_embedding",
      // r12 additions over the 1.4 cutoff (PruneAudit at sf0.1:
      // q21 4.2, m17 2.9, q20 1.6)
      "m17_video_scene_cuts", "q20_percentile", "q21_range_window")
    def consume(name: String, df: org.apache.spark.sql.DataFrame): Unit =
      if (consumeAll(name))
        df.select(org.apache.spark.sql.functions.expr(
          s"bit_xor(xxhash64(struct(${df.columns.map(c => s"`$c`").mkString(",")})))"))
          .collect()
      else df.count()
    // Streaming-commit / localCheckpoint-barrier gates: their wall is
    // dominated by fixed per-trigger commit and barrier floors that
    // swing up to 3.5x run-over-run with scheduler luck, not plan cost
    // (bench/watchitems_r12.md: the driver read d13 at 7.02 s where the
    // matched-canary archive reads 2.03 s — same code, same SF). These
    // get TWO EXTRA timed reps (min over 4 samples instead of 2), so
    // the archived number converges on the floor. ~15 gates × a few
    // seconds buys round-over-round comparability for the whole family.
    val barrierGates: Set[String] = Set(
      "w4_stream_stream_join", "w7_stream_dedup", "w8_stream_outer_join",
      "w9_late_data_drop", "w10_stream_ann_serve",
      "w11_stream_serve_from_store", "w12_stream_dedup_admission",
      "w13_stream_maintenance_plans", "w14_stream_curation_admission",
      "d8_dup_clusters_star", "d13_incremental_dedup",
      "m13_image_near_dedup_verdict", "m14_audio_near_dedup_verdict",
      "m15_video_near_dedup_verdict", "s7b_snapshot_stream_handoff",
      "s8_pg_cdc", "e33_reindex_cutover",
      // r15: the whole multi-trigger admission family — trigger-0
      // codegen warmup is 2.4-4x steady state (r14 ladder), so 2-rep
      // minima measured warmup luck, not the operator
      "w15_stream_decontaminated_admission",
      "w16_stream_contained_admission", "w17_stream_semantic_admission",
      "m22_multimodal_admission", "m24_media_decontaminated_admission",
      "w18_stream_full_admission", "l13_admission_pipeline",
      // r16: the documented JVM codegen-eviction victims — a full GC
      // elsewhere in the suite unloads their generated classes and a
      // 2-rep min still reads the recompile, not the operator
      // (BENCH_r15 carried x25 at 53.46 s vs its archived 1.56 s;
      // j1/k7/k10/e9c re-read in-band in isolation,
      // bench/sf1_eviction_recheck_r15.json; k9 flagged 6.19 s vs a
      // 1.4 s history in bench/watchitems_r15.md)
      "x25_span_dedup_repair", "k7_cdc_ingest_dml",
      "k7b_cdc_engine_stream", "k9_jdbc_statements",
      "k9b_upsert_sql_dialects", "k10_db_to_db_live",
      "j1_json_functions", "e9c_knn_graph_scaled")
    // Barrier gates SKIP the warmup passes: they take min-of-4 timed
    // reps, so their first rep IS the warmup (trigger-0 codegen is
    // 2.4-4x steady and converges by rep 2 — r14 ladder), and running
    // every multi-trigger streaming gate twice more at tiny SFs cost
    // the suite ~10+ minutes of wall for numbers the min never reads.
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01").foreach { wd =>
      names.filterNot(barrierGates).foreach { n =>
        try consume(n, SparkEntry.queries(n)(spark, wd))
        catch { case _: Throwable => () }
      }
    }
    // NOTE: do NOT force GC between queries — measured 61s -> 71s
    // suite-wide: a full GC unloads weakly-reachable generated classes
    // and their JIT-compiled code, so every later query recompiles.
    // The large heap (build.sbt) exists precisely to keep natural GC —
    // and that eviction — rare across the suite.
    //
    // Each query is timed in TWO full passes over the suite and the MIN
    // recorded: single-shot numbers swung up to 3x with JIT/compiler
    // scheduling, and back-to-back repeats share that transient state —
    // a full pass in between decorrelates it (by pass 2 the whole
    // suite's generated code is as compiled as it will ever be).
    def once(name: String): Double = {
      val t0 = System.nanoTime()
      val ok = try { consume(name, SparkEntry.queries(name)(spark, sfDir)); true }
               catch { case _: Throwable => false }
      if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
    }
    // Calibration CANARY: a fixed-size synthetic scan+shuffle+agg using
    // no repo operators and no input data — its wall time is a pure
    // function of machine speed/load, so round-over-round bench
    // comparisons can divide ambient drift out of per-query deltas
    // (driver totals moved +16% across r8->r9 with zero implicated
    // code). Timed at three points across the run (before, between and
    // after the timed passes), min recorded — same policy as queries.
    // (No sort leg: a sort under count() is optimizer-eliminated, and
    // 1000 aggregated rows would not measure anything anyway.)
    // The per-key aggregates are CONSUMED through a one-row global fold
    // (collected) — under a bare count() Catalyst's column pruning
    // eliminated the sum(h)/sum(h2) aggregates and the hash projections
    // feeding them, so the canary measured only scan+shuffle of the
    // group key. Heavier than the pre-r11 canary: compare r11+ values
    // against BENCH_r11's baseline, not r10's 0.312
    // (bench/watchitems_r11.md).
    def canaryOnce(): Double = {
      import org.apache.spark.sql.functions.{count, lit, sum}
      val t0 = System.nanoTime()
      spark.range(0, 20000000L, 1, 32)
        .selectExpr("id % 1000 AS k", "hash(id) AS h",
          "hash(id * 2654435761) AS h2")
        .groupBy("k")
        .agg(sum("h").as("sh"), sum("h2").as("sh2"),
          count(lit(1)).as("c"))
        .agg(sum("sh"), sum("sh2"), sum("c"))
        .collect()
      (System.nanoTime() - t0) / 1e9
    }
    canaryOnce() // pay its own codegen before the measured reps
    val canary0 = canaryOnce()
    val pass1 = names.map(n => n -> once(n)).toMap
    val canary1 = canaryOnce()
    val results = names.map { n =>
      val a = pass1(n)
      val b = once(n)
      val reps = Seq(a, b) ++
        (if (barrierGates(n)) Seq(once(n), once(n)) else Nil)
      val ok = reps.filter(_ >= 0)
      n -> (if (ok.isEmpty) -1.0 else ok.min)
    }
    val canary = math.min(canary0, math.min(canary1, canaryOnce()))
    val total = results.map(_._2).filter(_ >= 0).sum
    def line(dec: Int): String = {
      val qs = results.map { case (k, v) => "\"" + k + "\":" + fmt(dec, v) }
        .mkString("{", ",", "}")
      s"""{"metric":"total","value":${fmt(3, total)},"unit":"sec","canary":${fmt(3, canary)},"queries":$qs,"sf":"$sfDir"}"""
    }
    // The harness that captures this keeps only the last ~2000 chars of
    // output; the metric line must fit entirely inside that window.
    // First try the full per-query map at 3 then 2 decimals; once the
    // suite is too large for that, keep the SLOWEST queries (the ones
    // whose numbers carry information) at 2 decimals and say exactly
    // what was dropped — "queries_omitted" + their combined seconds —
    // so the truncation is loud, never silent.
    val budget = 1950
    def topLine(k: Int): String = {
      val sorted = results.sortBy { case (n, v) => (-v, n) }
      val kept = sorted.take(k)
      val om = sorted.drop(k)
      val qs = kept.map { case (n, v) => "\"" + n + "\":" + fmt(2, v) }
        .mkString("{", ",", "}")
      s"""{"metric":"total","value":${fmt(3, total)},"unit":"sec","canary":${fmt(3, canary)},"queries":$qs,""" +
        s""""queries_omitted":${om.size},"omitted_sec":${fmt(3, om.map(_._2).filter(_ >= 0).sum)},"sf":"$sfDir"}"""
    }
    val out = Seq(line(3), line(2)).find(_.length <= budget).getOrElse {
      var k = results.size
      while (k > 1 && topLine(k).length > budget) k -= 1
      topLine(k)
    }
    // Full precision for local round-over-round diffing (tools/bench_diff.py).
    val full = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    try {
      val p = java.nio.file.Paths.get("target/bench_full.json")
      java.nio.file.Files.write(p,
        s"""{"metric":"total","value":$total,"unit":"sec","canary":$canary,"queries":$full,"sf":"$sfDir"}""".getBytes)
    } catch { case _: Throwable => () }
    println(out)
    spark.stop()
  }
}
