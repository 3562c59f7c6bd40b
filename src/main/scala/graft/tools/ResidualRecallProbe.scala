package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-shot probe: recall@10 of raw-vector IVF-PQ (e7b's shape) vs
  * residual IVF-PQ (e19) against the exact ground truth, same trained
  * coarse centroids, same (m, codes) budget, same queries. */
object ResidualRecallProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.ml.Similarity
    val k = 10
    def measure(tag: String, emb: org.apache.spark.sql.DataFrame): Unit = {
      val q = emb.filter(col("id") < 50)
      val cents = Similarity.trainIvfCentroids(emb, 16, 64, iters = 5)
      val rawBooks = Similarity.trainPqCodebooks(emb, 8, 8, 16, iters = 2, sampleMod = 4)
      val resBooks = Similarity.trainResidualBooks(emb, 8, 8, 16, cents, iters = 2, sampleMod = 4)
      val exact = Similarity.bruteForceTopK(q, emb, k)
        .select("query_id", "neighbor_id")
      exact.cache(); exact.count()
      def recall(approx: org.apache.spark.sql.DataFrame): Double = {
        val hits = exact.join(approx.select("query_id", "neighbor_id"),
          Seq("query_id", "neighbor_id")).count()
        hits.toDouble / exact.count()
      }
      for (np <- Seq(2, 4, 8)) {
        val raw = recall(Similarity.ivfPqTopKWith(q, emb, k, rawBooks, cents, np))
        val res = recall(Similarity.ivfPqResidualTopK(q, emb, k, resBooks, cents, np))
        println(f"PROBE corpus=$tag%s nprobe=$np%d raw=$raw%.4f residual=$res%.4f")
      }
      exact.unpersist()
    }
    // the shipped corpus: isotropic (the ANN worst case — centroids
    // explain ~no variance, so residual ≈ raw by construction)
    measure("isotropic", spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("vec")))
    // a clustered corpus: 16 unit centers, points = center + noise —
    // here the coarse quantizer explains most of the variance and the
    // residual codes only carry the small within-cluster detail
    val rnd = new scala.util.Random(42)
    def unit(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
    }
    val centers = Array.fill(16)(unit(Array.fill(64)(rnd.nextGaussian())))
    val pts = (0 until 6000).map { i =>
      val c = centers(i % 16)
      // per-dim sigma 0.06 -> residual norm ~0.5 vs unit centers: the
      // coarse quantizer explains ~80% of the variance (a real
      // embedding corpus's cluster structure, not the isotropic limit)
      val p = unit(c.zip(Array.fill(64)(rnd.nextGaussian() * 0.06))
        .map { case (a, b) => a + b })
      (i.toLong, p.map(_.toFloat))
    }
    import spark.implicits._
    val clustered = pts.toDF("id", "vec")
    measure("clustered", clustered)
    // DIAG: mean |estimate − true dot| for both estimators over the
    // top-k candidate pairs each returns
    locally {
      val emb = clustered
      val q = emb.filter(col("id") < 50)
      val cents = Similarity.trainIvfCentroids(emb, 16, 64, iters = 5)
      val rawBooks = Similarity.trainPqCodebooks(emb, 8, 8, 16, iters = 2, sampleMod = 4)
      val resBooks = Similarity.trainResidualBooks(emb, 8, 8, 16, cents, iters = 2, sampleMod = 4)
      val dots = q.select(col("id").as("query_id"), col("vec").as("qv"))
        .crossJoin(emb.select(col("id").as("neighbor_id"), col("vec").as("nv")))
        .select(col("query_id"), col("neighbor_id"),
          Similarity.dot(col("qv"), col("nv")).as("true_dot"))
      def mae(approx: org.apache.spark.sql.DataFrame, tag: String): Unit = {
        val m = approx.join(dots, Seq("query_id", "neighbor_id"))
          .agg(avg(abs(col("adc") - col("true_dot"))).as("mae"),
            avg(col("adc") - col("true_dot")).as("bias"))
          .collect().head
        println(f"DIAG $tag%s mae=${m.getDouble(0)}%.5f bias=${m.getDouble(1)}%.5f")
      }
      mae(Similarity.ivfPqTopKWith(q, emb, k, rawBooks, cents, 4), "raw")
      mae(Similarity.ivfPqResidualTopK(q, emb, k, resBooks, cents, 4), "residual")

      // exhaustive estimators over ALL pairs (no probes, no top-k
      // selection): pure code quality
      val cns = Similarity.pqCellNorms(rawBooks)
      val rcns = Similarity.pqCellNorms(resBooks)
      val rawIdx = Similarity.pqEncode(emb, "neighbor_id", rawBooks, cns)
      val resIdx = Similarity.ivfPqResidualIndex(emb, resBooks, cents)
        .withColumnRenamed("id", "neighbor_id")
      val rawQ = Similarity.pqAdcTables(q, "query_id", rawBooks)
      val resQ = Similarity.pqAdcTables(q, "query_id", resBooks)
      val centArr = typedLit(cents.map(_.toSeq))
      def estAll(idx: org.apache.spark.sql.DataFrame,
                 qt: org.apache.spark.sql.DataFrame,
                 withCent: Boolean): org.apache.spark.sql.DataFrame = {
        val est = (0 until 8).map(j =>
          element_at(element_at(col("adct"), j + 1),
            element_at(col("codes"), j + 1))).reduce(_ + _)
        val joined = qt.crossJoin(idx)
        val full = if (withCent)
          est + aggregate(zip_with(
            col("qv").cast("array<double>"),
            element_at(centArr, col("cell") + lit(1)), (a, b) => a * b),
            lit(0.0), (acc, x) => acc + x)
        else est
        joined.join(q.select(col("id").as("query_id"), col("vec").as("qv")),
            "query_id")
          .select(col("query_id"), col("neighbor_id"), full.as("adc"))
      }
      def diag2(estF: org.apache.spark.sql.DataFrame, tag: String): Unit = {
        val j = estF.join(dots, Seq("query_id", "neighbor_id"))
        val m = j.agg(avg(abs(col("adc") - col("true_dot"))),
          avg(col("adc") - col("true_dot"))).collect().head
        // recall@10 of exhaustive ranking by the estimator
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("query_id")
          .orderBy(col("adc").desc, col("neighbor_id"))
        val top = estF.filter(col("query_id") =!= col("neighbor_id"))
          .withColumn("r", row_number().over(w)).filter(col("r") <= k)
        val exact = Similarity.bruteForceTopK(q, emb, k)
          .select("query_id", "neighbor_id")
        val rec = top.join(exact, Seq("query_id", "neighbor_id")).count()
          .toDouble / exact.count()
        println(f"DIAG2 $tag%s mae=${m.getDouble(0)}%.5f bias=${m.getDouble(1)}%.5f exhaustive_recall=$rec%.4f")
      }
      diag2(estAll(rawIdx, rawQ, withCent = false), "raw")
      diag2(estAll(resIdx, resQ, withCent = true), "residual")

      // the refine stage (e20): same ADC stage 1, exact-cosine rerank
      // of 3k candidates — how much ranking resolution does it recover?
      val exact = Similarity.bruteForceTopK(q, emb, k)
        .select("query_id", "neighbor_id")
      for (np <- Seq(2, 4, 8)) {
        val rr = Similarity.ivfPqRerankTopK(q, emb, k, 3 * k, rawBooks, cents, np)
        val rec = rr.select("query_id", "neighbor_id")
          .join(exact, Seq("query_id", "neighbor_id")).count()
          .toDouble / exact.count()
        println(f"PROBE corpus=clustered rerank nprobe=$np%d recall=$rec%.4f")
      }
    }
    spark.stop()
  }
}
