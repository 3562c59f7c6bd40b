package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Permanent probe behind `bench/residual_recall_r10.json`: recall@10
  * and estimator error of raw-vector IVF-PQ (e7b's shape) vs residual
  * IVF-PQ (e19) vs ADC+exact-rerank (e20), against the exact ground
  * truth — same trained coarse centroids, same (m, codes) budget, same
  * queries. Each corpus trains ONCE; every measurement reuses the
  * constants and the cached exact top-k. */
object ResidualRecallProbe {
  private val K = 10

  private case class Trained(emb: DataFrame, q: DataFrame,
                             cents: Seq[Seq[Double]],
                             rawBooks: Seq[Seq[Seq[Double]]],
                             resBooks: Seq[Seq[Seq[Double]]],
                             exact: DataFrame)

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

    def train(emb: DataFrame): Trained = {
      val q = emb.filter(col("id") < 50)
      val cents = Similarity.trainIvfCentroids(emb, 16, 64, iters = 5)
      val exact = Similarity.bruteForceTopK(q, emb, K)
        .select("query_id", "neighbor_id")
      exact.cache(); exact.count()
      Trained(emb, q, cents,
        Similarity.trainPqCodebooks(emb, 8, 8, 16, iters = 2, sampleMod = 4),
        Similarity.trainResidualBooks(emb, 8, 8, 16, cents, iters = 2, sampleMod = 4),
        exact)
    }
    def recall(t: Trained, approx: DataFrame): Double =
      t.exact.join(approx.select("query_id", "neighbor_id"),
        Seq("query_id", "neighbor_id")).count().toDouble / t.exact.count()

    def sweep(tag: String, t: Trained): Unit =
      for (np <- Seq(2, 4, 8)) {
        val raw = recall(t, Similarity.ivfPqTopKWith(t.q, t.emb, K, t.rawBooks, t.cents, np))
        val res = recall(t, Similarity.ivfPqResidualTopK(t.q, t.emb, K, t.resBooks, t.cents, np))
        println(f"PROBE corpus=$tag%s nprobe=$np%d raw=$raw%.4f residual=$res%.4f")
      }

    // the shipped corpus: isotropic (the ANN worst case — centroids
    // explain ~no variance, so residual has nothing to subtract)
    sweep("isotropic", train(spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))))

    // a clustered corpus: 16 unit centers, per-dim sigma 0.06 ->
    // residual norm ~0.5 vs unit centers — the coarse quantizer
    // explains ~80% of the variance (a real embedding corpus's cluster
    // structure, not the isotropic limit)
    val rnd = new scala.util.Random(42)
    def unit(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
    }
    val centers = Array.fill(16)(unit(Array.fill(64)(rnd.nextGaussian())))
    val pts = (0 until 6000).map { i =>
      val c = centers(i % 16)
      val p = unit(c.zip(Array.fill(64)(rnd.nextGaussian() * 0.06))
        .map { case (a, b) => a + b })
      (i.toLong, p.map(_.toFloat))
    }
    import spark.implicits._
    val t = train(pts.toDF("id", "vec"))
    sweep("clustered", t)

    // exhaustive estimators over ALL pairs (no probes, no top-k
    // selection): pure code quality, plus recall of exhaustive ranking
    val dots = t.q.select(col("id").as("query_id"), col("vec").as("qv"))
      .crossJoin(t.emb.select(col("id").as("neighbor_id"), col("vec").as("nv")))
      .select(col("query_id"), col("neighbor_id"),
        Similarity.dot(col("qv"), col("nv")).as("true_dot"))
    val rawIdx = Similarity.pqEncode(t.emb, "neighbor_id", t.rawBooks,
      Similarity.pqCellNorms(t.rawBooks))
    val resIdx = Similarity.ivfPqResidualIndex(t.emb, t.resBooks, t.cents)
      .withColumnRenamed("id", "neighbor_id")
    val centArr = typedLit(t.cents.map(_.toSeq))
    def estAll(idx: DataFrame, books: Seq[Seq[Seq[Double]]],
               withCent: Boolean): DataFrame = {
      val qt = Similarity.pqAdcTables(t.q, "query_id", books)
      val est = (0 until 8).map(j =>
        element_at(element_at(col("adct"), j + 1),
          element_at(col("codes"), j + 1))).reduce(_ + _)
      val full = if (withCent)
        est + aggregate(zip_with(
          col("qv").cast("array<double>"),
          element_at(centArr, col("cell") + lit(1)), (a, b) => a * b),
          lit(0.0), (acc, x) => acc + x)
      else est
      qt.crossJoin(idx)
        .join(t.q.select(col("id").as("query_id"), col("vec").as("qv")),
          "query_id")
        .select(col("query_id"), col("neighbor_id"), full.as("adc"))
    }
    def diag2(estF: DataFrame, tag: String): Unit = {
      val m = estF.join(dots, Seq("query_id", "neighbor_id"))
        .agg(avg(abs(col("adc") - col("true_dot"))),
          avg(col("adc") - col("true_dot"))).collect().head
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("query_id")
        .orderBy(col("adc").desc, col("neighbor_id"))
      val top = estF.filter(col("query_id") =!= col("neighbor_id"))
        .withColumn("r", row_number().over(w)).filter(col("r") <= K)
      val rec = recall(t, top)
      println(f"DIAG2 $tag%s mae=${m.getDouble(0)}%.5f bias=${m.getDouble(1)}%.5f exhaustive_recall=$rec%.4f")
    }
    diag2(estAll(rawIdx, t.rawBooks, withCent = false), "raw")
    diag2(estAll(resIdx, t.resBooks, withCent = true), "residual")

    // the refine stage (e20): same ADC stage 1, exact-cosine rerank of
    // 3k candidates — how much ranking resolution does it recover?
    for (np <- Seq(2, 4, 8)) {
      val rec = recall(t,
        Similarity.ivfPqRerankTopK(t.q, t.emb, K, 3 * K, t.rawBooks, t.cents, np))
      println(f"PROBE corpus=clustered rerank nprobe=$np%d recall=$rec%.4f")
    }
    spark.stop()
  }
}
