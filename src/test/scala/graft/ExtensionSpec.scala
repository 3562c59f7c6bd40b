package graft

import org.apache.spark.sql.functions._
import graft.ml.Similarity

/** Native VectorDot expression: SQL registration via GraftExtensions,
  * codegen correctness, and null semantics. */
class ExtensionSpec extends SparkSpec {
  import spark.implicits._

  test("graft_vector_dot is registered as a SQL function") {
    val r = spark.sql(
      "SELECT graft_vector_dot(array(1.0D, 2.0D), array(3.0D, 4.0D))")
      .head().getDouble(0)
    assert(r == 11.0)
  }

  test("VectorDot over float arrays matches the double fold bit-exactly") {
    val df = Seq((Array(0.1f, 0.2f, 0.3f), Array(0.4f, 0.5f, 0.6f)))
      .toDF("a", "b")
    val native = df.select(Similarity.dot(col("a"), col("b"))).head().getDouble(0)
    val fold = df.select(
      aggregate(zip_with(col("a"), col("b"),
        (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, x) => acc + x)).head().getDouble(0)
    assert(java.lang.Double.doubleToLongBits(native) ==
      java.lang.Double.doubleToLongBits(fold))
  }

  test("VectorDot null semantics: null array / length mismatch / null element") {
    val rows = spark.sql(
      """SELECT
        |  graft_vector_dot(CAST(NULL AS ARRAY<DOUBLE>), array(1.0D)) AS a,
        |  graft_vector_dot(array(1.0D), array(1.0D, 2.0D)) AS b,
        |  graft_vector_dot(array(1.0D, CAST(NULL AS DOUBLE)), array(1.0D, 2.0D)) AS c
        |""".stripMargin).head()
    assert(rows.isNullAt(0) && rows.isNullAt(1) && rows.isNullAt(2))
  }

  test("SimHash60 matches the unrolled reference formulation exactly") {
    import graft.text.Dedup
    // real token-hash arrays from the testdata corpus, plus edges
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(50)
      .select(col("doc_id"), Dedup.tokenHashes31(Dedup.tokens(col("text"))).as("hs"))
    val both = docs.select(col("doc_id"),
      Dedup.simhashFromHashes(col("hs")).as("native"),
      Dedup.simhashFromHashesUnrolled(col("hs")).as("ref"))
    assert(both.filter(col("native") =!= col("ref")).count() == 0)
    // edges: empty array => 0; null element => NULL; null array => NULL
    val edges = spark.sql(
      """SELECT
        |  graft_simhash60(CAST(array() AS ARRAY<BIGINT>)) AS a,
        |  graft_simhash60(array(5L, CAST(NULL AS BIGINT))) AS b,
        |  graft_simhash60(CAST(NULL AS ARRAY<BIGINT>)) AS c
        |""".stripMargin).head()
    assert(edges.getLong(0) == 0L && edges.isNullAt(1) && edges.isNullAt(2))
  }

  test("MinHashSig matches the unrolled reference formulation exactly") {
    import graft.text.Dedup
    import graft.functions.Hashing
    val perms = Hashing.minhashPerms(16)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(50)
      .select(col("doc_id"), Dedup.tokenHashes31(Dedup.tokens(col("text"))).as("th"))
      .select(col("doc_id"), Dedup.shingleHashesFromTokenHashes(col("th"), 3).as("hs"))
    val both = docs.select(col("doc_id"),
      Dedup.minhashSignature(col("hs"), perms).as("native"),
      Dedup.minhashSignatureUnrolled(col("hs"), perms).as("ref"))
    assert(both.filter(col("native") =!= col("ref")).count() == 0)
    // empty array => all-null signature slots (array_min-of-empty semantics)
    val empty = docs.limit(1)
      .select(Dedup.minhashSignature(
        expr("CAST(array() AS ARRAY<BIGINT>)"), perms).as("sig"))
      .head().getSeq[Any](0)
    assert(empty.size == 16 && empty.forall(_ == null))
  }

  test("IvfRankCells matches the sort_array literal formulation exactly") {
    // the formulation IvfRankCells replaced (nCells x dim literal nodes):
    // score per cell via VectorDot against a literal array, rank by
    // sort_array desc on struct(score, -cellId)
    def rankedLiteral(vec: org.apache.spark.sql.Column,
                      cents: Seq[Seq[Double]], nprobe: Int) = {
      val pairs = cents.zipWithIndex.map { case (c, j) =>
        struct(Similarity.dot(array(c.map(lit): _*), vec).as("s"),
          lit(-j).as("nj"))
      }
      transform(slice(sort_array(array(pairs: _*), asc = false), 1, nprobe),
        x => -x.getField("nj"))
    }
    val cents = Similarity.ivfCentroids(16, 64).map(_.map(_.toDouble))
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    for (nprobe <- Seq(1, 2, 5, 16)) {
      val both = emb.select(col("vec_id"),
        Similarity.ivfProbesD(col("embedding"), cents, nprobe).as("native"),
        rankedLiteral(col("embedding"), cents, nprobe).as("ref"))
      assert(both.filter(col("native") =!= col("ref")).count() == 0,
        s"nprobe=$nprobe diverges from the literal formulation")
    }
    // tie-breaking to the smaller cell id: duplicate centroids score
    // identically, so both copies rank adjacent with the smaller first
    val tied = Seq(Seq(1.0, 0.0), Seq(0.0, 1.0), Seq(1.0, 0.0))
    val r = Seq(Tuple1(Array(2.0, 1.0))).toDF("v")
      .select(Similarity.ivfProbesD(col("v"), tied, 3)).head().getSeq[Int](0)
    assert(r == Seq(0, 2, 1))
    // null semantics: null array / length mismatch / null element => NULL
    val edge = Seq(Tuple1(Array(1.0, 2.0))).toDF("v").select(
      Similarity.ivfProbesD(lit(null).cast("array<double>"), tied, 1).as("a"),
      Similarity.ivfProbesD(array(lit(1.0)), tied, 1).as("b"),
      Similarity.ivfProbesD(array(lit(1.0), lit(null).cast("double")), tied, 1).as("c"))
      .head()
    assert(edge.isNullAt(0) && edge.isNullAt(1) && edge.isNullAt(2))
  }

  test("IvfRankCells participates in whole-stage codegen at wide codebooks") {
    val cents = Similarity.ivfCentroids(80, 64).map(_.map(_.toDouble))
    val df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(Similarity.ivfAssignD(col("embedding"), cents).as("cell"))
    val plan = df.queryExecution.executedPlan.toString
    assert("""\*\(\d+\) Project""".r.findFirstIn(plan).isDefined, plan)
    assert(df.filter(col("cell") >= 0).count() > 0)
  }

  test("PqEncode and PqAdc match the sliced-literal formulations exactly") {
    // the formulations they replaced: slice the vector into subvectors,
    // score each codeword via VectorDot against a literal array
    val m = 8; val subDim = 8
    def sub(j: Int) = slice(col("embedding"), j * subDim + 1, subDim)
    def codesLiteral(books: Seq[Seq[Seq[Double]]], cns: Seq[Seq[Double]]) =
      array(books.indices.map { j =>
        val pairs = books(j).zipWithIndex.map { case (cb, ci) =>
          struct((Similarity.dot(array(cb.map(lit): _*), sub(j)) - lit(cns(j)(ci))).as("s"),
            lit(-(ci + 1)).as("nj"))
        }
        (-element_at(sort_array(array(pairs: _*), asc = false), 1).getField("nj"))
          .cast("int")
      }: _*)
    def adctLiteral(books: Seq[Seq[Seq[Double]]]) =
      array(books.indices.map(j =>
        array(books(j).map(cb =>
          Similarity.dot(array(cb.map(lit): _*), sub(j))): _*)): _*)
    val books = Similarity.pqCodebooks(m, subDim, 16)
    val cns = Similarity.pqCellNorms(books)
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val vecs = emb.select(col("vec_id").as("id"), col("embedding").as("vec"))
    val codes = Similarity.pqEncode(vecs, "id", books, cns)
      .join(emb.select(col("vec_id").as("id"), col("embedding")), "id")
      .select(col("id"), col("codes").as("native"),
        codesLiteral(books, cns).as("ref"))
    assert(codes.filter(col("native") =!= col("ref")).count() == 0)
    val adct = Similarity.pqAdcTables(vecs, "id", books)
      .join(emb.select(col("vec_id").as("id"), col("embedding")), "id")
      .select(col("id"), col("adct").as("native"), adctLiteral(books).as("ref"))
    assert(adct.filter(col("native") =!= col("ref")).count() == 0)
    // null semantics: null array / length mismatch / null element => NULL
    val tiny = Seq(Seq(Seq(1.0, 0.0)), Seq(Seq(0.0, 1.0))) // m=2, subDim=2, 1 code
    val tcns = Similarity.pqCellNorms(tiny)
    val bad = Seq(Tuple1(Array(1.0, 2.0, 3.0))).toDF("vec") // length 3 != 4
      .withColumn("id", lit(1))
    val r1 = Similarity.pqEncode(bad, "id", tiny, tcns).head()
    val r2 = Similarity.pqAdcTables(bad, "id", tiny).head()
    assert(r1.isNullAt(1) && r2.isNullAt(1))
  }

  test("PqEncode stays compact at the production 256-codeword codebook") {
    val books = Similarity.pqCodebooks(8, 8, 256)
    val cns = Similarity.pqCellNorms(books)
    val vecs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val df = Similarity.pqEncode(vecs, "id", books, cns)
    val plan = df.queryExecution.executedPlan.toString
    assert("""\*\(\d+\) Project""".r.findFirstIn(plan).isDefined, plan)
    assert(df.filter(element_at(col("codes"), 1) >= 1).count() > 0)
  }

  test("LshBucket64 matches the when-chain literal formulation exactly") {
    // the formulation it replaced: one when(dot(lit-array, vec) > 0,
    // 1L<<j) branch per plane, summed
    def bucketLiteral(vec: org.apache.spark.sql.Column, planes: Seq[Seq[Long]]) =
      planes.zipWithIndex.map { case (w, j) =>
        when(Similarity.dot(array(w.map(x => lit(x.toDouble)): _*), vec) > 0,
          lit(1L << j)).otherwise(lit(0L))
      }.reduce(_ + _)
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    for (np <- Seq(1, 8, 32, 64)) {
      val planes = Similarity.hyperplanes(np, 64)
      val both = emb.select(col("vec_id"),
        Similarity.lshBucket(col("embedding"), planes).as("native"),
        bucketLiteral(col("embedding"), planes).as("ref"))
      assert(both.filter(col("native") =!= col("ref")).count() == 0,
        s"nPlanes=$np diverges from the when-chain formulation")
    }
    // null array / length mismatch / null element => NULL (documented
    // divergence: the when-chain mapped these to bucket 0)
    val p2 = Seq(Seq(1L, 0L), Seq(0L, 1L))
    val edge = emb.limit(1).select(
      Similarity.lshBucket(lit(null).cast("array<double>"), p2).as("a"),
      Similarity.lshBucket(array(lit(1.0)), p2).as("b"),
      Similarity.lshBucket(array(lit(1.0), lit(null).cast("double")), p2).as("c"))
      .head()
    assert(edge.isNullAt(0) && edge.isNullAt(1) && edge.isNullAt(2))
  }

  test("graft_char_ngrams is registered as a SQL function") {
    val r = spark.sql("SELECT graft_char_ngrams('héllo', 2)")
      .head().getSeq[String](0)
    assert(r == Seq("hé", "él", "ll", "lo"))
    val e = intercept[Exception](
      spark.sql("SELECT graft_char_ngrams('abc', length('xx'))").collect())
    assert(e.getMessage.contains("literal"), e.getMessage)
  }

  test("CharNGrams matches the transform+substr formulation exactly") {
    import graft.functions.CharNGrams
    import org.apache.spark.sql.graft.ColumnBridge
    def native(t: org.apache.spark.sql.Column, n: Int) =
      ColumnBridge.column(CharNGrams(ColumnBridge.expression(t), n))
    def ref(t: org.apache.spark.sql.Column, n: Int) =
      transform(sequence(lit(1), length(t) - (n - 1)),
        i => substr(t, i, lit(n)))
    // the real corpus plus multibyte/edge strings (substring counts
    // CODEPOINTS; the byte-walk must agree on 2- and 3-byte UTF-8)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("text"))
      .unionAll(Seq("héllo wörld", "한국어 텍스트", "ab", "a", "",
        "ñ", "日本語123abc").toDF("text"))
    for (n <- Seq(2, 3)) {
      val both = docs.filter(length(col("text")) >= n)
        .select(native(col("text"), n).as("native"), ref(col("text"), n).as("ref"))
      assert(both.filter(col("native") =!= col("ref")).count() == 0,
        s"n=$n diverges from the transform formulation")
    }
    // len < n => empty array; NULL => NULL
    val edge = Seq(("a", "x")).toDF("short", "t").select(
      size(native(col("short"), 2)).as("a"),
      native(lit(null).cast("string"), 2).as("b"))
      .head()
    assert(edge.getInt(0) == 0 && edge.isNullAt(1))
    // and it stays in whole-stage codegen over a real scan
    val plan = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(native(col("text"), 2).as("g"))
      .queryExecution.executedPlan.toString
    assert("""\*\(\d+\) Project""".r.findFirstIn(plan).isDefined, plan)
  }

  test("VectorDot participates in whole-stage codegen") {
    // a real scan (local literal relations constant-fold away)
    val df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(Similarity.dot(col("embedding"), col("embedding")).as("d"))
    val plan = df.queryExecution.executedPlan.toString
    // '*(n)' marks a WholeStageCodegen stage; the projection computing
    // the dot product must be inside one (no codegen fallback)
    assert("""\*\(\d+\) Project""".r.findFirstIn(plan).isDefined, plan)
    assert(df.filter(col("d") > 0).count() > 0) // executes the generated code
  }
}
