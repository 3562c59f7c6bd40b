package graft

import org.apache.spark.sql.functions._
import graft.ml.VectorAgg

class VectorAggSpec extends SparkSpec {
  import spark.implicits._

  test("vectorAvg computes per-group element-wise means") {
    val df = Seq(
      (0, Seq(1.0f, 2.0f)), (0, Seq(3.0f, 4.0f)),
      (1, Seq(10.0f, 20.0f)))
      .toDF("label", "embedding")
      .repartition(4) // exercise partial + merge across partitions
    val out = df.groupBy("label")
      .agg(VectorAgg.vectorAvgCol(col("embedding")).as("centroid"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    assert(out(0) == Seq(2.0, 3.0))
    assert(out(1) == Seq(10.0, 20.0))
  }

  test("vectorSumLong sums int vectors element-wise across partitions") {
    val df = Seq(
      (0, Seq(1, -2)), (0, Seq(3, 4)), (0, Seq(100, 200)),
      (1, Seq(-7, 0)))
      .toDF("label", "qv")
      .repartition(4) // exercise partial + merge across partitions
    val out = df.groupBy("label")
      .agg(VectorAgg.vectorSumCol(col("qv")).as("s"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
    assert(out(0) == Seq(104L, 202L))
    assert(out(1) == Seq(-7L, 0L))
  }

  test("ragged vector lengths fail loudly instead of summing wrong") {
    val df = Seq((0, Seq(1, 2, 3)), (0, Seq(1, 2)))
      .toDF("label", "qv").coalesce(1)
    val e = intercept[Exception] {
      df.groupBy("label").agg(VectorAgg.vectorSumCol(col("qv"))).collect()
    }
    // Spark wraps the task failure; the root message must survive
    assert(Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .take(10).exists(_.getMessage != null) &&
      Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null).take(10)
        .exists(t => Option(t.getMessage).exists(_.contains("ragged"))))
  }

  test("centroids over the embeddings table have the right shape") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cents = emb.groupBy("label")
      .agg(VectorAgg.vectorAvgCol(col("embedding")).as("c"))
    assert(cents.count() == 10)
    assert(cents.select(size(col("c"))).distinct().head().getInt(0) == 64)
  }
}
