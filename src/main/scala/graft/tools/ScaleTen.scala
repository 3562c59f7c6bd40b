package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Second-decade scale rung generator: derives an sf10-equivalent
 * `documents` + `embeddings` pair from an sf1 dir (itself a 10×
 * [[ScaleData]] derivation of sf0.1) — 100× the shipped sf0.1 rows,
 * for the r18 scale-critical rungs (admission single-trigger cost,
 * d2's banded join, e9c's production k-NN). BENCH-ONLY derived data.
 *
 * Why not ScaleData again: its per-replica Caesar shift has 26
 * distinct values and composing two 10× decades reuses total shifts
 * ((i+j) mod 26 collides), quietly reintroducing letter-identical
 * cross-replica documents — the exact near-dup artifact the shift
 * exists to prevent (clone clusters make the banded join read the
 * fixture, not the operator). The second decade instead suffixes
 * EVERY TOKEN with a per-replica tag: token sets become disjoint
 * across second-decade replicas AND against every first-decade
 * replica (no shingle survives a suffix change), so cross-replica
 * near-dup density stays zero while each replica keeps the corpus's
 * own internal near-dup structure. Embeddings jitter on an
 * independent (sine) basis from ScaleData's cosine jitter, so
 * second-decade vectors are near- but never exact-duplicates of any
 * first-decade vector.
 *
 * Only the two tables the sf10 rungs read are derived — the TPC-H
 * relational tables' scaling story is already told by the shipped SFs
 * plus sf1, and a full sf10 would spend the round's disk budget on
 * tables no rung reads.
 */
object ScaleTen {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("target/scaledata/sf1")
    val dst = args.lift(1).getOrElse("target/scaledata/sf10")
    val k = args.lift(2).map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // one decade above ScaleData's 1e8: the whole first-decade id range
    // (base + {0..9} * 1e8) shifts together per second-decade replica
    val Off = 1000000000L

    def writeSingleFile(df: DataFrame, name: String): Unit = {
      import java.nio.file.{Files, Paths}
      import scala.jdk.CollectionConverters._
      val tmp = s"$dst/.stage_$name"
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = {
        val s = Files.list(Paths.get(tmp))
        try s.iterator().asScala.find(_.toString.endsWith(".parquet")).get
        finally s.close()
      }
      Files.createDirectories(Paths.get(dst))
      Files.deleteIfExists(Paths.get(s"$dst/$name.parquet"))
      Files.move(part, Paths.get(s"$dst/$name.parquet"))
      graft.util.Fs.deleteRecursive(Paths.get(tmp))
    }
    def base(name: String): DataFrame = spark.read.parquet(s"$src/$name.parquet")

    writeSingleFile((0 until k).map { i =>
      val d = base("documents")
        .withColumn("doc_id", col("doc_id") + lit(i * Off))
      if (i == 0) d
      else d.withColumn("text",
        regexp_replace(col("text"), "(\\S+)", "$1" + s"q$i"))
    }.reduce(_ unionByName _), "documents")
    println(s"[scale10] documents x$k")

    writeSingleFile((0 until k).map { i =>
      val e = base("embeddings")
        .withColumn("vec_id", col("vec_id") + lit(i * Off))
      if (i == 0) e
      else e.withColumn("embedding",
        transform(col("embedding"),
          (x, j) => (x + lit(0.0007 * i) * sin(j.cast("double")))
            .cast("float")))
    }.reduce(_ unionByName _), "embeddings")
    println(s"[scale10] embeddings x$k")

    println(s"[scale10] done: $dst (k=$k from $src)")
    spark.stop()
  }
}
