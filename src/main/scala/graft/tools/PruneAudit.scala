package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Bench-consumer audit: for each batch-shaped gate, time `count()`
  * (Bench's default consumer — Catalyst prunes projections and
  * aggregate expressions the row count doesn't need) vs a checksum
  * aggregate over every output column (nothing prunable). A large
  * ratio at a large SF means the gate's cost lives in pruned columns
  * and its bench number is meaningless under count() — those gates go
  * on Bench's `consumeAll` list. The r12 run at sf0.1 is archived in
  * `bench/prune_audit_r12.csv`; re-run after adding gates whose cost
  * is a projection or a non-key aggregate. */
object PruneAudit {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // optional args restrict the audit to the named gates (local
    // iteration after adding gates); no args = the full batch families
    val names =
      if (args.nonEmpty) args.toSeq.filter(graft.SparkEntry.queries.contains).sorted
      else graft.SparkEntry.queries.keys.toSeq.sorted
        .filter(n => n.matches("^(q|x|j|d|e|m)\\d.*"))
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    println("name,count_sec,consume_sec,ratio")
    names.foreach { n =>
      try {
        val build = graft.SparkEntry.queries(n)
        def consume(df: org.apache.spark.sql.DataFrame): Unit =
          df.select(expr(
            s"bit_xor(xxhash64(struct(${df.columns.map(c => s"`$c`").mkString(",")})))"))
            .collect()
        // warmup both paths
        build(spark, dir).count()
        consume(build(spark, dir))
        val tc = time(build(spark, dir).count())
        val ta = time(consume(build(spark, dir)))
        println(f"$n,$tc%.3f,$ta%.3f,${ta / math.max(tc, 1e-9)}%.2f")
      } catch { case e: Throwable =>
        println(s"$n,ERR,${e.getClass.getSimpleName},0")
      }
    }
    spark.stop()
  }
}
