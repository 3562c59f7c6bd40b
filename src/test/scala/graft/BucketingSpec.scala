package graft

import org.apache.spark.sql.functions._

/** Bucketed co-located join: pre-bucketing both tables on the join key
  * removes the per-query shuffle — the 100 TB answer to repeated joins
  * on the same key (SURVEY.md §2.6 / optimizer table). */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("join of tables bucketed on the key plans without a shuffle") {
    val facts = (1 to 1000).map(i => (i % 50, s"f$i")).toDF("k", "f")
    val dims = (0 until 50).map(i => (i, s"d$i")).toDF("k", "d")
    facts.write.mode("overwrite").bucketBy(8, "k").saveAsTable("b_facts")
    dims.write.mode("overwrite").bucketBy(8, "k").saveAsTable("b_dims")
    // AQE would broadcast the tiny dim; force the shuffle-sensitive path
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_facts").join(spark.table("b_dims"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")
      assert(joined.count() == 1000)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS b_facts")
      spark.sql("DROP TABLE IF EXISTS b_dims")
    }
  }
}
