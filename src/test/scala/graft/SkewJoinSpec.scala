package graft

import org.apache.spark.sql.functions._
import graft.operators.SkewJoin

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("salted join equals the plain join on skewed data") {
    // 90% of rows share key 1 (the skew), the rest spread over 2-10
    val large = (1 to 1000).map(i => (if (i <= 900) 1 else i % 9 + 2, s"r$i"))
      .toDF("k", "v")
    val small = (1 to 10).map(i => (i, s"dim$i")).toDF("k", "d")
    val plain = large.join(small, Seq("k"))
    val salted = SkewJoin.saltedJoin(large, small, "k", n = 8)
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)
    // the salt actually spreads the hot key over multiple groups
    val groups = large.withColumn("_salt",
        pmod(hash(large.columns.map(col).toIndexedSeq: _*), lit(8)))
      .filter(col("k") === 1).select("_salt").distinct().count()
    assert(groups > 1)
  }
}
