package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Salted equi-join for skewed keys. When one join key carries a
 * disproportionate share of rows, the shuffle sends that key's whole
 * volume to one reducer; AQE's skew-join split fixes sort-merge joins
 * at runtime, but explicit salting is still the tool when (a) AQE can't
 * see the skew (it emerges mid-pipeline), or (b) the build side must
 * replicate anyway.
 *
 * Mechanics: the large side gets a deterministic per-row salt in
 * [0, n); the small side replicates each row n times (one per salt);
 * joining on (key, salt) spreads each hot key over n reducers. Cost:
 * small side shuffles n copies — choose n ~ the skew factor, not more.
 */
object SkewJoin {

  /**
   * Inner equi-join of `large` and `small` on `key`, salted `n` ways.
   * Result equals `large.join(small, key)` exactly; only the physical
   * distribution changes.
   */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 n: Int): DataFrame = {
    val salted = large.withColumn("_salt",
      pmod(hash(large.columns.map(col).toIndexedSeq: _*), lit(n)))
    val replicated = small.withColumn("_salt",
      explode(sequence(lit(0), lit(n - 1))))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }
}
