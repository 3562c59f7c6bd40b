package graft

import org.apache.spark.sql.SparkSession

/**
 * Entry point for library users: a SparkSession builder with the
 * engine's recommended configuration. A user of the reference switches
 * by building a session here, declaring pipelines as JSON specs
 * ([[graft.pipeline.PipelineSpec]]), and registering them with an
 * [[graft.pipeline.Engine]]; ad-hoc processing uses the operator
 * packages directly on DataFrames.
 */
object Graft {

  /**
   * Recommended session builder. `shufflePartitions` should track the
   * cluster's total cores (set by the deployment, not hard-coded —
   * local runs size it to local cores; a 1000-executor cluster sets it
   * to a few x total cores and lets AQE coalesce down).
   */
  def sessionBuilder(appName: String = "graft",
                     shufflePartitions: Option[Int] = None): SparkSession.Builder = {
    val b = SparkSession.builder()
      .appName(appName)
      .config("spark.sql.session.timeZone", "UTC") // engine-wide UTC rule
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true") // runtime re-plan + skew split
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
    shufflePartitions.fold(b)(n => b.config("spark.sql.shuffle.partitions", n))
  }
}
