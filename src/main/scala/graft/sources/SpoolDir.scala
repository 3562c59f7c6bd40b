package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/**
 * S9 — SpoolDir CSV source (reference:
 * `connector_configs/spooldir_source.json:1-16`,
 * `실습수행/Spool Dir Source Connector 실습.md`): watch a directory for
 * CSV files, header row gives field names, schema inferred
 * (`schema.generation.enabled=true`) or supplied; finished files are
 * archived (`finished.path`), malformed rows routed to an error channel
 * (`error.path` / `halt.on.error`).
 *
 * Spark mapping: `csv` reader with PERMISSIVE + corrupt-record column
 * (halt-on-error=false) or FAILFAST (=true); streaming variant uses
 * `cleanSource=archive` + `sourceArchiveDir` for finished.path and
 * `maxFilesPerTrigger` for the poll batch size. At scale the file
 * listing is Spark's incremental file index; data never funnels through
 * a single reader.
 */
object SpoolDir {

  final case class Config(
      inputPath: String,
      pattern: String = "*.csv",
      header: Boolean = true,
      schema: Option[StructType] = None, // None = infer (batch only)
      finishedPath: Option[String] = None,
      haltOnError: Boolean = false,
      maxFilesPerTrigger: Int = 3) // tasks.max analog

  /** One-shot batch read (the verification path). */
  def readBatch(spark: SparkSession, conf: Config): DataFrame = {
    var r = spark.read
      .option("header", conf.header)
      .option("pathGlobFilter", conf.pattern)
      .option("mode", if (conf.haltOnError) "FAILFAST" else "PERMISSIVE")
    r = conf.schema match {
      case Some(s) => r.schema(s)
      case None => r.option("inferSchema", true)
    }
    r.csv(conf.inputPath)
  }

  /** Streaming read — the reference's continuous spool. Schema is
   * mandatory (Spark streams cannot infer); finished files move to the
   * archive dir like `finished.path`. */
  def readStream(spark: SparkSession, conf: Config): DataFrame = {
    val s = conf.schema.getOrElse(throw new IllegalArgumentException(
      "streaming spool requires an explicit schema"))
    var r = spark.readStream
      .schema(s)
      .option("header", conf.header)
      .option("pathGlobFilter", conf.pattern)
      .option("maxFilesPerTrigger", conf.maxFilesPerTrigger)
      .option("mode", if (conf.haltOnError) "FAILFAST" else "PERMISSIVE")
    conf.finishedPath.foreach { p =>
      r = r.option("cleanSource", "archive").option("sourceArchiveDir", p)
    }
    r.csv(conf.inputPath)
  }
}
