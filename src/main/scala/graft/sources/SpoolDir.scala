package graft.sources

import org.apache.spark.sql.{DataFrame, DataFrameReader, SparkSession}
import org.apache.spark.sql.streaming.DataStreamReader
import org.apache.spark.sql.types.StructType

/**
 * S9 — SpoolDir source family (reference:
 * `connector_configs/spooldir_source.json:1-16`,
 * `실습수행/Spool Dir Source Connector 실습.md`): watch a directory for
 * files, schema inferred (`schema.generation.enabled=true`) or supplied;
 * finished files are archived (`finished.path`), malformed rows routed
 * to an error channel (`error.path` / `halt.on.error`).
 *
 * The reference lab runs the CSV connector
 * (`SpoolDirCsvSourceConnector`); the same public connector suite ships
 * JSON-lines (`SpoolDirJsonSourceConnector`) and line-delimited
 * variants, so [[Config.format]] covers `csv`, `json` (one JSON document
 * per line) and `text` (raw lines).
 *
 * Spark mapping: the matching file reader with PERMISSIVE +
 * corrupt-record column (halt-on-error=false) or FAILFAST (=true);
 * streaming variant uses `cleanSource=archive` + `sourceArchiveDir` for
 * finished.path and `maxFilesPerTrigger` for the poll batch size. At
 * scale the file listing is Spark's incremental file index; data never
 * funnels through a single reader.
 */
object SpoolDir {

  final case class Config(
      inputPath: String,
      format: String = "csv", // csv | json (JSON-lines) | text
      // None derives "*.<format>" — a fixed "*.csv" default next to
      // format="json" would silently match zero files and read an
      // empty frame that looks like an empty spool
      pattern: Option[String] = None,
      header: Boolean = true,
      schema: Option[StructType] = None, // None = infer (batch only)
      finishedPath: Option[String] = None,
      haltOnError: Boolean = false,
      maxFilesPerTrigger: Int = 3) { // tasks.max analog
    def globPattern: String = pattern.getOrElse(s"*.$format")
  }

  private def load(r: DataFrameReader, conf: Config): DataFrame =
    conf.format match {
      case "csv" => r.option("header", conf.header).csv(conf.inputPath)
      case "json" => r.json(conf.inputPath)
      case "text" => r.text(conf.inputPath)
      case other => throw new IllegalArgumentException(
        s"unsupported spool format '$other' (csv | json | text)")
    }

  private def loadStream(r: DataStreamReader, conf: Config): DataFrame =
    conf.format match {
      case "csv" => r.option("header", conf.header).csv(conf.inputPath)
      case "json" => r.json(conf.inputPath)
      case "text" => r.text(conf.inputPath)
      case other => throw new IllegalArgumentException(
        s"unsupported spool format '$other' (csv | json | text)")
    }

  /** One-shot batch read (the verification path). */
  def readBatch(spark: SparkSession, conf: Config): DataFrame = {
    var r = spark.read
      .option("pathGlobFilter", conf.globPattern)
      .option("mode", if (conf.haltOnError) "FAILFAST" else "PERMISSIVE")
    r = conf.schema match {
      case Some(s) => r.schema(s)
      case None => r.option("inferSchema", true)
    }
    load(r, conf)
  }

  /** S12 — schema-DRIFT spool read: a long-lived spool's producers add
   * columns over time, so one poll's files carry different column sets
   * — and a single inferred schema would mis-parse every older CSV
   * positionally. Each file reads under its OWN header/inferred
   * schema, then the frames union add-only (missing columns NULL-pad —
   * `auto.evolve`'s rule applied at the source seam, the same
   * `unionEvolve` the K4 sink path uses); a TYPE change on a shared
   * column refuses loudly, exactly like auto.evolve rejects in-place
   * type mutations. Files merge in name order (spools name files
   * monotonically) purely for determinism — this is a union, not a
   * merge, so order never changes the result set. Per-file schema
   * capture is a driver-side listing of headers (bytes read: one
   * header line per file); the DATA reads stay distributed. */
  def readBatchEvolving(spark: SparkSession, conf: Config): DataFrame = {
    val matcher = java.nio.file.FileSystems.getDefault
      .getPathMatcher(s"glob:${conf.globPattern}")
    val files = Option(new java.io.File(conf.inputPath).listFiles())
      .getOrElse(Array.empty)
      .filter(f => f.isFile && matcher.matches(f.toPath.getFileName))
      .map(_.getPath).sorted
    require(files.nonEmpty,
      s"empty spool: ${conf.inputPath}/${conf.globPattern}")
    files.map(f => readBatch(spark,
        conf.copy(inputPath = f, pattern = Some("*"))))
      .reduce { (a, b) =>
        b.schema.fields.foreach { f =>
          a.schema.fields.find(_.name == f.name).foreach { g =>
            require(g.dataType == f.dataType,
              s"schema drift on '${f.name}' is not add-only: " +
                s"${g.dataType} vs ${f.dataType}")
          }
        }
        graft.sinks.SchemaEvolution.unionEvolve(a, b)
      }
  }

  /** Streaming read — the reference's continuous spool. Schema is
   * mandatory (Spark streams cannot infer); finished files move to the
   * archive dir like `finished.path`. */
  def readStream(spark: SparkSession, conf: Config): DataFrame = {
    val s = conf.schema.getOrElse(throw new IllegalArgumentException(
      "streaming spool requires an explicit schema"))
    var r = spark.readStream
      .schema(s)
      .option("pathGlobFilter", conf.globPattern)
      .option("maxFilesPerTrigger", conf.maxFilesPerTrigger)
      .option("mode", if (conf.haltOnError) "FAILFAST" else "PERMISSIVE")
    conf.finishedPath.foreach { p =>
      r = r.option("cleanSource", "archive").option("sourceArchiveDir", p)
    }
    loadStream(r, conf)
  }
}
