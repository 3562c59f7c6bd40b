package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal column plumbing: image/audio/video payloads travel as
 * opaque `binary` columns plus a typed metadata struct; decode /
 * feature-extract runs batched per partition so a real decoder (JNI,
 * subprocess, native lib) amortizes setup per-partition, not per-row —
 * the Scala analog of a pandas-batch UDF.
 *
 * The decode step itself is STUBBED: this container has no image/audio
 * codecs, so [[FakeDecoder]] derives features deterministically from the
 * bytes. The Spark-side contract — schema, binary transport,
 * partition-batched iteration, feature schema — is real and tested, and
 * a production decoder drops in by replacing one function.
 *
 * Swap recipe (the ONLY changes a production build makes):
 *  1. Replace [[FakeDecoder]] with a class holding the native handles
 *     (e.g. `javax.imageio` for images, an ffmpeg JNI binding or a
 *     long-lived subprocess pipe for video/audio). Keep the per-
 *     partition construction in [[extractFeatures]] — that placement IS
 *     the amortization; never construct per row.
 *  2. Extend [[FeatureSchema]] with the real outputs (e.g. phash,
 *     embedding: array<float>); `decode` returns a matching Row. The
 *     surrounding plan (schema projection, partition batching, the
 *     downstream queries) is schema-driven and needs no edits.
 *  3. If the decoder is not thread-safe, guard with one instance per
 *     partition (already the case) — Spark runs one task per partition
 *     per thread, so no extra locking is needed.
 *  4. Failure policy: wrap `decode` and route undecodable payloads to a
 *     (doc_id, error) side output instead of throwing — at 100 TB some
 *     corrupt members are certain, and one bad byte stream must not
 *     kill a 256 MB task's work.
 */
object Multimodal {

  /** Metadata carried beside every media payload. */
  val MediaMetaSchema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false)))

  /** Feature row emitted by the (stub) decoder. */
  val FeatureSchema: StructType = StructType(Seq(
    StructField("n_bytes", LongType, nullable = false),
    StructField("first_byte", IntegerType, nullable = false),
    StructField("byte_sum", LongType, nullable = false),
    StructField("mean_luma", DoubleType, nullable = false)))

  /**
   * Pack a text table into the media shape: payload = utf-8 bytes,
   * metadata derived deterministically (synthetic stand-in for real
   * image dims — lets the pipeline run where no media files exist).
   */
  def packAsMedia(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("media_id"),
      encode(col(textCol), "UTF-8").as("payload"),
      struct(lit("fake/raw").as("format"),
        (lit(1) + pmod(length(col(textCol)), lit(640))).as("width"),
        (lit(1) + pmod(length(col(textCol)), lit(480))).as("height"),
        lit(1).as("n_frames")).as("meta"))

  /**
   * Frame sampling: treat the payload as fixed-size frames and keep
   * every `stride`-th one, starting at frame 0 (a video keyframe
   * sampler's Spark-side shape — pure column ops, `substring` on
   * binary; a real codec would replace the framing, not the plumbing).
   * Output adds `frames: array<binary>` and `n_frames_sampled`.
   */
  def sampleFrames(df: DataFrame, frameBytes: Int, stride: Int): DataFrame = {
    val nFrames = ceil(length(col("payload")) / lit(frameBytes.toDouble))
      .cast(IntegerType)
    df
      .withColumn("_n", nFrames)
      .withColumn("frames",
        transform(sequence(lit(0), greatest(col("_n") - 1, lit(0)), lit(stride)),
          i => substring(col("payload"), i * frameBytes + lit(1), lit(frameBytes))))
      .withColumn("n_frames_sampled", size(col("frames")))
      .drop("_n")
  }

  /** Resize stub: a real image op only touches pixels; the Spark-side
   * contract is metadata bookkeeping plus a payload transform seam.
   * Scales the metadata dims and (STUB) leaves bytes untouched. */
  def resizeStub(df: DataFrame, scalePercent: Int): DataFrame =
    df.withColumn("meta", col("meta")
      .withField("width", (col("meta.width") * scalePercent / 100).cast(IntegerType))
      .withField("height", (col("meta.height") * scalePercent / 100).cast(IntegerType)))

  /**
   * Batched feature extraction over the payload column. Runs via
   * `mapPartitions` on the underlying RDD: one decoder instance per
   * partition, rows streamed through it — the seam where a real codec
   * plugs in. Output: (media_id, features struct).
   */
  def extractFeatures(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("features", FeatureSchema, nullable = false)))
    val projected = df.select(col("media_id").cast(LongType), col("payload"))
    val rdd = projected.rdd.mapPartitions { rows =>
      val decoder = new FakeDecoder // per-partition init (amortized setup)
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        Row(id, decoder.decode(bytes))
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }
}

/**
 * STUB DECODER — deterministic fake standing in for a real image/audio
 * codec (none available in this container). Features are pure functions
 * of the payload bytes so the DuckDB oracle can reproduce them.
 */
final class FakeDecoder {
  def decode(bytes: Array[Byte]): Row = {
    val n = bytes.length.toLong
    val first = if (bytes.isEmpty) 0 else bytes(0) & 0xff
    var sum = 0L
    var i = 0
    while (i < bytes.length) { sum += (bytes(i) & 0xff); i += 1 }
    val luma = if (n == 0) 0.0 else sum.toDouble / n.toDouble
    Row(n, first, sum, luma)
  }
}
