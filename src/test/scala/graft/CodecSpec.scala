package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.codec.AvroCodec
import graft.model.Connect
import graft.sources.SpoolDir

/** Avro codec + SpoolDir source specs. */
class CodecSpec extends SparkSpec {
  import spark.implicits._

  test("avro round-trips primitives, temporals, and decimals") {
    val df = Seq(
      (1, "a", 1.5, true, "2020-03-15", "2020-03-15 12:34:56.789", BigDecimal("12.34")),
      (2, "b", -0.25, false, "1969-12-31", "1969-12-31 23:59:59.999", BigDecimal("-0.01")))
      .toDF("id", "s", "d", "b", "dt", "ts", "dec")
      .select(col("id"), col("s"), col("d"), col("b"),
        col("dt").cast(DateType).as("dt"),
        col("ts").cast(TimestampType).as("ts"),
        col("ts").cast(TimestampNTZType).as("ntz"),
        col("dec").cast(DecimalType(10, 2)).as("dec"))
    val frame = Connect.toConnectFrame(df, Seq("id"), "t", "id")
    val rt = AvroCodec.roundTrip(frame).select("value.*")
    assert(rt.exceptAll(df).count() == 0 && df.exceptAll(rt).count() == 0)
  }

  test("avro keeps tombstones as NULL binary and NULL struct") {
    val df = Seq((1, "a"), (2, "b")).toDF("id", "v")
    val frame = Connect.toConnectFrame(df, Seq("id"), "t", "id")
      .withColumn("value", when(col("key.id") === 1, col("value")))
    val enc = AvroCodec.encode(frame)
    assert(enc.schema("value").dataType == BinaryType)
    assert(enc.filter(col("value").isNull).count() == 1)
    val dec = AvroCodec.decode(enc, df.schema)
    assert(dec.filter(col("value").isNull).count() == 1)
    assert(dec.filter(col("value.id") === 1).count() == 1)
  }

  test("avro schema JSON: nullable fields become null unions") {
    val s = StructType(Seq(
      StructField("a", IntegerType, nullable = false),
      StructField("b", StringType, nullable = true)))
    val json = AvroCodec.avroSchemaJson(s)
    assert(json.contains(""""name":"a","type":"int""""))
    assert(json.contains(""""name":"b","type":["null","string"]"""))
  }

  test("spooldir batch read infers schema from headered CSV") {
    val dir = Files.createTempDirectory("spool").toString
    Files.writeString(Paths.get(dir, "a.csv"), "id,name\n1,x\n2,y")
    val out = SpoolDir.readBatch(spark, SpoolDir.Config(inputPath = dir))
    assert(out.schema("id").dataType == IntegerType)
    assert(out.collect().map(r => (r.getInt(0), r.getString(1))).toSet ==
      Set((1, "x"), (2, "y")))
  }

  test("spooldir error channel: PERMISSIVE nulls bad rows, FAILFAST halts") {
    val dir = Files.createTempDirectory("spoolerr").toString
    Files.writeString(Paths.get(dir, "a.csv"), "id,name\n1,x\nnotanint,y\n3,z")
    val schema = StructType(Seq(StructField("id", IntegerType),
      StructField("name", StringType)))
    // halt.on.error=false: malformed row surfaces as nulls, rest flow
    val permissive = SpoolDir.readBatch(spark,
      SpoolDir.Config(inputPath = dir, schema = Some(schema)))
    assert(permissive.count() == 3)
    assert(permissive.filter(col("id").isNull).count() == 1)
    // halt.on.error=true: the connector FAILS, like the reference's
    // missing-error-path lab (Spool Dir 실습.md:76-81)
    intercept[org.apache.spark.SparkException] {
      SpoolDir.readBatch(spark, SpoolDir.Config(inputPath = dir,
        schema = Some(schema), haltOnError = true)).collect()
    }
  }

  test("spooldir JSON-lines: inference, and the corrupt-record error channel") {
    val dir = Files.createTempDirectory("spooljson").toString
    Files.writeString(Paths.get(dir, "a.json"),
      """{"id": 1, "name": "x"}
        |{"id": 2, "name": "y"}""".stripMargin)
    // batch inference, no schema declared
    val inferred = SpoolDir.readBatch(spark, SpoolDir.Config(
      inputPath = dir, format = "json", pattern = Some("*.json")))
    assert(inferred.schema("id").dataType == LongType)
    assert(inferred.count() == 2)
    // a torn line routes to the corrupt-record channel, rest flow
    Files.writeString(Paths.get(dir, "b.json"), """{"id": 3, "na""")
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("name", StringType),
      StructField("_corrupt_record", StringType)))
    // corrupt-record-only projections over raw JSON require caching the
    // parsed frame first (Spark guards against the double-parse trap)
    val read = SpoolDir.readBatch(spark, SpoolDir.Config(inputPath = dir,
      format = "json", pattern = Some("*.json"), schema = Some(schema))).cache()
    assert(read.filter(col("_corrupt_record").isNull).count() == 2)
    assert(read.filter(col("_corrupt_record").isNotNull).count() == 1)
    // unknown formats fail loudly at config time
    intercept[IllegalArgumentException] {
      SpoolDir.readBatch(spark, SpoolDir.Config(inputPath = dir, format = "xml"))
    }
  }

  test("spooldir streaming archives finished files (finished.path)") {
    val base = Files.createTempDirectory("spoolstream")
    val in = base.resolve("in"); val fin = base.resolve("done")
    Files.createDirectories(in)
    Files.writeString(in.resolve("a.csv"), "id,name\n1,x")
    val schema = StructType(Seq(StructField("id", IntegerType),
      StructField("name", StringType)))
    val stream = SpoolDir.readStream(spark, SpoolDir.Config(
      inputPath = in.toString, schema = Some(schema),
      finishedPath = Some(fin.toString)))
    val q = stream.writeStream.format("memory")
      .queryName("spool_out")
      .option("checkpointLocation", base.resolve("ckpt").toString)
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table("spool_out").count() == 1)
      // cleanSource=archive moves consumed files under the archive dir
      // (asynchronously, within a couple of batches)
      Files.writeString(in.resolve("b.csv"), "id,name\n2,y")
      q.processAllAvailable()
      assert(spark.table("spool_out").count() == 2)
      val archived = (0 to 50).exists { _ =>
        val found = Files.exists(fin) &&
          Files.walk(fin).anyMatch(p => p.toString.endsWith("a.csv"))
        if (!found) Thread.sleep(100)
        found
      }
      assert(archived, "a.csv was not archived to finished.path")
    } finally q.stop()
  }
}
