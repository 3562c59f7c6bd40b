package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.codec.JsonEnvelope
import graft.model.Connect

class JsonEnvelopeSpec extends SparkSpec {
  import spark.implicits._

  private def frame() = Connect.toConnectFrame(
    Seq((1, "a"), (2, "b")).toDF("id", "name"), Seq("id"), "t", "id")

  test("C1 envelope carries schema member and wire payload") {
    val f = frame()
    val schema = f.schema("value").dataType
    val wire = f.filter(col("key.id") === 1)
      .select(JsonEnvelope.encodeWithSchema(col("value"), schema))
      .head().getString(0)
    assert(wire.startsWith("""{"schema":{"type":"struct""""))
    assert(wire.contains(""""payload":{"id":1,"name":"a"}"""))
  }

  test("C1 tombstone encodes as SQL NULL, not the string null") {
    val f = frame().withColumn("value", when(col("key.id") === 1, col("value")))
    val schema = f.schema("value").dataType
    val out = f.select(JsonEnvelope.encodeWithSchema(col("value"), schema).as("w"))
    assert(out.filter(col("w").isNull).count() == 1)
  }

  test("decode sniffs the schema member, not the payload field") {
    // a BARE message that happens to contain a 'payload' field
    val schema = StructType(Seq(StructField("payload", StringType),
      StructField("x", IntegerType)))
    val bare = Seq("""{"payload":"inner","x":5}""").toDF("w")
    val got = bare.select(JsonEnvelope.decode(col("w"), schema).as("v"))
      .select("v.payload", "v.x").head()
    assert(got.getString(0) == "inner" && got.getInt(1) == 5)
    // an ENVELOPED message with a JSON-null payload is a tombstone
    val env = Seq("""{"schema":{"type":"struct","fields":[]},"payload":null}""").toDF("w")
    assert(env.select(JsonEnvelope.decode(col("w"), schema)).head().isNullAt(0))
  }

  test("logical types round-trip through the wire form") {
    val df = Seq(
      (1, BigDecimal("1234.56"), "2020-03-15", "2020-03-15 12:34:56.789"),
      (2, BigDecimal("-0.03"), "1969-12-31", "1969-12-31 23:59:59.999"),
      (3, BigDecimal("0.00"), "1970-01-01", "1970-01-01 00:00:00.000"))
      .toDF("id", "dec", "d", "ts")
      .select(col("id"), col("dec").cast(DecimalType(10, 2)).as("dec"),
        col("d").cast(DateType).as("d"),
        col("ts").cast(TimestampType).as("ts"),
        col("ts").cast(TimestampNTZType).as("ntz"))
    val f = Connect.toConnectFrame(df, Seq("id"), "t", "id")
    val schema = f.schema("value").dataType

    val wire = f.filter(col("key.id") === 1)
      .select(JsonEnvelope.encodeWithSchema(col("value"), schema))
      .head().getString(0)
    // epoch-days int32, epoch-millis int64, base64 unscaled bytes
    assert(wire.contains(""""d":18336"""))
    assert(wire.contains(""""ts":1584275696789"""))
    assert(wire.contains(""""dec":"AeJA"""")) // BigInteger(123456).toByteArray

    val rt = JsonEnvelope.roundTrip(f).select("value.*")
    assert(rt.exceptAll(df).count() == 0 && df.exceptAll(rt).count() == 0)
    val rts = JsonEnvelope.roundTripSchemaless(f).select("value.*")
    assert(rts.exceptAll(df).count() == 0 && df.exceptAll(rts).count() == 0)
  }

  test("maps with temporal keys round-trip (wire keys are JSON strings)") {
    val df = Seq(1).toDF("id")
      .select(col("id"),
        map(lit("2020-03-15 00:00:00").cast(TimestampType), lit(7)).as("m"))
    val f = Connect.toConnectFrame(df, Seq("id"), "t", "id")
    val rt = JsonEnvelope.roundTrip(f).select("value.*")
    val got = rt.select(map_keys(col("m")).getItem(0).cast("string"),
      map_values(col("m")).getItem(0)).head()
    assert(got.getString(0) == "2020-03-15 00:00:00")
    assert(got.getInt(1) == 7)
  }

  test("decimals wider than 18 digits are rejected loudly, not corrupted") {
    intercept[IllegalArgumentException](
      JsonEnvelope.wireType(DecimalType(38, 2)))
    intercept[IllegalArgumentException](
      JsonEnvelope.connectSchemaJson(DecimalType(20, 0)))
  }

  test("connect schema JSON matches the reference wire shape") {
    // reference proof: {"schema":{"type":"int32","optional":false},"payload":3}
    assert(JsonEnvelope.connectSchemaJson(IntegerType) ==
      """{"type":"int32","optional":false}""")
    assert(JsonEnvelope.connectSchemaJson(DecimalType(10, 2)) ==
      """{"type":"bytes","name":"org.apache.kafka.connect.data.Decimal","parameters":{"scale":"2"},"optional":false}""")
  }
}
