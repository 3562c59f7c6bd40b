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

  test("NTZ wire values are session-TZ-independent (UTC epoch of the wall-clock)") {
    // a non-UTC session must produce the SAME wire int64 as UTC: the
    // Connect contract is "epoch millis of the wall-clock read as UTC",
    // not "epoch millis shifted by whatever zone the encoder ran in"
    val scoped = spark.newSession()
    scoped.conf.set("spark.sql.session.timeZone", "Asia/Seoul")
    import scoped.implicits._
    val df = Seq((1, "2020-03-15 12:34:56.789")).toDF("id", "ts")
      .select(col("id"), col("ts").cast(TimestampNTZType).as("ntz"))
    val f = Connect.toConnectFrame(df, Seq("id"), "t", "id")
    val schema = f.schema("value").dataType
    val wire = f.select(JsonEnvelope.encodeWithSchema(col("value"), schema))
      .head().getString(0)
    assert(wire.contains(""""ntz":1584275696789"""),
      s"Seoul-session NTZ wire value shifted: $wire")
    // and the decode inverts it in the same non-UTC session
    val rt = JsonEnvelope.roundTrip(f).select("value.*")
    assert(rt.exceptAll(df).count() == 0 && df.exceptAll(rt).count() == 0)
  }

  test("NTZ wire values survive DST transitions in the session zone") {
    // the old cast+from_utc_timestamp formulation resolved the session
    // offset at two different instants; near a DST transition that
    // mis-encodes by the DST delta. 02:30 on 2021-03-14 does not even
    // EXIST as a New York local time — an NTZ wall-clock is zone-free
    // and must still encode as its as-UTC epoch, exactly
    val scoped = spark.newSession()
    scoped.conf.set("spark.sql.session.timeZone", "America/New_York")
    import scoped.implicits._
    val df = Seq(
      (1, "2021-03-14 02:30:00.000"), // inside the spring-forward gap
      (2, "2021-11-07 01:30:00.000"), // the fall-back ambiguous hour
      (3, "2021-03-14 03:00:00.000")) // just past the gap
      .toDF("id", "ts")
      .select(col("id"), col("ts").cast(TimestampNTZType).as("ntz"))
    val f = Connect.toConnectFrame(df, Seq("id"), "t", "id")
    val schema = f.schema("value").dataType
    val wires = f.orderBy("key.id")
      .select(JsonEnvelope.encodeWithSchema(col("value"), schema))
      .collect().map(_.getString(0))
    assert(wires(0).contains(""""ntz":1615689000000"""), // 02:30Z epoch
      s"spring-forward gap wall-clock mis-encoded: ${wires(0)}")
    assert(wires(1).contains(""""ntz":1636248600000"""),
      s"fall-back wall-clock mis-encoded: ${wires(1)}")
    assert(wires(2).contains(""""ntz":1615690800000"""),
      s"post-gap wall-clock mis-encoded: ${wires(2)}")
    val rt = JsonEnvelope.roundTrip(f).select("value.*")
    assert(rt.exceptAll(df).count() == 0 && df.exceptAll(rt).count() == 0)
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

  test("precision-38 decimals round-trip through the unscaled-bytes leg") {
    // unscaled values far beyond int64, both signs, plus a value whose
    // top unscaled bit is set (the two's-complement 00-pad case)
    val vals = Seq(
      "12345678901234567890123456789012.345678",
      "-99999999999999999999999999999999.999999",
      "0.000001", "-0.000001", "0.000000",
      "92233720368547758079223372036854.775807")
    val df = vals.zipWithIndex
      .map { case (v, i) => (i, v) }.toDF("id", "s")
      .select(col("id"), col("s").cast(DecimalType(38, 6)).as("wide"))
    val f = Connect.toConnectFrame(df, Seq("id"), "t", "id")
    val rt = JsonEnvelope.roundTrip(f).select("value.*")
    assert(rt.exceptAll(df).count() == 0 && df.exceptAll(rt).count() == 0)
    // the wire bytes are BigInteger.toByteArray of the unscaled value
    // (base64 in the JSON) — same encoding the <=18 long leg produces
    val schema = f.schema("value").dataType
    val wire = f.filter(col("key.id") === 2)
      .select(JsonEnvelope.encodeWithSchema(col("value"), schema))
      .head().getString(0)
    val b64 = java.util.Base64.getEncoder.encodeToString(
      new java.math.BigInteger("1").toByteArray)
    assert(wire.contains(s""""wide":"$b64""""), s"unexpected wire: $wire")
  }

  test("narrow and wide decimal legs agree on the wire bytes") {
    // the same numeric value encoded at precision 18 (long leg) and 38
    // (BigInteger leg) must produce IDENTICAL base64 — the precision
    // split is an implementation detail, never a wire-format change
    val df = Seq((1, "-1234567890.12"), (2, "98765.43"), (3, "0.07"))
      .toDF("id", "s")
      .select(col("id"),
        col("s").cast(DecimalType(18, 2)).as("narrow"),
        col("s").cast(DecimalType(38, 2)).as("wide"))
    val f = Connect.toConnectFrame(df, Seq("id"), "t", "id")
    val schema = f.schema("value").dataType
    val wires = f.select(JsonEnvelope.encodeWithSchema(col("value"), schema))
      .collect().map(_.getString(0))
    wires.foreach { w =>
      val n = """"narrow":"([^"]*)"""".r.findFirstMatchIn(w).get.group(1)
      val wd = """"wide":"([^"]*)"""".r.findFirstMatchIn(w).get.group(1)
      assert(n == wd, s"narrow/wide wire bytes diverge: $w")
    }
  }

  test("connect schema JSON matches the reference wire shape") {
    // reference proof: {"schema":{"type":"int32","optional":false},"payload":3}
    assert(JsonEnvelope.connectSchemaJson(IntegerType) ==
      """{"type":"int32","optional":false}""")
    assert(JsonEnvelope.connectSchemaJson(DecimalType(10, 2)) ==
      """{"type":"bytes","name":"org.apache.kafka.connect.data.Decimal","parameters":{"scale":"2"},"optional":false}""")
  }

  test("classified decode: every corruption class routes, tombstones never do") {
    import org.apache.spark.sql.Row
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType)))
    val goodWire = """{"schema":{"type":"struct","fields":[]},"payload":{"id":7,"name":"x"}}"""
    val cases = Seq(
      (1L, goodWire, null),                                      // clean
      (2L, null, null),                                          // absent value = tombstone
      (3L, """{"schema":{},"payload":null}""", null),            // explicit null payload = tombstone
      (4L, goodWire.take(30), "malformed_envelope"),             // truncated JSON
      (5L, """{"notschema":1}""", "malformed_envelope"),         // no schema member
      (6L, """{"schema":{}}""", "missing_payload"),              // payload absent
      (7L, """{"schema":{},"payload":42}""", "payload_parse"),   // wrong payload type
      // a NESTED "payload": null (inside the schema member) must NOT
      // read as a tombstone: detection is top-level key presence, not
      // a substring match over the frame text
      (8L, """{"schema":{"default":{"payload":null}}}""", "missing_payload"))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(cases.map(c => Row(c._1, c._2))),
      StructType(Seq(StructField("k", LongType), StructField("value", StringType))))
    val out = df.withColumn("_c", JsonEnvelope.decodeClassified(col("value"), schema))
      .select(col("k"), col("_c.error_class"), col("_c.value.id"))
      .collect().map(r => r.getLong(0) ->
        ((Option(r.getString(1)), if (r.isNullAt(2)) None else Some(r.getLong(2))))).toMap
    cases.foreach { case (k, _, want) =>
      assert(out(k)._1 == Option(want), s"case $k") }
    assert(out(1L)._2.contains(7L))  // clean row decodes
    assert(out(2L)._2.isEmpty && out(3L)._2.isEmpty) // tombstones: null value, no error
  }

  test("routeDlq splits good and failed rows, DLQ carries context headers") {
    import org.apache.spark.sql.Row
    val schema = StructType(Seq(StructField("id", LongType)))
    val frame = Seq(
      (1L, """{"schema":{},"payload":{"id":1}}"""),
      (2L, "garbage"))
      .toDF("k", "value")
      .select(struct(col("k")).as("key"), col("value"),
        lit("om.t").as("topic"), col("k").as("seq"))
    val (good, dlq) = JsonEnvelope.routeDlq(frame, schema, "dlq.om.t")
    assert(good.count() == 1 && good.head().getAs[Row]("value").getLong(0) == 1L)
    val d = dlq.head()
    assert(d.getAs[String]("topic") == "dlq.om.t")
    assert(d.getAs[String]("raw_value") == "garbage")
    val ctx = d.getAs[Row]("error_context")
    assert(ctx.getAs[String]("source_topic") == "om.t")
    assert(ctx.getAs[String]("error_class") == "malformed_envelope")
    assert(ctx.getAs[String]("stage") == "VALUE_CONVERTER")
  }
}
