package graft.codec

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * C1/C2 — the Connect `JsonConverter` pair:
 *
 *  - `schemas.enable=true` (default): every message is a
 *    `{"schema": <connect schema>, "payload": <row>}` envelope; wire proof
 *    of the shape incl. a schema'd tombstone key:
 *    `{"schema":{"type":"int32","optional":false},"payload":3}`
 *    (`실습수행/JDBC Sink Connector 실습.md:349`).
 *  - `schemas.enable=false`: bare JSON payload
 *    (`connector_configs/mysql_jdbc_om_source_noschema.json:22-25`).
 *
 * Encoding composes `to_json` (codegen'd) with a constant schema header —
 * the schema member is per-plan constant, so at 100 TB the only per-row
 * work is the payload serialization Spark would do anyway.
 */
object JsonEnvelope {

  /** Spark type -> Connect wire schema JSON (SURVEY.md §1.3 mapping). */
  def connectSchemaJson(dt: DataType, optional: Boolean = false): String = {
    val opt = s""""optional":$optional"""
    dt match {
      case ByteType => s"""{"type":"int8",$opt}"""
      case ShortType => s"""{"type":"int16",$opt}"""
      case IntegerType => s"""{"type":"int32",$opt}"""
      case LongType => s"""{"type":"int64",$opt}"""
      case FloatType => s"""{"type":"float",$opt}"""
      case DoubleType => s"""{"type":"double",$opt}"""
      case BooleanType => s"""{"type":"boolean",$opt}"""
      case StringType => s"""{"type":"string",$opt}"""
      case BinaryType => s"""{"type":"bytes",$opt}"""
      case d: DecimalType =>
        s"""{"type":"bytes","name":"org.apache.kafka.connect.data.Decimal","parameters":{"scale":"${d.scale}"},$opt}"""
      case DateType =>
        s"""{"type":"int32","name":"org.apache.kafka.connect.data.Date",$opt}"""
      case TimestampType | TimestampNTZType =>
        s"""{"type":"int64","name":"org.apache.kafka.connect.data.Timestamp",$opt}"""
      case s: StructType =>
        val fields = s.fields.map { f =>
          val inner = connectSchemaJson(f.dataType, f.nullable)
          // splice the field name into the member schema
          inner.patch(1, s""""field":"${f.name}",""", 0)
        }
        s"""{"type":"struct","fields":[${fields.mkString(",")}],$opt}"""
      case a: ArrayType =>
        s"""{"type":"array","items":${connectSchemaJson(a.elementType, a.containsNull)},$opt}"""
      case m: MapType =>
        s"""{"type":"map","keys":${connectSchemaJson(m.keyType)},"values":${connectSchemaJson(m.valueType, m.valueContainsNull)},$opt}"""
      case other =>
        throw new IllegalArgumentException(s"no Connect mapping for $other")
    }
  }

  /** Encode a struct column as a schema'd envelope string
   * (`schemas.enable=true`). NULL input (tombstone) encodes as SQL NULL —
   * an absent Kafka value, not the string "null". */
  def encodeWithSchema(c: Column, schema: DataType): Column = {
    val header = lit(s"""{"schema":${connectSchemaJson(schema)},"payload":""")
    when(c.isNotNull, concat(header, to_json(c), lit("}")))
  }

  /** Encode bare (`schemas.enable=false`). */
  def encodeSchemaless(c: Column): Column = when(c.isNotNull, to_json(c))

  /** Decode an envelope string: payload parsed with the given schema.
   * Works for both enveloped and bare messages (bare JSON has no
   * `$.payload`, so we fall back to the whole document). */
  def decode(c: Column, schema: DataType): Column = {
    val payload = coalesce(get_json_object(c, "$.payload"), c)
    from_json(payload, schema)
  }

  /** Round-trip a connect frame's `value` through the envelope (identity
   * up to schema nullability) — the C1 source->topic->sink path. */
  def roundTrip(df: DataFrame): DataFrame = {
    val schema = df.schema("value").dataType
    df.withColumn("_wire", encodeWithSchema(col("value"), schema))
      .withColumn("value", decode(col("_wire"), schema))
      .drop("_wire")
  }
}
