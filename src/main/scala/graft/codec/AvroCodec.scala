package graft.codec

import java.io.ByteArrayOutputStream

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * C3 — Avro value codec (reference: AvroConverter + Schema Registry,
 * `실습수행/Schema Registry 기반의 Connector 구성 실습.md:90-200`).
 *
 * Offline there is no registry service, so the schema travels explicitly
 * (the registry's versioning/compat role is covered by
 * [[graft.sinks.SchemaEvolution]]'s diff/compat report — C4). Encoding
 * uses avro-core's GenericDatum machinery per partition: writer/reader
 * instances are created once per partition and stream rows through,
 * which is also how a registry-backed serializer would amortize at
 * scale.
 */
object AvroCodec {

  /** Spark StructType -> Avro record schema JSON (flat rows, the
   * reference's table-shaped records; nullable fields become
   * `["null", T]` unions). */
  def avroSchemaJson(s: StructType, name: String = "record0"): String = {
    def prim(dt: DataType): String = dt match {
      case IntegerType | ShortType | ByteType => "\"int\""
      case LongType => "\"long\""
      case FloatType => "\"float\""
      case DoubleType => "\"double\""
      case StringType => "\"string\""
      case BooleanType => "\"boolean\""
      case BinaryType => "\"bytes\""
      case DateType => """{"type":"int","logicalType":"date"}"""
      case TimestampType | TimestampNTZType =>
        """{"type":"long","logicalType":"timestamp-micros"}"""
      case d: DecimalType =>
        s"""{"type":"bytes","logicalType":"decimal","precision":${d.precision},"scale":${d.scale}}"""
      case other =>
        throw new IllegalArgumentException(s"no Avro mapping for $other")
    }
    val fields = s.fields.map { f =>
      val t = if (f.nullable) s"""["null",${prim(f.dataType)}]""" else prim(f.dataType)
      s"""{"name":"${f.name}","type":$t}"""
    }
    s"""{"type":"record","name":"$name","fields":[${fields.mkString(",")}]}"""
  }

  /** Encode the `value` struct column to Avro binary (replaces it with a
   * `binary` column). Tombstones (NULL value) stay NULL. */
  def encode(df: DataFrame, column: String = "value"): DataFrame = {
    val spark = df.sparkSession
    val structSchema = df.schema(column).dataType.asInstanceOf[StructType]
    val schemaJson = avroSchemaJson(structSchema)
    val inIdx = df.schema.fieldIndex(column)
    val outSchema = StructType(df.schema.fields.updated(inIdx,
      StructField(column, BinaryType, nullable = true)))
    val rdd = df.rdd.mapPartitions { rows =>
      val schema = new Schema.Parser().parse(schemaJson)
      val writer = new GenericDatumWriter[GenericRecord](schema)
      rows.map { r =>
        val vals = r.toSeq.toArray
        vals(inIdx) =
          if (r.isNullAt(inIdx)) null
          else {
            val rec = toAvro(r.getStruct(inIdx), structSchema, schema)
            val out = new ByteArrayOutputStream()
            val enc = EncoderFactory.get().binaryEncoder(out, null)
            writer.write(rec, enc)
            enc.flush()
            out.toByteArray
          }
        Row.fromSeq(vals.toIndexedSeq)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Decode an Avro binary column back to a struct with the given Spark
   * schema. NULL binary (tombstone) stays NULL. */
  def decode(df: DataFrame, structSchema: StructType,
             column: String = "value"): DataFrame = {
    val spark = df.sparkSession
    val schemaJson = avroSchemaJson(structSchema)
    val inIdx = df.schema.fieldIndex(column)
    val outSchema = StructType(df.schema.fields.updated(inIdx,
      StructField(column, structSchema, nullable = true)))
    val rdd = df.rdd.mapPartitions { rows =>
      val schema = new Schema.Parser().parse(schemaJson)
      val reader = new GenericDatumReader[GenericRecord](schema)
      rows.map { r =>
        val vals = r.toSeq.toArray
        vals(inIdx) =
          if (r.isNullAt(inIdx)) null
          else {
            val dec = DecoderFactory.get()
              .binaryDecoder(r.getAs[Array[Byte]](inIdx), null)
            fromAvro(reader.read(null, dec), structSchema)
          }
        Row.fromSeq(vals.toIndexedSeq)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Round-trip (encode then decode) — the C3 source->topic->sink path. */
  def roundTrip(df: DataFrame, column: String = "value"): DataFrame = {
    val structSchema = df.schema(column).dataType.asInstanceOf[StructType]
    decode(encode(df, column), structSchema, column)
  }

  private def toAvro(row: Row, st: StructType, avro: Schema): GenericRecord = {
    val rec = new GenericData.Record(avro)
    st.fields.zipWithIndex.foreach { case (f, i) =>
      val v: AnyRef =
        if (row.isNullAt(i)) null
        else f.dataType match {
          case IntegerType => Int.box(row.getInt(i))
          case ShortType => Int.box(row.getShort(i).toInt)
          case ByteType => Int.box(row.getByte(i).toInt)
          case LongType => Long.box(row.getLong(i))
          case FloatType => Float.box(row.getFloat(i))
          case DoubleType => Double.box(row.getDouble(i))
          case StringType => row.getString(i)
          case BooleanType => Boolean.box(row.getBoolean(i))
          case BinaryType => java.nio.ByteBuffer.wrap(row.getAs[Array[Byte]](i))
          case DateType => Int.box(row.getDate(i).toLocalDate.toEpochDay.toInt)
          case TimestampType =>
            Long.box(row.getTimestamp(i).toInstant.toEpochMilli * 1000L +
              row.getTimestamp(i).getNanos / 1000 % 1000)
          case TimestampNTZType =>
            val ldt = row.getAs[java.time.LocalDateTime](i)
            Long.box(ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
              ldt.getNano / 1000)
          case d: DecimalType =>
            java.nio.ByteBuffer.wrap(row.getDecimal(i)
              .setScale(d.scale).unscaledValue().toByteArray)
          case other =>
            throw new IllegalArgumentException(s"unsupported $other")
        }
      rec.put(f.name, v)
    }
    rec
  }

  private def fromAvro(rec: GenericRecord, st: StructType): Row = {
    val vals = st.fields.map { f =>
      val v = rec.get(f.name)
      if (v == null) null
      else f.dataType match {
        case StringType => v.toString // avro Utf8 -> String
        case BinaryType =>
          val bb = v.asInstanceOf[java.nio.ByteBuffer]
          val arr = new Array[Byte](bb.remaining()); bb.get(arr); arr
        case DateType =>
          java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(
            v.asInstanceOf[Int].toLong))
        case TimestampType =>
          val micros = v.asInstanceOf[Long]
          java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
            Math.floorDiv(micros, 1000000L),
            Math.floorMod(micros, 1000000L) * 1000L))
        case TimestampNTZType =>
          val micros = v.asInstanceOf[Long]
          java.time.LocalDateTime.ofEpochSecond(
            Math.floorDiv(micros, 1000000L),
            (Math.floorMod(micros, 1000000L) * 1000L).toInt,
            java.time.ZoneOffset.UTC)
        case d: DecimalType =>
          val bb = v.asInstanceOf[java.nio.ByteBuffer]
          val arr = new Array[Byte](bb.remaining()); bb.get(arr)
          new java.math.BigDecimal(new java.math.BigInteger(arr), d.scale)
        case _ => v
      }
    }
    Row.fromSeq(vals.toIndexedSeq)
  }
}
