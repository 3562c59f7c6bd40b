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
      // nullable fields carry "default": null — required for Avro schema
      // RESOLUTION (a reader with an added optional field must be able
      // to fill it when the writer schema lacks it)
      if (f.nullable)
        s"""{"name":"${f.name}","type":["null",${prim(f.dataType)}],"default":null}"""
      else s"""{"name":"${f.name}","type":${prim(f.dataType)}}"""
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

  // ---- Confluent wire framing (magic byte + schema id) -------------------

  /** Prefix Avro payloads with the Confluent wire header — magic byte
   * `0x00` then the registry schema id as a big-endian int32 — after
   * registering the frame's schema under `subject` (the AvroConverter's
   * serialize path, `실습수행/Schema Registry 기반의 Connector 구성
   * 실습.md:90-146`). Registration is idempotent and compat-gated by
   * the registry's level for the subject. */
  def encodeFramed(df: DataFrame, registry: SchemaRegistry, subject: String,
                   column: String = "value"): DataFrame = {
    val structSchema = df.schema(column).dataType.asInstanceOf[StructType]
    val reg = registry.register(subject, structSchema)
      .fold(err => throw new IllegalStateException(err), identity)
    val header = java.nio.ByteBuffer.allocate(5)
      .put(0: Byte).putInt(reg.id).array()
    encode(df, column).withColumn(column,
      when(col(column).isNotNull, concat(lit(header), col(column))))
  }

  /**
   * Decode Confluent-framed payloads: the embedded id selects the
   * WRITER schema from the registry, the subject's LATEST version is
   * the READER schema, and Avro schema resolution bridges them — an
   * added optional reader field fills with its null default, a field
   * the reader dropped is skipped. This is exactly how the sink side
   * keeps consuming while producers run older (or newer) versions.
   */
  def decodeFramed(df: DataFrame, registry: SchemaRegistry, subject: String,
                   column: String = "value"): DataFrame = {
    val reader = registry.latest(subject).getOrElse(
      throw new NoSuchElementException(s"no versions for $subject")).schema
    // driver-side snapshot of id -> writer avro json (serializable)
    val writers: Map[Int, String] = registry.versions(subject)
      .map(r => r.id -> avroSchemaJson(r.schema)).toMap
    decodeFramedWith(df, writers, reader, column)
  }

  /** [[decodeFramed]] with the schemas already RESOLVED — the entry
   * point for registry clients that looked them up over the wire (the
   * REST shim's [[RegistryHttpClient.writerSchemas]]): `writers` maps
   * each embedded schema id to its Avro JSON, `reader` is the consumer
   * schema the rows resolve into. */
  def decodeFramedWith(df: DataFrame, writers: Map[Int, String],
                       reader: StructType,
                       column: String = "value"): DataFrame = {
    val spark = df.sparkSession
    val readerJson = avroSchemaJson(reader)
    val inIdx = df.schema.fieldIndex(column)
    val outSchema = StructType(df.schema.fields.updated(inIdx,
      StructField(column, reader, nullable = true)))
    val rdd = df.rdd.mapPartitions { rows =>
      // one fresh Parser per parse: all record schemas share the name
      // "record0", and a reused Parser rejects the "redefinition"
      val readerSchema = new Schema.Parser().parse(readerJson)
      val writerSchemas = scala.collection.mutable.HashMap.empty[Int, Schema]
      val readers = scala.collection.mutable.HashMap
        .empty[Int, GenericDatumReader[GenericRecord]]
      rows.map { r =>
        val vals = r.toSeq.toArray
        vals(inIdx) =
          if (r.isNullAt(inIdx)) null
          else {
            val bytes = r.getAs[Array[Byte]](inIdx)
            require(bytes.length >= 5 && bytes(0) == 0,
              s"not a Confluent-framed payload (magic=${bytes.headOption})")
            val id = java.nio.ByteBuffer.wrap(bytes, 1, 4).getInt
            val rd = readers.getOrElseUpdate(id, {
              val w = writerSchemas.getOrElseUpdate(id,
                new Schema.Parser().parse(writers.getOrElse(id,
                  throw new NoSuchElementException(
                    s"schema id $id not in registry subject"))))
              new GenericDatumReader[GenericRecord](w, readerSchema)
            })
            val dec = DecoderFactory.get()
              .binaryDecoder(bytes, 5, bytes.length - 5, null)
            fromAvro(rd.read(null, dec), reader)
          }
        Row.fromSeq(vals.toIndexedSeq)
      }
    }
    spark.createDataFrame(rdd, outSchema)
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
