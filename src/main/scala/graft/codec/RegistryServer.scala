package graft.codec

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.avro.{LogicalTypes, Schema}
import org.apache.spark.sql.types._

/**
 * C5b — the Schema Registry REST surface over the in-memory
 * [[SchemaRegistry]]: an in-process HTTP facade speaking the subset of
 * the Confluent protocol the reference's labs script against with curl
 * (`실습수행/Schema Registry 기반의 Connector 구성 실습.md:140-174` —
 * `GET /subjects`, `/subjects/{s}/versions[/latest|/{n}]`,
 * `POST /subjects/{s}/versions`, `GET /schemas/ids/{id}`,
 * `GET|PUT /config[/{subject}]` incl. the `:533-537` relax-to-NONE
 * flow, `DELETE /subjects/{s}`, and the compatibility probe).
 *
 * Schemas travel as Avro record JSON inside the standard
 * `{"schema": "<escaped>"}` wrapper; [[RegistryServer.structFromAvroJson]]
 * is the wire→Spark inverse of [[AvroCodec.avroSchemaJson]]. Built on
 * the JDK's `com.sun.net.httpserver` — no extra dependencies, and the
 * same facade pattern would front the registry on a real deployment
 * boundary (the engine side only ever sees [[RegistryHttpClient]]'s
 * resolved `StructType`s).
 *
 * Error codes follow the protocol: 40401 unknown subject, 40402 unknown
 * version, 40403 unknown schema id, 40408 no subject-level compat
 * override, 409 incompatible schema, 422 unparseable schema.
 */
final class RegistryServer(registry: SchemaRegistry, port: Int = 0) {
  import RegistryServer._

  private var server: HttpServer = _

  /** Start listening; returns the base URL (ephemeral port by default). */
  def start(): String = synchronized {
    require(server == null, "already started")
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
    server.createContext("/", (ex: HttpExchange) => handle(ex))
    server.start()
    s"http://127.0.0.1:${server.getAddress.getPort}"
  }

  def stop(): Unit = synchronized {
    if (server != null) { server.stop(0); server = null }
  }

  private def handle(ex: HttpExchange): Unit =
    try {
      val segs = ex.getRequestURI.getPath.split('/').filter(_.nonEmpty).toList
      val method = ex.getRequestMethod
      (method, segs) match {
        case ("GET", List("subjects")) =>
          json(ex, 200, registry.subjects.map(quote).mkString("[", ",", "]"))
        case ("GET", List("subjects", s, "versions")) =>
          withSubject(ex, s)(vs =>
            json(ex, 200, vs.map(_.version).mkString("[", ",", "]")))
        case ("GET", List("subjects", s, "versions", v)) =>
          withSubject(ex, s) { vs =>
            val hit = if (v == "latest") vs.lastOption
                      else v.toIntOption.flatMap(n => vs.find(_.version == n))
            hit match {
              case Some(r) => json(ex, 200, registered(r))
              case None => err(ex, 404, 40402, s"Version $v not found.")
            }
          }
        case ("POST", List("subjects", s, "versions")) =>
          parseSchema(ex) match {
            case Left(msg) => err(ex, 422, 42201, msg)
            case Right(schema) => registry.register(s, schema) match {
              case Left(msg) => err(ex, 409, 409, msg)
              case Right(r) => json(ex, 200, s"""{"id":${r.id}}""")
            }
          }
        case ("DELETE", List("subjects", s)) =>
          withSubject(ex, s) { vs =>
            registry.deleteSubject(s)
            json(ex, 200, vs.map(_.version).mkString("[", ",", "]"))
          }
        case ("GET", List("schemas", "ids", id)) =>
          id.toIntOption.flatMap(registry.schemaById) match {
            case Some(r) => json(ex, 200,
              s"""{"schema":${quote(AvroCodec.avroSchemaJson(r.schema))}}""")
            case None => err(ex, 404, 40403, s"Schema $id not found.")
          }
        case ("GET", List("config")) =>
          json(ex, 200,
            s"""{"compatibilityLevel":"${registry.globalCompat.name}"}""")
        case ("PUT", List("config")) =>
          withCompat(ex) { level =>
            registry.setGlobalCompat(level)
            json(ex, 200, s"""{"compatibility":"${level.name}"}""")
          }
        case ("GET", List("config", s)) =>
          registry.compatOverride(s) match {
            case Some(l) => json(ex, 200, s"""{"compatibilityLevel":"${l.name}"}""")
            case None => err(ex, 404, 40408,
              s"Subject '$s' does not have subject-level compatibility configured")
          }
        case ("PUT", List("config", s)) =>
          withCompat(ex) { level =>
            registry.setCompat(s, level)
            json(ex, 200, s"""{"compatibility":"${level.name}"}""")
          }
        case ("POST", List("compatibility", "subjects", s, "versions", _)) =>
          parseSchema(ex) match {
            case Left(msg) => err(ex, 422, 42201, msg)
            case Right(schema) => json(ex, 200,
              s"""{"is_compatible":${registry.testCompatibility(s, schema)}}""")
          }
        case _ => err(ex, 404, 404, s"no route for $method ${ex.getRequestURI}")
      }
    } catch {
      case e: Exception => err(ex, 500, 500, String.valueOf(e.getMessage))
    } finally ex.close()

  private def withSubject(ex: HttpExchange, s: String)(
      f: Seq[SchemaRegistry.Registered] => Unit): Unit = {
    val vs = registry.versions(s)
    if (vs.isEmpty) err(ex, 404, 40401, s"Subject '$s' not found.")
    else f(vs)
  }

  private def withCompat(ex: HttpExchange)(
      f: SchemaRegistry.Compat => Unit): Unit =
    // the body PARSE sits inside the same try as the level parse: an
    // unparseable JSON body is the protocol's 422, not a generic 500
    try {
      val body = mapper.readTree(new String(
        ex.getRequestBody.readAllBytes(), UTF_8))
      val node = body.get("compatibility")
      if (node == null) err(ex, 422, 42203, "missing 'compatibility' member")
      else f(SchemaRegistry.Compat.parse(node.asText()))
    } catch {
      case e: IllegalArgumentException => err(ex, 422, 42203, e.getMessage)
      case e: com.fasterxml.jackson.core.JacksonException =>
        err(ex, 422, 42203, s"unparseable request body: ${e.getOriginalMessage}")
    }

  private def parseSchema(ex: HttpExchange): Either[String, StructType] = {
    val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
    try {
      val node = mapper.readTree(body).get("schema")
      if (node == null) Left("missing 'schema' member")
      else Right(structFromAvroJson(node.asText()))
    } catch { case e: Exception => Left(s"unparseable schema: ${e.getMessage}") }
  }

  private def registered(r: SchemaRegistry.Registered): String =
    s"""{"subject":${quote(r.subject)},"version":${r.version},""" +
      s""""id":${r.id},"schema":${quote(AvroCodec.avroSchemaJson(r.schema))}}"""

  private def json(ex: HttpExchange, status: Int, body: String): Unit = {
    val bytes = body.getBytes(UTF_8)
    ex.getResponseHeaders.set("Content-Type",
      "application/vnd.schemaregistry.v1+json")
    ex.sendResponseHeaders(status, bytes.length)
    ex.getResponseBody.write(bytes)
  }

  private def err(ex: HttpExchange, status: Int, code: Int, msg: String): Unit =
    // an exception thrown AFTER a response was sent must not call
    // sendResponseHeaders twice — that masks the original error with
    // an "already sent" IllegalStateException
    if (ex.getResponseCode == -1)
      json(ex, status, s"""{"error_code":$code,"message":${quote(msg)}}""")
}

object RegistryServer {
  private val mapper = new ObjectMapper()

  private[codec] def quote(s: String): String =
    mapper.writeValueAsString(s)

  /** Avro record-schema JSON → Spark StructType — the wire→engine
   * inverse of [[AvroCodec.avroSchemaJson]] (same type subset: flat
   * records, `["null", T]` unions as nullability, date /
   * timestamp-micros / decimal logical types). */
  def structFromAvroJson(json: String): StructType = {
    val schema = new Schema.Parser().parse(json)
    require(schema.getType == Schema.Type.RECORD,
      s"expected an Avro record schema, got ${schema.getType}")
    StructType(schema.getFields.asScala.map { f =>
      val (dt, nullable) = fieldType(f.schema())
      StructField(f.name, dt, nullable)
    }.toArray)
  }

  private def fieldType(s: Schema): (DataType, Boolean) = s.getType match {
    case Schema.Type.UNION =>
      val branches = s.getTypes.asScala
      val nonNull = branches.filterNot(_.getType == Schema.Type.NULL)
      require(nonNull.size == 1,
        s"only ['null', T] unions map to Spark, got $s")
      (fieldType(nonNull.head)._1, nonNull.size < branches.size)
    case Schema.Type.INT =>
      (if (s.getLogicalType.isInstanceOf[LogicalTypes.Date]) DateType
       else IntegerType, false)
    case Schema.Type.LONG =>
      (if (s.getLogicalType.isInstanceOf[LogicalTypes.TimestampMicros])
         TimestampType
       else LongType, false)
    case Schema.Type.FLOAT => (FloatType, false)
    case Schema.Type.DOUBLE => (DoubleType, false)
    case Schema.Type.STRING => (StringType, false)
    case Schema.Type.BOOLEAN => (BooleanType, false)
    case Schema.Type.BYTES => s.getLogicalType match {
      case d: LogicalTypes.Decimal => (DecimalType(d.getPrecision, d.getScale), false)
      case _ => (BinaryType, false)
    }
    case other =>
      throw new IllegalArgumentException(s"no Spark mapping for Avro $other")
  }
}

/**
 * Client side of the REST shim: resolves subjects/versions/ids over
 * HTTP and returns engine-ready `StructType`s / writer-schema maps, so
 * framed encode/decode runs against the registry *protocol* rather
 * than the in-memory object — the consumer the labs' curl scripts
 * stand in for. JDK `java.net.http`, no extra dependencies.
 */
final class RegistryHttpClient(baseUrl: String) {
  import RegistryServer.quote

  private val http = java.net.http.HttpClient.newHttpClient()
  private val mapper = new ObjectMapper()

  private def request(method: String, path: String, body: Option[String]) = {
    val b = java.net.http.HttpRequest.newBuilder(java.net.URI.create(baseUrl + path))
    val withBody = body match {
      case Some(s) => b.method(method,
        java.net.http.HttpRequest.BodyPublishers.ofString(s))
        .header("Content-Type", "application/vnd.schemaregistry.v1+json")
      case None => b.method(method,
        java.net.http.HttpRequest.BodyPublishers.noBody())
    }
    http.send(withBody.build(),
      java.net.http.HttpResponse.BodyHandlers.ofString())
  }

  private def expect(method: String, path: String,
                     body: Option[String] = None) = {
    val r = request(method, path, body)
    require(r.statusCode() / 100 == 2,
      s"$method $path -> HTTP ${r.statusCode()}: ${r.body()}")
    mapper.readTree(r.body())
  }

  /** POST the schema; returns the registry-global schema id. */
  def register(subject: String, schema: StructType): Int =
    expect("POST", s"/subjects/$subject/versions",
      Some(s"""{"schema":${quote(AvroCodec.avroSchemaJson(schema))}}"""))
      .get("id").asInt()

  /** Register, surfacing a 409 as Left (the rejected-evolution probe). */
  def tryRegister(subject: String, schema: StructType): Either[String, Int] = {
    val r = request("POST", s"/subjects/$subject/versions",
      Some(s"""{"schema":${quote(AvroCodec.avroSchemaJson(schema))}}"""))
    if (r.statusCode() / 100 == 2) Right(mapper.readTree(r.body()).get("id").asInt())
    else Left(mapper.readTree(r.body()).get("message").asText())
  }

  def subjects(): Seq[String] =
    expect("GET", "/subjects").elements().asScala.map(_.asText()).toSeq

  def versionsOf(subject: String): Seq[Int] =
    expect("GET", s"/subjects/$subject/versions")
      .elements().asScala.map(_.asInt()).toSeq

  /** (version, id, schema) of the subject's latest version. */
  def latest(subject: String): (Int, Int, StructType) = {
    val n = expect("GET", s"/subjects/$subject/versions/latest")
    (n.get("version").asInt(), n.get("id").asInt(),
      RegistryServer.structFromAvroJson(n.get("schema").asText()))
  }

  def schemaById(id: Int): StructType =
    RegistryServer.structFromAvroJson(
      expect("GET", s"/schemas/ids/$id").get("schema").asText())

  /** id → writer Avro JSON for every version of the subject — the
   * driver-side snapshot [[AvroCodec.decodeFramedWith]] distributes. */
  def writerSchemas(subject: String): Map[Int, String] =
    versionsOf(subject).map { v =>
      val n = expect("GET", s"/subjects/$subject/versions/$v")
      n.get("id").asInt() -> n.get("schema").asText()
    }.toMap

  def setCompat(subject: String, level: String): Unit =
    expect("PUT", s"/config/$subject",
      Some(s"""{"compatibility":${quote(level)}}"""))

  def setGlobalCompat(level: String): Unit =
    expect("PUT", "/config", Some(s"""{"compatibility":${quote(level)}}"""))

  def globalCompat(): String =
    expect("GET", "/config").get("compatibilityLevel").asText()

  def compatible(subject: String, schema: StructType): Boolean =
    expect("POST", s"/compatibility/subjects/$subject/versions/latest",
      Some(s"""{"schema":${quote(AvroCodec.avroSchemaJson(schema))}}"""))
      .get("is_compatible").asBoolean()

  def deleteSubject(subject: String): Seq[Int] =
    expect("DELETE", s"/subjects/$subject")
      .elements().asScala.map(_.asInt()).toSeq
}
