package graft.codec

import org.apache.spark.sql.types._

import graft.sinks.SchemaEvolution

/**
 * C4 — in-memory model of the reference's Schema Registry bookkeeping:
 * subjects named `<topic>-key`/`<topic>-value` (`실습수행/Schema Registry
 * 기반의 Connector 구성 실습.md:146`), monotonically growing version
 * lists with globally unique schema ids, a global compatibility default
 * plus per-subject overrides, and the lab's "set NONE to force a rename
 * through" flow (`:533-537` — a rename is a delete + required add, which
 * BACKWARD rejects).
 *
 * The registry *service* is out of scope offline (SURVEY.md §7.5); this
 * models its data contract so pipelines can resolve schemas by
 * (subject, version) and evolution is gated the way the labs observe.
 * Compatibility maps Avro defaults onto Spark nullability: a nullable
 * field is one a reader can fill when the writer omitted it.
 */
object SchemaRegistry {

  /** Confluent compatibility levels. Non-transitive levels check the new
   * schema against the LATEST version only; transitive ones against all. */
  sealed abstract class Compat(val name: String, val transitive: Boolean) {
    /** Does `candidate` satisfy this level against `existing`? */
    def ok(candidate: StructType, existing: StructType): Boolean = this match {
      case Compat.None => true
      case Compat.Backward | Compat.BackwardTransitive => canRead(candidate, existing)
      case Compat.Forward | Compat.ForwardTransitive => canRead(existing, candidate)
      case Compat.Full | Compat.FullTransitive =>
        canRead(candidate, existing) && canRead(existing, candidate)
    }
  }
  object Compat {
    case object None extends Compat("NONE", false)
    case object Backward extends Compat("BACKWARD", false)
    case object Forward extends Compat("FORWARD", false)
    case object Full extends Compat("FULL", false)
    case object BackwardTransitive extends Compat("BACKWARD_TRANSITIVE", true)
    case object ForwardTransitive extends Compat("FORWARD_TRANSITIVE", true)
    case object FullTransitive extends Compat("FULL_TRANSITIVE", true)
    val all: Seq[Compat] = Seq(None, Backward, Forward, Full,
      BackwardTransitive, ForwardTransitive, FullTransitive)
    def parse(s: String): Compat = all.find(_.name == s.toUpperCase)
      .getOrElse(throw new IllegalArgumentException(s"unknown compatibility level: $s"))
  }

  /** Can a `reader`-schema consumer decode data written as `writer`?
   * Fields only the reader has need a default (nullable); fields only
   * the writer has are ignored; retypes always break; and a shared
   * field the writer may NULL but the reader declares non-nullable
   * breaks too (the Avro union [null,T] → T narrowing — a v1 null has
   * nowhere to go in the v2 reader). */
  private def canRead(reader: StructType, writer: StructType): Boolean = {
    val d = SchemaEvolution.diff(writer, reader)
    val tightened = reader.fields.exists { rf =>
      writer.fields.find(_.name == rf.name)
        .exists(wf => wf.nullable && !rf.nullable)
    }
    d.added.forall(_.nullable) && d.retyped.isEmpty && !tightened
  }

  /** One registered schema version. `id` is registry-global (the wire
   * id an Avro message would carry); `version` is per-subject. */
  final case class Registered(subject: String, version: Int, id: Int,
                              schema: StructType)

  /** A registry whose every mutation journals to a [[graft.sinks.LogTable]]
   * at `path` and whose construction replays it — the `_schemas`-topic
   * durability of the reference's registry (`실습수행/Schema Registry 기반의
   * Connector 구성 실습.md:146-174`: subjects persist in Kafka and survive
   * a server restart). Journal batch ids are the op sequence, so
   * LogTable's behind-max guard fences a second live registry on the
   * same path (the registry's single-writer rule) for free. */
  def durable(spark: org.apache.spark.sql.SparkSession, path: String,
              defaultCompat: Compat = Compat.Backward): SchemaRegistry =
    new SchemaRegistry(defaultCompat, Some(new Journal(spark, path)))

  /** The durable registry's event log. One LogTable row per event, keyed
   * by a record discriminator (`schema:<subject>:<version>`,
   * `compat:<subject>`, `config`, `idseq`); subject deletion tombstones
   * its records, exactly the null-message convention of the `_schemas`
   * topic. Control-plane sized: one tiny Spark batch per mutation. */
  private[codec] final class Journal(
      spark: org.apache.spark.sql.SparkSession, path: String) {
    import org.apache.spark.sql.Row
    import graft.sinks.LogTable

    private val valueType = StructType(Seq(
      StructField("subject", StringType), StructField("version", IntegerType),
      StructField("id", IntegerType), StructField("schema_json", StringType),
      StructField("compat", StringType), StructField("next_id", IntegerType)))
    private val frameType = StructType(Seq(
      StructField("key", StructType(Seq(StructField("rec", StringType)))),
      StructField("value", valueType, nullable = true),
      StructField("seq", LongType)))

    private var opSeq: Long = LogTable.maxCommittedBatchId(path).getOrElse(-1L)

    private def commit(events: Seq[(String, Row)]): Unit = synchronized {
      // fencing: the journal is a SYNCHRONOUS single-writer log — unlike
      // a streaming sink, its own last op is never legitimately
      // re-delivered, so any committed id beyond this instance's counter
      // means a second live registry moved the path on. LogTable's
      // behind-max guard alone would throw for ids strictly behind but
      // silently no-op the equal-id case as crash replay — which here
      // would SWALLOW a stale writer's mutation while its caller
      // believes it persisted.
      for (max <- LogTable.maxCommittedBatchId(path) if max > opSeq)
        throw new IllegalStateException(
          s"registry journal at $path advanced to op $max by another " +
            s"writer (this instance is at $opSeq): refusing to fork " +
            "history — re-open the registry to adopt the latest state")
      opSeq += 1
      val rows: java.util.List[Row] =
        java.util.List.of(events.map { case (rec, v) =>
          Row(Row(rec), v, opSeq) }: _*)
      // replayable=false: if a concurrent second registry races past
      // the max>opSeq fence above and commits this id first, the
      // equal-id case throws instead of silently no-oping as crash
      // replay — a lost-mutation outcome can never report success
      LogTable.applyBatch(path, spark.createDataFrame(rows, frameType),
        Seq("rec"), Some(opSeq), replayable = false)
      if (LogTable.versions(path).size >= 8)
        LogTable.compact(spark, path, Seq("rec"))
    }

    def appendSchema(r: Registered, nextId: Int): Unit = commit(Seq(
      s"schema:${r.subject}:${r.version}" ->
        Row(r.subject, r.version, r.id, r.schema.json, null, null),
      "idseq" -> Row(null, null, null, null, null, nextId)))

    def appendGlobal(level: Compat): Unit =
      commit(Seq("config" -> Row(null, null, null, null, level.name, null)))

    def appendOverride(subject: String, level: Compat): Unit =
      commit(Seq(s"compat:$subject" ->
        Row(subject, null, null, null, level.name, null)))

    def appendDelete(subject: String, versions: Seq[Int]): Unit = commit(
      versions.map(v => s"schema:$subject:$v" -> (null: Row)) :+
        (s"compat:$subject" -> (null: Row)))

    /** Everything a restarted registry resumes with. */
    def replay(): (Seq[Registered], Map[String, Compat], Option[Compat], Int) = {
      if (LogTable.versions(path).isEmpty)
        return (Seq.empty, Map.empty, scala.None, 1)
      val rows = LogTable.read(spark, path, Seq("rec")).collect()
      var nextId = 1
      var global: Option[Compat] = scala.None
      val overrides = Map.newBuilder[String, Compat]
      val schemas = Seq.newBuilder[Registered]
      rows.foreach { r =>
        val rec = r.getAs[String]("rec")
        if (rec == "idseq") nextId = r.getAs[Int]("next_id")
        else if (rec == "config")
          global = Some(Compat.parse(r.getAs[String]("compat")))
        else if (rec.startsWith("compat:"))
          overrides += r.getAs[String]("subject") ->
            Compat.parse(r.getAs[String]("compat"))
        else if (rec.startsWith("schema:"))
          schemas += Registered(r.getAs[String]("subject"),
            r.getAs[Int]("version"), r.getAs[Int]("id"),
            org.apache.spark.sql.types.DataType
              .fromJson(r.getAs[String]("schema_json")).asInstanceOf[StructType])
      }
      (schemas.result(), overrides.result(), global, nextId)
    }
  }
}

/** @param defaultCompat the registry-global compatibility level
 *                       (Confluent ships BACKWARD).
 * @param journal when set, every mutation persists and construction
 *                replays — build through [[SchemaRegistry.durable]]. */
final class SchemaRegistry(
    defaultCompat: SchemaRegistry.Compat = SchemaRegistry.Compat.Backward,
    journal: Option[SchemaRegistry.Journal] = None) {
  import SchemaRegistry._

  private val bySubject =
    scala.collection.mutable.LinkedHashMap.empty[String, Vector[Registered]]
  private val compatOverrides =
    scala.collection.mutable.HashMap.empty[String, Compat]
  private var nextId = 1
  private var global = defaultCompat

  // a journaled registry resumes exactly where the log left it: every
  // surviving subject/version/id, the compat levels, and the never-
  // reused id counter (deletes tombstone schema records but idseq only
  // grows — the real registry's id monotonicity)
  journal.foreach { j =>
    val (schemas, overrides, g, nid) = j.replay()
    schemas.sortBy(r => (r.id)).foreach { r =>
      bySubject(r.subject) = bySubject.getOrElse(r.subject, Vector.empty) :+ r
    }
    compatOverrides ++= overrides
    g.foreach(global = _)
    nextId = nid
  }

  /** The registry-global level (the REST `/config` resource — mutable,
   * as `PUT /config` is how the labs relax it). */
  def globalCompat: Compat = synchronized(global)

  def setGlobalCompat(level: Compat): Unit = synchronized {
    global = level
    journal.foreach(_.appendGlobal(level))
  }

  /** The per-subject override alone, if one is set (REST
   * `/config/{subject}` 404s when the subject has no override). */
  def compatOverride(subject: String): Option[Compat] =
    synchronized(compatOverrides.get(subject))

  def subjects: Seq[String] = synchronized(bySubject.keys.toSeq)

  def versions(subject: String): Seq[Registered] =
    synchronized(bySubject.getOrElse(subject, Vector.empty))

  def latest(subject: String): Option[Registered] = versions(subject).lastOption

  def schemaById(id: Int): Option[Registered] =
    synchronized(bySubject.valuesIterator.flatten.find(_.id == id))

  /** Per-subject override, falling back to the global level. */
  def compatLevel(subject: String): Compat =
    synchronized(compatOverrides.getOrElse(subject, global))

  def setCompat(subject: String, level: Compat): Unit = synchronized {
    compatOverrides(subject) = level
    journal.foreach(_.appendOverride(subject, level))
  }

  /** Would `schema` register cleanly right now? (The REST
   * `/compatibility/subjects/.../versions/latest` probe.) */
  def testCompatibility(subject: String, schema: StructType): Boolean =
    synchronized(checkAgainst(subject, schema).isEmpty)

  private def checkAgainst(subject: String, schema: StructType): Seq[Registered] = {
    val level = compatLevel(subject)
    val vs = bySubject.getOrElse(subject, Vector.empty)
    val against = if (level.transitive) vs else vs.takeRight(1)
    against.filterNot(prev => level.ok(schema, prev.schema))
  }

  /**
   * Register a schema under a subject. Re-registering a schema the
   * subject already holds returns the existing version (idempotent, as
   * the real registry does); an incompatible schema is rejected with the
   * offending versions named; otherwise the schema becomes the next
   * version with a fresh global id.
   */
  def register(subject: String, schema: StructType): Either[String, Registered] =
    synchronized {
      val vs = bySubject.getOrElse(subject, Vector.empty)
      vs.find(_.schema == schema) match {
        case Some(existing) => Right(existing)
        case scala.None =>
          val bad = checkAgainst(subject, schema)
          if (bad.nonEmpty)
            Left(s"schema incompatible with version(s) " +
              s"${bad.map(_.version).mkString(",")} of $subject " +
              s"under ${compatLevel(subject).name}")
          else {
            val r = Registered(subject, vs.size + 1, nextId, schema)
            nextId += 1
            bySubject(subject) = vs :+ r
            journal.foreach(_.appendSchema(r, nextId))
            Right(r)
          }
      }
    }

  /** Delete a subject (the lab's cleanup path). Versions are gone; the
   * global id counter never reuses ids. */
  def deleteSubject(subject: String): Unit = synchronized {
    val gone = bySubject.remove(subject)
    val hadOverride = compatOverrides.remove(subject).isDefined
    // journal whenever ANYTHING was forgotten: a compat override set on
    // a never-registered subject (PUT /config/{subject} pre-registration
    // is legal) must not resurrect on replay
    if (gone.exists(_.nonEmpty) || hadOverride)
      journal.foreach(_.appendDelete(subject,
        gone.map(_.map(_.version)).getOrElse(Seq.empty)))
  }
}
