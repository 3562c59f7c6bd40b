package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model.Connect
import graft.smt.Smt
import graft.sinks.{MergeSink, SchemaEvolution}
import graft.sources.Incremental
import graft.codec.JsonEnvelope

/**
 * Driver contract — one `queries` entry per implemented operator from
 * SURVEY.md §2 (names prefixed with the §2 row ids), each with a DuckDB
 * oracle in [[SparkEntry.oracleSql]] producing identical columns.
 *
 * Determinism rules (so Spark and DuckDB hash-match): every query ends in
 * a total ORDER BY; double aggregations go through DECIMAL (exact,
 * associative) and come back as DOUBLE; no wall-clock, no randomness.
 */
object SparkEntry {

  import graft.Tables.T

  /** Flagship: the reference's CONNECT_DML_TEST shape end-to-end —
   * mixed-DML changelog through the full wire path (CDC envelope →
   * JSON encode → decode → unwrap → keyed last-write-wins merge over a
   * snapshot), i.e. S6/T5/C1/K1-K2 in one pipeline. Driver
   * smoke-checks rows>0 on sf0.001. */
  def entry(spark: SparkSession): DataFrame =
    ConnectQueries.cdcIngestDml(spark, "/root/testdata/sf0.001")

  /** Query implementations (kept in a private object so each is a named,
   * testable function rather than an inline lambda). */
  private[graft] object Q {

    // ---- classical relational core ------------------------------------

    /** TPC-H Q1-shaped aggregation: decimal-exact sums, partial+final agg. */
    def q1Agg(s: SparkSession, dir: String): DataFrame =
      T(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast(DecimalType(18, 2))).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast(DecimalType(18, 2))).cast("double").as("sum_base_price"),
          sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast(DecimalType(18, 6))).cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .withColumn("avg_qty", col("sum_qty") / col("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))

    /** Join-agg with a broadcast dim (nation is tiny at any SF; customer
     * shuffles — at 100 TB both fact sides hash-partition on the key). */
    def q2JoinBroadcast(s: SparkSession, dir: String): DataFrame = {
      val o = T(s, dir, "orders")
      val c = T(s, dir, "customer").select("c_custkey", "c_nationkey")
      val n = T(s, dir, "nation").select("n_nationkey", "n_name")
      o.join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(
          sum(col("o_totalprice").cast(DecimalType(18, 2))).cast("double").as("total_price"),
          count(lit(1)).as("n_orders"))
        .orderBy(col("n_name"))
    }

    // ---- SMT algebra (T1-T6) -------------------------------------------

    /** T1+T2: ValueToKey then ExtractField$Key — bare scalar key. */
    def smtValueToKey(s: SparkSession, dir: String): DataFrame = {
      val frame = Connect.toConnectFrame(
        T(s, dir, "customer"), Seq("c_custkey"), "om.customer", "c_custkey")
      Smt.chain(
        Smt.valueToKey(Seq("c_custkey")),
        Smt.extractKeyField("c_custkey"))(frame)
        .select(col("key"), col("value.c_name").as("c_name"),
          col("value.c_mktsegment").as("c_mktsegment"))
        .orderBy("key")
    }

    /** T3: RegexRouter — `mysql_om_smt_key_(.*)` -> `mysql_$1`. */
    def smtRegexRouter(s: SparkSession, dir: String): DataFrame = {
      val frame = Connect.toConnectFrame(
        T(s, dir, "customer"), Seq("c_custkey"), "", "c_custkey")
        .withColumn("topic",
          concat(lit("mysql_om_smt_key_"), lower(col("value.c_mktsegment"))))
      Smt.regexRouter("mysql_om_smt_key_(.*)", "mysql_$1")(frame)
        .groupBy("topic").agg(count(lit(1)).as("n"))
        .orderBy("topic")
    }

    /** T4: TimestampConverter — Timestamp -> formatted string -> parsed
     * back (the `yyyy-MM-dd HH:mm:ss` leg of the labs' format matrix). */
    def smtTimestampConverter(s: SparkSession, dir: String): DataFrame = {
      val frame = Connect.toConnectFrame(
        T(s, dir, "events"), Seq("event_id"), "events", "event_id")
      Smt.chain(
        Smt.insertValueField("ts_str", col("value.ts")),
        Smt.timestampConverter("ts_str", Smt.TsTarget.Str("yyyy-MM-dd HH:mm:ss")),
        Smt.insertValueField("ts_parsed", col("value.ts_str")),
        Smt.timestampConverter("ts_parsed", Smt.TsTarget.Timestamp,
          Some("yyyy-MM-dd HH:mm:ss")))(frame)
        .select(col("value.event_id").as("event_id"),
          col("value.ts_str").as("ts_str"),
          col("value.ts_parsed").cast(TimestampNTZType).as("ts_parsed"))
        .orderBy("event_id")
    }

    /** T5: ExtractNewRecordState — CDC envelope -> flat rows, deletes
     * become tombstones, tombstones preserved (`drop.tombstones=false`). */
    def cdcUnwrap(s: SparkSession, dir: String): DataFrame = {
      val ev = T(s, dir, "events")
      val row = struct(ev.columns.map(col).toIndexedSeq: _*)
      val isDelete = col("event_type") === "error"
      val envelope = struct(
        when(lit(false), row).as("before"),
        when(!isDelete, row).as("after"),
        struct(lit("graft").as("name"), col("event_id").as("pos")).as("source"),
        when(isDelete, lit("d")).otherwise(lit("c")).as("op"),
        col("event_id").as("ts_ms"))
      val frame = ev.select(col("event_id").as("key"), envelope.as("value"),
        lit("srv.db.events").as("topic"), col("event_id").as("seq"))
      Smt.extractNewRecordState(dropTombstones = false)(frame)
        .select(col("key"),
          col("value.user_id").as("user_id"),
          col("value.event_type").as("etype"),
          col("value").isNull.as("tomb"))
        .orderBy("key")
    }

    /** T7: the rest of the stock SMT family chained — include/rename/
     * mask/cast/hoist/flatten/timestamp-route in one pass. */
    def smtStockChain(s: SparkSession, dir: String): DataFrame = {
      val frame = Connect.toConnectFrame(
        T(s, dir, "customer"), Seq("c_custkey"), "om.customer", "c_custkey")
      Smt.chain(
        Smt.includeFields(Seq("c_custkey", "c_name", "c_acctbal", "c_nationkey")),
        Smt.renameFields(Map("c_name" -> "name")),
        Smt.maskField("c_acctbal"),
        Smt.castFields(Map("c_nationkey" -> StringType)),
        Smt.hoistField("row"),
        Smt.flattenValue("_"),
        Smt.timestampRouter(lit("2024-03-15").cast(TimestampType)))(frame)
        .select(col("topic"),
          col("value.row_c_custkey").as("c_custkey"),
          col("value.row_name").as("name"),
          col("value.row_c_acctbal").as("acctbal_masked"),
          col("value.row_c_nationkey").as("nationkey_str"))
        .orderBy("c_custkey")
    }

    /** T8: Connect PREDICATES — `transforms.X.predicate` +
     * `predicates.P.type=TopicNameMatches`: the mask SMT applies ONLY
     * to records on the standard topic; gold-topic records pass
     * untouched. (Negate + RecordIsTombstone are spec-covered in
     * `SmtSpec`.) */
    def smtPredicated(s: SparkSession, dir: String): DataFrame = {
      val frame = Connect.toConnectFrame(
        T(s, dir, "customer"), Seq("c_custkey"), "om.customer_std", "c_custkey")
        .withColumn("topic", when(col("value.c_acctbal") > 5000, "om.customer_gold")
          .otherwise("om.customer_std"))
      Smt.whenPredicate(
        Smt.Predicates.topicNameMatches("om\\.customer_std"),
        Smt.maskField("c_acctbal"))(frame)
        .select(col("topic"), col("value.c_custkey").as("c_custkey"),
          col("value.c_acctbal").as("acctbal"))
        .orderBy("c_custkey")
    }

    /** T9: record HEADERS — `HeaderFrom` (copy + move), `InsertHeader`,
     * `DropHeaders`: the segment copies into a header, the nation key
     * MOVES (leaves the value struct), a static source header lands,
     * and a scratch header is dropped by pattern. */
    def smtHeaders(s: SparkSession, dir: String): DataFrame = {
      val frame = Connect.toConnectFrame(
        T(s, dir, "customer"), Seq("c_custkey"), "om.customer", "c_custkey")
      Smt.chain(
        Smt.insertHeader("tmp.trace", lit("scratch")),
        Smt.headerFrom(Seq("c_mktsegment"), Seq("segment")),
        Smt.headerFrom(Seq("c_nationkey"), Seq("nation"), move = true),
        Smt.insertHeader("src", lit("graft")),
        Smt.dropHeaders("tmp\\..*"))(frame)
        .select(col("value.c_custkey").as("c_custkey"),
          element_at(col("headers"), "segment").as("segment_hdr"),
          element_at(col("headers"), "nation").as("nation_hdr"),
          element_at(col("headers"), "src").as("src_hdr"),
          size(col("headers")).as("n_headers"))
        .orderBy("c_custkey")
    }

    // ---- sink merge (K1-K4) ---------------------------------------------

    /** K1+K2: upsert + tombstone-delete materialization of a keyed
     * changelog (events keyed by user_id, 'error' = DELETE). */
    def sinkUpsert(s: SparkSession, dir: String): DataFrame = {
      val frame = Connect.toConnectFrame(
        T(s, dir, "events"), Seq("user_id"), "events", "event_id")
      val log = frame.withColumn("value",
        when(col("value.event_type") =!= "error", col("value")))
      MergeSink.materialize(log)
        .select(col("user_id"), col("event_type").as("last_type"),
          col("value").as("last_value"))
        .orderBy("user_id")
    }

    /** K1 with a composite PK (reference: order_items
     * `pk.fields: "order_id, line_item_id"`): base snapshot + update
     * batch + delete batch, last-write-wins by seq.
     *
     * Scale shape: the source dedup is ONE `min(struct)` aggregation
     * (map-side combine, no sort — the payload columns are exactly the
     * former window's sort key), and the three changelog batches are
     * emitted by a narrow `explode` in the same pass instead of three
     * scans of the deduped table. Total: 2 shuffles for a 3-batch
     * upsert+delete merge, independent of batch count. */
    def sinkUpsertCompositeKey(s: SparkSession, dir: String): DataFrame = {
      // the synthetic lineitem's (l_orderkey, l_linenumber) is NOT unique;
      // a real source table's PK is — dedup deterministically first.
      val li = T(s, dir, "lineitem")
        .groupBy("l_orderkey", "l_linenumber")
        .agg(min(struct(col("l_quantity"), col("l_extendedprice"),
          col("l_returnflag"))).as("_p"))
        .select(col("l_orderkey"), col("l_linenumber"),
          col("_p.l_quantity").as("l_quantity"),
          col("_p.l_extendedprice").as("l_extendedprice"),
          col("_p.l_returnflag").as("l_returnflag"))
      val entry = (seqV: Int, del: Boolean, qty: Column) => struct(
        lit(seqV.toLong).as("seq"), lit(del).as("del"), qty.as("l_quantity"))
      val entries = li.select(
        col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"),
        col("l_quantity").as("_q0"), col("l_returnflag").as("_rf"),
        explode(array(
          entry(1, false, col("l_quantity")),
          entry(2, false, col("l_quantity") + 100),
          entry(3, true, col("l_quantity")))).as("_e"))
        .filter(col("_e.seq") === 1 ||
          (col("_e.seq") === 2 && col("_q0") >= 45) ||
          (col("_e.seq") === 3 && col("_rf") === "R" && col("_q0") < 5))
      val changelog = entries.select(
        struct(col("l_orderkey"), col("l_linenumber")).as("key"),
        when(!col("_e.del"), struct(col("l_orderkey"), col("l_linenumber"),
          col("_e.l_quantity").as("l_quantity"),
          col("l_extendedprice"))).as("value"),
        lit("om.order_items").as("topic"),
        col("_e.seq").as("seq"))
      MergeSink.materialize(changelog)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber")
    }

    /** K4: add-only schema evolution (auto.evolve) — NULL-padded union. */
    def schemaEvolutionAdd(s: SparkSession, dir: String): DataFrame = {
      val c = T(s, dir, "customer")
      val before = c.filter(col("c_custkey") % 2 === 0)
        .select("c_custkey", "c_name")
      val after = c.filter(col("c_custkey") % 2 === 1)
        .select("c_custkey", "c_name", "c_acctbal")
      SchemaEvolution.unionEvolve(before, after).orderBy("c_custkey")
    }

    // ---- incremental sources (S2, S4) ------------------------------------

    private def cutoff(df: DataFrame, incCol: String): Long =
      df.agg(floor(max(col(incCol)) * 0.6).cast("long")).head().getLong(0)

    /** S2 `mode=incrementing`: poll 1 captures the table as of a cutoff and
     * establishes the watermark; poll 2 captures strictly newer rows via a
     * pushed-down predicate. */
    def jdbcIncrementing(s: SparkSession, dir: String): DataFrame = {
      val orders = T(s, dir, "orders")
      val cut = cutoff(orders, "o_orderkey")
      val mode = Incremental.Incrementing("o_orderkey")
      def reader(pred: Option[String]): DataFrame =
        pred.foldLeft(orders)((d, p) => d.filter(expr(p)))
      val (_, w1) = Incremental.poll(
        p => reader(p).filter(col("o_orderkey") <= cut), mode,
        Incremental.Watermark.zero)
      val (batch2, _) = Incremental.poll(reader, mode, w1)
      batch2.select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
        .orderBy("o_orderkey")
    }

    /** S4 `mode=timestamp+incrementing`: composite `(ts,inc)` watermark.
     * Poll 1 sees the table as of mid-1998; poll 2 captures everything
     * newer via the composite pushdown predicate. */
    def jdbcTimestampIncrementing(s: SparkSession, dir: String): DataFrame = {
      val orders = T(s, dir, "orders")
      val mode = Incremental.TimestampIncrementing("o_orderdate", "o_orderkey")
      def reader(pred: Option[String]): DataFrame =
        pred.foldLeft(orders)((d, p) => d.filter(expr(p)))
      val (_, w1) = Incremental.poll(
        p => reader(p).filter(col("o_orderdate") <= lit("1998-01-01")), mode,
        Incremental.Watermark.zero)
      val (batch2, _) = Incremental.poll(reader, mode, w1)
      batch2.select("o_orderkey", "o_orderdate").orderBy("o_orderkey")
    }

    // ---- codecs (C1) ------------------------------------------------------

    /** C1: schema'd-JSON envelope round-trip (source->topic->sink wire). */
    def jsonEnvelopeRoundTrip(s: SparkSession, dir: String): DataFrame = {
      val frame = Connect.toConnectFrame(
        T(s, dir, "nation"), Seq("n_nationkey"), "om.nation", "n_nationkey")
      JsonEnvelope.roundTrip(frame)
        .select(col("value.n_nationkey").as("n_nationkey"),
          col("value.n_name").as("n_name"),
          col("value.n_regionkey").as("n_regionkey"))
        .orderBy("n_nationkey")
    }
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> (Q.q1Agg _),
    "q2_join_broadcast" -> (Q.q2JoinBroadcast _),
    "t1_t2_smt_value_to_key" -> (Q.smtValueToKey _),
    "t3_smt_regex_router" -> (Q.smtRegexRouter _),
    "t4_smt_timestamp_converter" -> (Q.smtTimestampConverter _),
    "t5_cdc_unwrap" -> (Q.cdcUnwrap _),
    "t7_smt_stock_chain" -> (Q.smtStockChain _),
    "t8_smt_predicated" -> (Q.smtPredicated _),
    "t9_smt_headers" -> (Q.smtHeaders _),
    "k1_k2_sink_upsert_tombstone" -> (Q.sinkUpsert _),
    "k1_sink_upsert_composite_key" -> (Q.sinkUpsertCompositeKey _),
    "k4_schema_evolution_add" -> (Q.schemaEvolutionAdd _),
    "s2_jdbc_incrementing" -> (Q.jdbcIncrementing _),
    "s4_jdbc_timestamp_incrementing" -> (Q.jdbcTimestampIncrementing _),
    "c1_json_envelope_roundtrip" -> (Q.jsonEnvelopeRoundTrip _)
  ) ++ LlmQueries.queries ++ ConnectQueries.queries ++ RelationalQueries.queries ++
    JdbcQueries.queries

  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
        |  count(*) AS count_order,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty
        |FROM lineitem WHERE l_shipdate <= '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q2_join_broadcast" ->
      """SELECT n_name,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
        |  count(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "t1_t2_smt_value_to_key" ->
      """SELECT c_custkey AS key, c_name, c_mktsegment
        |FROM customer ORDER BY key""".stripMargin,
    "t3_smt_regex_router" ->
      """SELECT regexp_replace('mysql_om_smt_key_' || lower(c_mktsegment),
        |         'mysql_om_smt_key_(.*)', 'mysql_\1') AS topic,
        |  count(*) AS n
        |FROM customer GROUP BY 1 ORDER BY topic""".stripMargin,
    "t4_smt_timestamp_converter" ->
      """SELECT event_id,
        |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str,
        |  strptime(strftime(ts, '%Y-%m-%d %H:%M:%S'), '%Y-%m-%d %H:%M:%S') AS ts_parsed
        |FROM events ORDER BY event_id""".stripMargin,
    "t5_cdc_unwrap" ->
      """SELECT event_id AS key,
        |  CASE WHEN event_type = 'error' THEN NULL ELSE user_id END AS user_id,
        |  CASE WHEN event_type = 'error' THEN NULL ELSE event_type END AS etype,
        |  (event_type = 'error') AS tomb
        |FROM events ORDER BY key""".stripMargin,
    "t7_smt_stock_chain" ->
      """SELECT 'om.customer-20240315' AS topic, c_custkey, c_name AS name,
        |  CAST(NULL AS DOUBLE) AS acctbal_masked,
        |  CAST(c_nationkey AS VARCHAR) AS nationkey_str
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "t8_smt_predicated" ->
      """SELECT CASE WHEN c_acctbal > 5000 THEN 'om.customer_gold'
        |            ELSE 'om.customer_std' END AS topic,
        |  c_custkey,
        |  CASE WHEN c_acctbal > 5000 THEN c_acctbal
        |       ELSE CAST(NULL AS DOUBLE) END AS acctbal
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "t9_smt_headers" ->
      """SELECT c_custkey, c_mktsegment AS segment_hdr,
        |  CAST(c_nationkey AS VARCHAR) AS nation_hdr,
        |  'graft' AS src_hdr, 3 AS n_headers
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "k1_k2_sink_upsert_tombstone" ->
      """SELECT user_id, event_type AS last_type, value AS last_value
        |FROM (SELECT user_id, event_type, value,
        |        row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
        |      FROM events) t
        |WHERE rn = 1 AND event_type <> 'error' ORDER BY user_id""".stripMargin,
    "k1_sink_upsert_composite_key" ->
      """WITH src AS (
        |  SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_returnflag
        |  FROM lineitem
        |  QUALIFY row_number() OVER (PARTITION BY l_orderkey, l_linenumber
        |    ORDER BY l_quantity, l_extendedprice, l_returnflag) = 1),
        |log AS (
        |  SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
        |         1 AS seq, false AS del FROM src
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, l_quantity + 100, l_extendedprice,
        |         2, false FROM src WHERE l_quantity >= 45
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
        |         3, true FROM src WHERE l_returnflag = 'R' AND l_quantity < 5)
        |SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM (SELECT *, row_number() OVER (PARTITION BY l_orderkey, l_linenumber
        |        ORDER BY seq DESC) AS rn FROM log) t
        |WHERE rn = 1 AND NOT del ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "k4_schema_evolution_add" ->
      """SELECT c_custkey, c_name, CAST(NULL AS DOUBLE) AS c_acctbal
        |FROM customer WHERE c_custkey % 2 = 0
        |UNION ALL
        |SELECT c_custkey, c_name, c_acctbal
        |FROM customer WHERE c_custkey % 2 = 1
        |ORDER BY c_custkey""".stripMargin,
    "s2_jdbc_incrementing" ->
      """WITH cut AS (SELECT CAST(floor(max(o_orderkey) * 0.6) AS BIGINT) AS c FROM orders),
        |w AS (SELECT max(o_orderkey) AS m FROM orders, cut WHERE o_orderkey <= cut.c)
        |SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus
        |FROM orders, w WHERE o_orderkey > w.m ORDER BY o_orderkey""".stripMargin,
    "s4_jdbc_timestamp_incrementing" ->
      """WITH b1 AS (SELECT * FROM orders WHERE o_orderdate <= '1998-01-01'),
        |w AS (SELECT o_orderdate AS t, o_orderkey AS i FROM b1
        |      ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 1)
        |SELECT o_orderkey, o_orderdate FROM orders, w
        |WHERE o_orderdate > w.t OR (o_orderdate = w.t AND o_orderkey > w.i)
        |ORDER BY o_orderkey""".stripMargin,
    "c1_json_envelope_roundtrip" ->
      """SELECT n_nationkey, n_name, n_regionkey
        |FROM nation ORDER BY n_nationkey""".stripMargin
  ) ++ LlmQueries.oracleSql ++ ConnectQueries.oracleSql ++ RelationalQueries.oracleSql ++
    JdbcQueries.oracleSql

  /** Oracles whose SQL embeds TRAINED constants (deterministic — DECIMAL
   * training sums — but data-dependent): rendered per data dir at dump
   * time. Verify merges these into oracle_sql.json. */
  def dynamicOracleSql: Map[String, (SparkSession, String) => String] =
    LlmQueries.dynamicOracleSql

  /** Fixture rungs whose trained/production sibling times the SAME plan
   * shape at the same SF — Bench skips these (the 209-gate suite outgrew
   * the driver's wall cap at r16), Verify keeps them all (correctness at
   * sf0.01 is cheap). Pairing: e6→e6b, e7→e7b, e9→e9b (oracle-pinned
   * k-NN fixtures; production dial e9c also stays), e13→e13b,
   * d10→d10b, d14→d14b, d15→d15b. Every operator family stays
   * represented in the bench population. */
  val benchSuperseded: Set[String] = Set(
    "e6_pq_topk", "e7_ivfpq_topk", "e9_knn_graph", "e13_ann_recall",
    "d10_semdedup", "d14_text_embedding_neardup", "d15_text_semdedup")
}
