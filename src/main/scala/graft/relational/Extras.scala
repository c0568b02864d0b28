package graft.relational

import graft.{QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Round-1 widening beyond the core survey rows: exact percentiles,
  * bitwise ops, the salted-skew-join pattern, and non-parquet source
  * round-trips (CSV/JSON).
  */
object Extras extends QueryPack {

  /** Typed row view for the Dataset-API demonstration (must be
    * object-level for Encoder derivation). */
  case class Ev(user_id: Long, event_type: String, value: Double)

  /** Deterministic roundtrip dir keyed by (format, source dir, source
    * content fingerprint); `write` runs only if the dir's _SUCCESS
    * marker is absent, so repeated bench invocations reuse the first
    * write — and a REGENERATED fixture at the same path gets a fresh
    * key instead of being verified against stale cached data. */
  private def roundtripDir(fmt: String, dir: String)(write: String => Unit): String = {
    val pfx = s"graft_rt_${fmt}_${graft.Tables.pathKey(dir)}_"
    val tmp = s"/tmp/$pfx${graft.Tables.fingerprint(dir, "nation")}"
    if (!Files.exists(java.nio.file.Paths.get(tmp, "_SUCCESS"))) {
      graft.Tables.dropStalePaths(pfx)
      write(tmp)
    }
    tmp
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // exact percentiles (linear interpolation — matches quantile_cont)
    "agg_percentile" -> ((s, dir) =>
      Tables.orders(s, dir)
        .groupBy(col("o_orderstatus"))
        .agg(
          round(expr("percentile(o_totalprice, 0.25)"), 4).as("p25"),
          round(expr("percentile(o_totalprice, 0.5)"), 4).as("median"),
          round(expr("percentile(o_totalprice, 0.75)"), 4).as("p75"),
          round(expr("percentile(o_totalprice, 0.95)"), 4).as("p95"))
        .orderBy("o_orderstatus")),

    // trigonometric/transcendental family (round 8: libm last-ulp drift)
    "fn_trig" -> ((s, dir) =>
      Tables.events(s, dir).select(
        col("event_id"),
        round(sin(col("value")), 8).as("sn"),
        round(cos(col("value")), 8).as("cs"),
        round(tan(col("value") / 100), 8).as("tn"),
        round(atan(col("value")), 8).as("at"),
        round(atan2(col("value"), col("user_id") + lit(1)), 8).as("at2"),
        round(degrees(col("value")), 6).as("dg"),
        round(radians(col("value")), 8).as("rd"),
        round(exp(col("value") / 100), 8).as("ex"))
        .orderBy("event_id")),

    // arg-min/max: value columns chosen by a different ordering column
    // (event_id keys are unique => deterministic)
    "agg_argminmax" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("event_type"))
        .agg(
          max_by(col("user_id"), col("event_id")).as("latest_user"),
          min_by(col("user_id"), col("event_id")).as("first_user"),
          max_by(col("value"), col("event_id")).as("latest_value"))
        .orderBy("event_type")),

    // statistical aggregates on small-magnitude columns (order-dependent
    // FP accumulation drifts ~1e-14 relative — rounding absorbs it)
    "agg_stats" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(
          round(stddev_samp(col("l_quantity")), 6).as("sd_qty"),
          round(var_samp(col("l_quantity")), 6).as("var_qty"),
          round(corr(col("l_quantity"), col("l_discount")), 6).as("corr_qd"),
          round(covar_samp(col("l_quantity"), col("l_discount")), 6).as("cov_qd"))
        .orderBy("l_returnflag")),

    // second string family: edit distance, structural splits
    "fn_string2" -> ((s, dir) =>
      Tables.customer(s, dir).select(
        col("c_custkey"),
        reverse(col("c_mktsegment")).as("rev"),
        repeat(col("c_mktsegment"), 2).as("rep"),
        translate(col("c_mktsegment"), "AEIOU", "aeiou").as("tr"),
        levenshtein(col("c_name"), lit("Customer#000000000")).cast("long").as("lev"),
        split_part(col("c_name"), lit("#"), lit(2)).as("sp"))
        .orderBy("c_custkey")),

    "agg_bool" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("event_type"))
        .agg(
          bool_and(col("value") > 1).as("all_gt1"),
          bool_or(col("value") > 300).as("any_gt300"),
          count_if(col("value") > 100).as("n_gt100"))
        .orderBy("event_type")),

    "win_nth" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_orderstatus"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.orders(s, dir)
        .withColumn("second_price", nth_value(col("o_totalprice"), 2).over(w))
        .select("o_orderkey", "o_orderstatus", "o_totalprice", "second_price")
        .orderBy("o_orderkey")
    }),

    "fn_bitwise" -> ((s, dir) =>
      Tables.events(s, dir).select(
        col("event_id"),
        col("user_id").bitwiseAND(lit(255L)).as("band"),
        col("user_id").bitwiseOR(lit(4096L)).as("bor"),
        col("user_id").bitwiseXOR(col("event_id")).as("bxor"),
        shiftleft(col("user_id"), 3).as("shl"),
        shiftright(col("user_id"), 2).as("shr"),
        bit_count(col("user_id")).cast("long").as("popcnt"))
        .orderBy("event_id")),

    // skew-mitigation pattern: salt the (potentially hot) probe key and
    // replicate the build side across the salt domain, so one hot key
    // spreads over SALT shuffle partitions instead of one straggler
    // task. Result is provably identical to the plain join — the oracle
    // IS the plain join.
    "join_skew_salted" -> ((s, dir) => {
      val salts = 8
      val ev = Tables.events(s, dir)
        .withColumn("salt", (col("event_id") % salts).cast("int"))
      val dim = Tables.customer(s, dir)
        .withColumn("salt", explode(array((0 until salts).map(lit): _*)))
      ev.join(dim, col("user_id") === col("c_custkey") && ev("salt") === dim("salt"))
        .select(col("event_id"), col("c_custkey"), col("c_name"))
        .orderBy("event_id")
    }),

    // higher-order array functions as a surfaced family (they also power
    // the dedup/similarity internals)
    "fn_higher_order" -> ((s, dir) => {
      val toks = split(col("text"), " ")
      Tables.documents(s, dir).select(
        col("doc_id"),
        exists(toks, t => t === "stream").as("has_stream"),
        forall(toks, t => length(t) <= 10).as("all_short"),
        aggregate(transform(toks, t => length(t).cast("long")), lit(0L),
          (acc, v) => acc + v).as("total_len"),
        size(filter(toks, t => length(t) >= 6)).cast("long").as("n_long"),
        array_join(slice(zip_with(toks, reverse(toks),
          (a, b) => concat(a, lit("|"), b)), 1, 3), " ").as("zipped3"))
        .orderBy("doc_id")
    }),

    // typed Dataset API surface: groupByKey + mapGroups with case-class
    // encoders. Scale note: mapGroups has no partial aggregation — every
    // row shuffles — so it's for genuinely per-group imperative logic;
    // the aggregate twins above are the right tool when an agg exists.
    "typed_groups" -> ((s, dir) => {
      import s.implicits._
      Tables.events(s, dir)
        .select(col("user_id"), col("event_type"), col("value"))
        .as[Ev]
        .groupByKey(_.user_id)
        .mapGroups { (uid, it) =>
          val evs = it.toSeq
          val types = evs.map(_.event_type).distinct.sorted.mkString(",")
          (uid, evs.size.toLong, types)
        }
        .toDF("user_id", "n_events", "types")
        .orderBy("user_id")
    }),

    // non-parquet sources: parquet → csv → read back (int/string columns
    // only — csv double formatting is not oracle-stable). The write goes
    // to a deterministic per-sfDir path exactly once per process: the
    // bench/profiler call each query repeatedly, and a fresh temp dir per
    // invocation leaked /tmp space and billed write I/O to a read key
    // (ADVICE r01).
    "source_csv_roundtrip" -> ((s, dir) => {
      val tmp = roundtripDir("csv", dir) { tmp =>
        Tables.nation(s, dir).select("n_nationkey", "n_name", "n_regionkey")
          .write.mode("overwrite").option("header", "true").csv(tmp)
      }
      s.read.option("header", "true").option("inferSchema", "false")
        .schema("n_nationkey INT, n_name STRING, n_regionkey INT")
        .csv(tmp)
        .orderBy("n_nationkey")
    }),

    "source_json_roundtrip" -> ((s, dir) => {
      val tmp = roundtripDir("json", dir) { tmp =>
        Tables.nation(s, dir).select("n_nationkey", "n_name", "n_regionkey")
          .write.mode("overwrite").json(tmp)
      }
      s.read.schema("n_nationkey INT, n_name STRING, n_regionkey INT")
        .json(tmp)
        .orderBy("n_nationkey")
    }),

    // ORC roundtrip (columnar-binary alternative to parquet — doubles
    // survive exactly, unlike the text formats above, so o_totalprice
    // rides along as a precision check). Own write-once path keyed on
    // the ORDERS fingerprint (roundtripDir fingerprints nation).
    "source_orc_roundtrip" -> ((s, dir) => {
      val pfx = s"graft_rt_orc_${graft.Tables.pathKey(dir)}_"
      val tmp = s"/tmp/$pfx${graft.Tables.fingerprint(dir, "orders")}"
      if (!Files.exists(java.nio.file.Paths.get(tmp, "_SUCCESS"))) {
        graft.Tables.dropStalePaths(pfx)
        Tables.orders(s, dir)
          .select("o_orderkey", "o_orderstatus", "o_totalprice")
          .write.mode("overwrite").orc(tmp)
      }
      s.read.orc(tmp).orderBy("o_orderkey")
    }),

    // Malformed-JSONL ingestion with quarantine routing — the landing-
    // zone reality every large-scale ingest faces: upstream producers
    // truncate lines mid-record and silently drop contract fields. A
    // deterministic corruption of orders (o_orderkey % 37 = 0 → last 5
    // chars cut, always killing the closing brace → invalid JSON; else
    // % 41 = 0 → the o_orderkey contract field omitted → valid JSON,
    // broken contract) is written once as a JSONL text artifact. The
    // READ side classifies purely by PARSE OUTCOME (from_json
    // PERMISSIVE; `corrupt` = no parse or no o_custkey, `schema_drift`
    // = parsed but the contract key is missing) — never by the
    // construction rule. The oracle recomputes the report from the
    // rule over the ORIGINAL table, so a hash match proves the
    // parse-based routing recovers ground truth exactly. Scale: the
    // classify+aggregate is one map-side pass to a 3-row report;
    // decimal-stable sums (Stable.dsum contract). */
    "source_jsonl_quarantine" -> ((s, dir) =>
      jsonlClassify(s.read.text(jsonlArtifact(s, dir)))
        .groupBy("status")
        .agg(count(lit(1)).as("cnt"),
          sum(col("k")).as("okey_sum"),
          Stable.dsum(col("price"), 2).as("price_sum"))
        .orderBy("status"))
  )

  /** Write-once corrupted-JSONL landing-zone artifact (the quarantine
    * key + the StreamSpec streaming-routing gate read the same files),
    * keyed per orders fingerprint like the other roundtrip layouts. */
  private[graft] def jsonlArtifact(s: SparkSession, dir: String): String = {
    val pfx = s"graft_jsonlq_${graft.Tables.pathKey(dir)}_"
    val tmp = s"/tmp/$pfx${graft.Tables.fingerprint(dir, "orders")}"
    if (!Files.exists(java.nio.file.Paths.get(tmp, "_SUCCESS"))) {
      graft.Tables.dropStalePaths(pfx)
      val full = to_json(struct(col("o_orderkey"), col("o_custkey"),
        col("o_orderstatus"), col("o_totalprice")))
      val drift = to_json(struct(col("o_custkey"),
        col("o_orderstatus"), col("o_totalprice")))
      Tables.orders(s, dir).select(
        when(col("o_orderkey") % 37 === 0,
          full.substr(lit(1), length(full) - 5))
          .when(col("o_orderkey") % 41 === 0, drift)
          .otherwise(full).as("value"))
        .write.mode("overwrite").text(tmp)
    }
    tmp
  }

  /** Parse-outcome classifier over raw JSONL `value` lines — the ONE
    * definition shared by the batch report and the streaming DLQ
    * routing (StreamSpec), so the two paths cannot fork. */
  private[graft] def jsonlClassify(lines: DataFrame): DataFrame = {
    val p = from_json(col("value"),
      org.apache.spark.sql.types.StructType.fromDDL(
        "o_orderkey BIGINT, o_custkey BIGINT, " +
        "o_orderstatus STRING, o_totalprice DOUBLE"))
    lines.select(col("value"), p.as("p"))
      .select(col("value"),
        when(col("p").isNull || col("p.o_custkey").isNull, lit("corrupt"))
          .when(col("p.o_orderkey").isNull, lit("schema_drift"))
          .otherwise(lit("ok")).as("status"),
        col("p.o_orderkey").as("k"), col("p.o_totalprice").as("price"))
  }

  val oracleSql: Map[String, String] = Map(
    "agg_percentile" ->
      """SELECT o_orderstatus,
        |  ROUND(quantile_cont(o_totalprice, 0.25), 4) AS p25,
        |  ROUND(quantile_cont(o_totalprice, 0.5), 4) AS median,
        |  ROUND(quantile_cont(o_totalprice, 0.75), 4) AS p75,
        |  ROUND(quantile_cont(o_totalprice, 0.95), 4) AS p95
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "fn_trig" ->
      """SELECT event_id,
        |  ROUND(sin(value), 8) AS sn,
        |  ROUND(cos(value), 8) AS cs,
        |  ROUND(tan(value / 100), 8) AS tn,
        |  ROUND(atan(value), 8) AS at,
        |  ROUND(atan2(value, user_id + 1), 8) AS at2,
        |  ROUND(degrees(value), 6) AS dg,
        |  ROUND(radians(value), 8) AS rd,
        |  ROUND(exp(value / 100), 8) AS ex
        |FROM events ORDER BY event_id""".stripMargin,

    "agg_argminmax" ->
      """SELECT event_type,
        |  arg_max(user_id, event_id) AS latest_user,
        |  arg_min(user_id, event_id) AS first_user,
        |  arg_max(value, event_id) AS latest_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "agg_stats" ->
      """SELECT l_returnflag,
        |  ROUND(stddev_samp(l_quantity), 6) AS sd_qty,
        |  ROUND(var_samp(l_quantity), 6) AS var_qty,
        |  ROUND(corr(l_quantity, l_discount), 6) AS corr_qd,
        |  ROUND(covar_samp(l_quantity, l_discount), 6) AS cov_qd
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "fn_string2" ->
      """SELECT c_custkey,
        |  reverse(c_mktsegment) AS rev,
        |  repeat(c_mktsegment, 2) AS rep,
        |  translate(c_mktsegment, 'AEIOU', 'aeiou') AS tr,
        |  levenshtein(c_name, 'Customer#000000000') AS lev,
        |  split_part(c_name, '#', 2) AS sp
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "agg_bool" ->
      """SELECT event_type,
        |  bool_and(value > 1) AS all_gt1,
        |  bool_or(value > 300) AS any_gt300,
        |  CAST(count_if(value > 100) AS BIGINT) AS n_gt100
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "win_nth" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice,
        |  nth_value(o_totalprice, 2) OVER (PARTITION BY o_orderstatus
        |    ORDER BY o_totalprice DESC, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_price
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "fn_bitwise" ->
      """SELECT event_id,
        |  user_id & 255 AS band,
        |  user_id | 4096 AS bor,
        |  xor(user_id, event_id) AS bxor,
        |  user_id << 3 AS shl,
        |  user_id >> 2 AS shr,
        |  CAST(bit_count(user_id) AS BIGINT) AS popcnt
        |FROM events ORDER BY event_id""".stripMargin,

    "join_skew_salted" ->
      """SELECT event_id, c_custkey, c_name
        |FROM events JOIN customer ON user_id = c_custkey
        |ORDER BY event_id""".stripMargin,

    "fn_higher_order" ->
      """SELECT doc_id,
        |  len(list_filter(string_split(text, ' '), t -> t = 'stream')) > 0 AS has_stream,
        |  len(list_filter(string_split(text, ' '), t -> NOT length(t) <= 10)) = 0 AS all_short,
        |  CAST(list_sum(list_transform(string_split(text, ' '),
        |       t -> CAST(length(t) AS BIGINT))) AS BIGINT) AS total_len,
        |  CAST(len(list_filter(string_split(text, ' '), t -> length(t) >= 6)) AS BIGINT) AS n_long,
        |  array_to_string(list_slice(
        |    list_transform(string_split(text, ' '),
        |      (t, i) -> t || '|' || list_reverse(string_split(text, ' '))[i]),
        |    1, 3), ' ') AS zipped3
        |FROM documents ORDER BY doc_id""".stripMargin,

    "typed_groups" ->
      """SELECT user_id, COUNT(*) AS n_events,
        |  string_agg(DISTINCT event_type, ',' ORDER BY event_type) AS types
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "source_csv_roundtrip" ->
      "SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey",

    "source_json_roundtrip" ->
      "SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey",

    // oracle reads the ORIGINAL orders parquet: the orc hop must be
    // bit-exact, doubles included
    "source_orc_roundtrip" ->
      "SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders ORDER BY o_orderkey",

    // ground truth from the construction rule over the ORIGINAL table;
    // the Spark side must reach the same report from parse outcomes
    // alone (JSON round-trips doubles exactly, so the DECIMAL(28,2)
    // casts see identical values on both engines)
    "source_jsonl_quarantine" ->
      """WITH c AS (
        |  SELECT CASE WHEN o_orderkey % 37 = 0 THEN 'corrupt'
        |              WHEN o_orderkey % 41 = 0 THEN 'schema_drift'
        |              ELSE 'ok' END AS status,
        |         o_orderkey, o_totalprice
        |  FROM orders)
        |SELECT status, COUNT(*) AS cnt,
        |  CAST(SUM(CASE WHEN status = 'ok' THEN o_orderkey END) AS BIGINT) AS okey_sum,
        |  CAST(SUM(CASE WHEN status <> 'corrupt'
        |               THEN CAST(o_totalprice AS DECIMAL(28,2)) END) AS DOUBLE) AS price_sum
        |FROM c GROUP BY status ORDER BY status""".stripMargin
  )
}
