package graft.relational

import graft.{QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{MapType, StringType}

/** Scalar-function families (SURVEY.md §2.9): one query per family, each
  * exercising 4–8 built-ins as projected columns. All stay inside
  * whole-stage codegen (no UDFs). Cross-engine traps handled per
  * FIXTURES.md: int-ish outputs cast to LONG (DuckDB emits BIGINT),
  * transcendentals rounded to 8 dp (libm last-ulp drift), double→int
  * via floor (DuckDB CAST rounds, Spark truncates), regexp_replace is
  * global in Spark but needs 'g' in DuckDB.
  */
object Scalars extends QueryPack {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "fn_string" -> ((s, dir) =>
      Tables.customer(s, dir).select(
        col("c_custkey"),
        concat(col("c_name"), lit("-"), col("c_mktsegment")).as("cat"),
        upper(col("c_name")).as("up"),
        lower(col("c_mktsegment")).as("low"),
        substring(col("c_name"), 10, 5).as("sub"),
        length(col("c_name")).cast("long").as("len"),
        trim(concat(lit("  "), col("c_mktsegment"), lit("  "))).as("trimmed"),
        lpad(col("c_custkey").cast("string"), 12, "0").as("lp"),
        replace(col("c_name"), lit("Customer"), lit("Cust")).as("repl"),
        element_at(split(col("c_name"), "#"), 2).as("after_hash"),
        instr(col("c_name"), "#").cast("long").as("hash_pos"))
        .orderBy("c_custkey")),

    "fn_regex" -> ((s, dir) =>
      Tables.documents(s, dir).select(
        col("doc_id"),
        regexp_extract(col("text"), "^([a-z]+)", 1).as("first_word"),
        regexp_extract(col("text"), "([a-z]+) ([a-z]+)", 2).as("second_word"),
        regexp_replace(substring(col("text"), 1, 30), "[aeiou]", "*").as("starred"),
        col("text").rlike("stream.*batch").as("has_sb"))
        .orderBy("doc_id")),

    "fn_date" -> ((s, dir) =>
      Tables.orders(s, dir).select(
        col("o_orderkey"),
        col("o_orderdate").cast("date").as("od"),
        year(col("o_orderdate")).cast("long").as("yr"),
        month(col("o_orderdate")).cast("long").as("mo"),
        dayofmonth(col("o_orderdate")).cast("long").as("dom"),
        date_trunc("month", col("o_orderdate")).cast("date").as("month_start"),
        date_add(col("o_orderdate").cast("date"), 30).as("plus30"),
        datediff(lit("2000-01-01").cast("date"), col("o_orderdate").cast("date"))
          .cast("long").as("days_to_y2k"),
        unix_timestamp(col("o_orderdate")).as("epoch_s"),
        make_date(year(col("o_orderdate")), month(col("o_orderdate")), lit(1)).as("md"))
        .orderBy("o_orderkey")),

    "fn_math" -> ((s, dir) =>
      Tables.lineitem(s, dir).select(
        col("l_orderkey"), col("l_linenumber"),
        round(col("l_extendedprice") * 0.8, 1).as("r1"),
        floor(col("l_extendedprice")).cast("long").as("fl"),
        ceil(col("l_extendedprice")).cast("long").as("ce"),
        abs(col("l_tax") - 0.05).as("ab"),
        pow(col("l_quantity"), 2.0).as("pw"),
        sqrt(col("l_extendedprice")).as("sq"),
        round(log(col("l_extendedprice")), 8).as("lg"),
        round(log10(col("l_extendedprice")), 8).as("l10"),
        (col("l_quantity") % 7.0).as("md"),
        signum(col("l_extendedprice") - 30000).cast("int").as("sg"),
        greatest(col("l_quantity"), col("l_tax") * 100).as("gr"),
        least(col("l_quantity"), col("l_discount") * 100).as("le"))
        .orderBy("l_orderkey", "l_linenumber")),

    "fn_cond" -> ((s, dir) =>
      Tables.events(s, dir).select(
        col("event_id"),
        when(col("value") < 50, "low")
          .when(col("value") < 150, "mid")
          .otherwise("high").as("cat"),
        coalesce(nullif(col("event_type"), lit("click")), lit("was_click")).as("co"),
        when(col("value") > 100, "big").otherwise("small").as("iff"))
        .orderBy("event_id")),

    "fn_cast" -> ((s, dir) =>
      Tables.events(s, dir).select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k_int"),
        floor(col("value")).cast("long").as("v_floor"),
        col("user_id").cast("double").as("id_d"),
        col("user_id").cast("string").as("id_s"),
        col("ts").cast("date").as("ts_date"),
        to_date(date_format(col("ts"), "yyyy-MM-dd")).as("ts_rt"))
        .orderBy("event_id")),

    "fn_array" -> ((s, dir) => {
      val toks = split(col("text"), " ")
      Tables.documents(s, dir).select(
        col("doc_id"),
        size(toks).cast("long").as("n_toks"),
        array_contains(toks, "stream").as("has_stream"),
        array_join(slice(toks, 1, 5), " ").as("first5"),
        array_join(slice(sort_array(toks), 1, 10), " ").as("sorted10"),
        size(array_distinct(toks)).cast("long").as("n_uniq"))
        .orderBy("doc_id")
    }),

    "fn_map" -> ((s, dir) => {
      val m = from_json(col("props"), MapType(StringType, StringType))
      Tables.events(s, dir).select(
        col("event_id"),
        array_join(sort_array(map_keys(m)), ",").as("keys"),
        element_at(m, "k").cast("long").as("k_val"),
        size(map_keys(m)).cast("long").as("n_keys"))
        .orderBy("event_id")
    }),

    "fn_json" -> ((s, dir) =>
      Tables.events(s, dir)
        .select(
          col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k1"),
          json_tuple(col("props"), "k").as("k2_raw"),
          from_json(col("props"), MapType(StringType, StringType)).getItem("k")
            .cast("long").as("k3"))
        .withColumn("k2", col("k2_raw").cast("long")).drop("k2_raw")
        .orderBy("event_id")),

    // Generator/UDTF path: one row per token with its 1-based position
    "explode_tokens" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"), posexplode(split(col("text"), " ")))
        .select(col("doc_id"), (col("pos") + 1).cast("long").as("pos1"),
          col("col").as("tok"))
        .orderBy("doc_id", "pos1"))
  )

  val oracleSql: Map[String, String] = Map(
    "fn_string" ->
      """SELECT c_custkey,
        |  c_name || '-' || c_mktsegment AS cat,
        |  upper(c_name) AS up, lower(c_mktsegment) AS low,
        |  substring(c_name, 10, 5) AS sub,
        |  length(c_name) AS len,
        |  trim('  ' || c_mktsegment || '  ') AS trimmed,
        |  lpad(CAST(c_custkey AS VARCHAR), 12, '0') AS lp,
        |  replace(c_name, 'Customer', 'Cust') AS repl,
        |  string_split(c_name, '#')[2] AS after_hash,
        |  instr(c_name, '#') AS hash_pos
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "fn_regex" ->
      """SELECT doc_id,
        |  regexp_extract(text, '^([a-z]+)', 1) AS first_word,
        |  regexp_extract(text, '([a-z]+) ([a-z]+)', 2) AS second_word,
        |  regexp_replace(substring(text, 1, 30), '[aeiou]', '*', 'g') AS starred,
        |  regexp_matches(text, 'stream.*batch') AS has_sb
        |FROM documents ORDER BY doc_id""".stripMargin,

    "fn_date" ->
      """SELECT o_orderkey,
        |  CAST(o_orderdate AS DATE) AS od,
        |  year(o_orderdate) AS yr, month(o_orderdate) AS mo,
        |  day(o_orderdate) AS dom,
        |  CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
        |  CAST(o_orderdate AS DATE) + 30 AS plus30,
        |  date_diff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS days_to_y2k,
        |  CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
        |  make_date(CAST(year(o_orderdate) AS INT), CAST(month(o_orderdate) AS INT), 1) AS md
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "fn_math" ->
      """SELECT l_orderkey, l_linenumber,
        |  round(l_extendedprice * 0.8, 1) AS r1,
        |  CAST(floor(l_extendedprice) AS BIGINT) AS fl,
        |  CAST(ceil(l_extendedprice) AS BIGINT) AS ce,
        |  abs(l_tax - 0.05) AS ab,
        |  pow(l_quantity, 2.0) AS pw,
        |  sqrt(l_extendedprice) AS sq,
        |  round(ln(l_extendedprice), 8) AS lg,
        |  round(log10(l_extendedprice), 8) AS l10,
        |  l_quantity % 7.0 AS md,
        |  CAST(sign(l_extendedprice - 30000) AS INT) AS sg,
        |  greatest(l_quantity, l_tax * 100) AS gr,
        |  least(l_quantity, l_discount * 100) AS le
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "fn_cond" ->
      """SELECT event_id,
        |  CASE WHEN value < 50 THEN 'low'
        |       WHEN value < 150 THEN 'mid' ELSE 'high' END AS cat,
        |  coalesce(nullif(event_type, 'click'), 'was_click') AS co,
        |  CASE WHEN value > 100 THEN 'big' ELSE 'small' END AS iff
        |FROM events ORDER BY event_id""".stripMargin,

    "fn_cast" ->
      """SELECT event_id,
        |  CAST(props->>'$.k' AS BIGINT) AS k_int,
        |  CAST(floor(value) AS BIGINT) AS v_floor,
        |  CAST(user_id AS DOUBLE) AS id_d,
        |  CAST(user_id AS VARCHAR) AS id_s,
        |  CAST(ts AS DATE) AS ts_date,
        |  CAST(strftime(ts, '%Y-%m-%d') AS DATE) AS ts_rt
        |FROM events ORDER BY event_id""".stripMargin,

    "fn_array" ->
      """SELECT doc_id,
        |  len(string_split(text, ' ')) AS n_toks,
        |  list_contains(string_split(text, ' '), 'stream') AS has_stream,
        |  array_to_string(list_slice(string_split(text, ' '), 1, 5), ' ') AS first5,
        |  array_to_string(list_slice(list_sort(string_split(text, ' ')), 1, 10), ' ') AS sorted10,
        |  len(list_distinct(string_split(text, ' '))) AS n_uniq
        |FROM documents ORDER BY doc_id""".stripMargin,

    "fn_map" ->
      """SELECT event_id,
        |  array_to_string(list_sort(json_keys(props)), ',') AS keys,
        |  CAST(props->>'$.k' AS BIGINT) AS k_val,
        |  len(json_keys(props)) AS n_keys
        |FROM events ORDER BY event_id""".stripMargin,

    "fn_json" ->
      """SELECT event_id,
        |  CAST(props->>'$.k' AS BIGINT) AS k1,
        |  CAST(props->>'$.k' AS BIGINT) AS k2,
        |  CAST(props->>'$.k' AS BIGINT) AS k3
        |FROM events ORDER BY event_id""".stripMargin,

    "explode_tokens" ->
      """SELECT doc_id, pos1, tok FROM (
        |  SELECT doc_id,
        |    generate_subscripts(string_split(text, ' '), 1) AS pos1,
        |    unnest(string_split(text, ' ')) AS tok
        |  FROM documents)
        |ORDER BY doc_id, pos1""".stripMargin
  )
}
