package graft.relational

import graft.{QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Round-2 widening, batch D: bag-semantics set ops, the range source,
  * struct-exploding generators (inline, stack), IGNORE NULLS window
  * navigation, the second array family, and multi-column distinct
  * counting.
  */
object Extras4 extends QueryPack {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // INTERSECT ALL / EXCEPT ALL: bag semantics — duplicates preserved
    // by multiplicity, the form dedup accounting actually needs
    "set_intersect_all" -> ((s, dir) => {
      val a = Tables.events(s, dir).where(col("event_id") <= 6000)
        .select(col("user_id"), col("event_type"))
      val b = Tables.events(s, dir).where(col("event_id") > 3000)
        .select(col("user_id"), col("event_type"))
      a.intersectAll(b).orderBy("user_id", "event_type")
    }),

    "set_except_all" -> ((s, dir) => {
      val a = Tables.events(s, dir).where(col("event_id") <= 6000)
        .select(col("user_id"), col("event_type"))
      val b = Tables.events(s, dir).where(col("event_id") > 3000)
        .select(col("user_id"), col("event_type"))
      a.exceptAll(b).orderBy("user_id", "event_type")
    }),

    // generated source: spark.range is the zero-I/O table generator
    // (parallelized on the cluster, not enumerated on the driver)
    "source_range" -> ((s, dir) =>
      s.range(1, 1001).toDF("id")
        .select(col("id"),
          (col("id") * col("id")).as("sq"),
          (col("id") % 7).as("m7"))
        .orderBy("id")),

    // inline: explode an array of STRUCTS into columns — the generator
    // behind flattening nested event payloads
    "fn_inline" -> ((s, dir) =>
      Tables.orders(s, dir)
        .where(col("o_orderkey") <= 2000)
        .select(col("o_orderkey"), inline(array(
          struct(lit("lo").as("tag"), (col("o_totalprice") * 0.1).as("amt")),
          struct(lit("hi").as("tag"), (col("o_totalprice") * 0.9).as("amt")))))
        .select(col("o_orderkey"), col("tag"), round(col("amt"), 4).as("amt"))
        .orderBy("o_orderkey", "tag")),

    // stack: columns-to-rows generator (the SQL-side unpivot primitive)
    "fn_stack" -> ((s, dir) => {
      Tables.lineitem(s, dir).createOrReplaceTempView("lineitem_v")
      s.sql("""
        SELECT l_orderkey, l_linenumber, m, v
        FROM lineitem_v
        LATERAL VIEW stack(2, 'qty', l_quantity, 'disc', l_discount) AS m, v
        WHERE l_orderkey <= 2000
        ORDER BY l_orderkey, l_linenumber, m""")
    }),

    // IGNORE NULLS navigation: carry the last/next non-null reading
    // past gaps — sensor-style sparse columns
    "win_ignore_nulls" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("t"), col("event_id"))
      Tables.events(s, dir)
        .withColumn("t", unix_timestamp(date_trunc("second", col("ts"))))
        .withColumn("hi", when(col("value") > 100, col("value")))
        .select(col("event_id"), col("user_id"), col("t"), col("hi"),
          lag(col("hi"), 1, null, ignoreNulls = true).over(w).as("prev_hi"),
          lead(col("hi"), 1, null, ignoreNulls = true).over(w).as("next_hi"))
        .orderBy("event_id")
    }),

    // second array family: set algebra on token arrays (both engines
    // sort the results — DuckDB's list_intersect does not preserve
    // left-operand order the way Spark's array_intersect does)
    "fn_array2" -> ((s, dir) => {
      val toks = split(col("text"), " ")
      val stop = array(lit("the"), lit("and"), lit("a"), lit("of"))
      Tables.documents(s, dir).select(
        col("doc_id"),
        array_join(sort_array(array_intersect(toks, stop)), ",").as("stops_present"),
        array_join(sort_array(array_except(array_distinct(toks), stop)), ",")
          .as("content_vocab"),
        array_join(sort_array(array_union(slice(toks, 1, 3), stop)), ",").as("head_u_stop"),
        coalesce(array_position(toks, "the"), lit(0L)).as("first_the"),
        size(array_remove(toks, "the")).cast("long").as("n_no_the"))
        .orderBy("doc_id")
    }),

    // grouped top-k as a NATIVE plan node (custom LogicalPlan + Strategy
    // + SparkPlan, org.apache.spark.sql.graft.GroupTopK): full rows
    // through one hash exchange + sort, then a streaming O(1)-state
    // per-partition filter — no rank column, no per-group buffering.
    // PlanSpec asserts the GroupTopKExec node and its single exchange.
    "topk_per_group_native" -> ((s, dir) => {
      import org.apache.spark.sql.graft.GroupTopK
      GroupTopK.topk(
          Tables.orders(s, dir)
            .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice")),
          3,
          Seq("o_orderstatus"),
          Seq("o_totalprice" -> true, "o_orderkey" -> false))
        .orderBy(col("o_orderstatus"), col("o_totalprice").desc, col("o_orderkey"))
    }),

    // TPC-H Q3 shape (shipping-priority revenue): 3-way join, derived
    // revenue accumulated in DECIMAL, top-10 by revenue — the classic
    // "does the whole SQL stack compose" probe
    "sql_tpch_q3" -> ((s, dir) => {
      Tables.customer(s, dir).createOrReplaceTempView("customer_v")
      Tables.orders(s, dir).createOrReplaceTempView("orders_v")
      Tables.lineitem(s, dir).createOrReplaceTempView("lineitem_v")
      s.sql("""
        SELECT o_orderkey,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,4)))
                    AS DOUBLE) AS revenue,
               CAST(o_orderdate AS DATE) AS odate
        FROM customer_v JOIN orders_v ON c_custkey = o_custkey
                        JOIN lineitem_v ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1997-03-15 00:00:00'
          AND l_shipdate > TIMESTAMP '1997-03-15 00:00:00'
        GROUP BY o_orderkey, o_orderdate
        ORDER BY revenue DESC, o_orderkey
        LIMIT 10""")
    }),

    // TPC-H Q10 shape (returned-item customer revenue): 4-way join with
    // a broadcastable dim, grouped revenue, top-20
    "sql_tpch_q10" -> ((s, dir) => {
      Tables.customer(s, dir).createOrReplaceTempView("customer_v")
      Tables.orders(s, dir).createOrReplaceTempView("orders_v")
      Tables.lineitem(s, dir).createOrReplaceTempView("lineitem_v")
      Tables.nation(s, dir).createOrReplaceTempView("nation_v")
      s.sql("""
        SELECT c_custkey, c_name, n_name,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,4)))
                    AS DOUBLE) AS revenue
        FROM customer_v JOIN orders_v ON c_custkey = o_custkey
                        JOIN lineitem_v ON l_orderkey = o_orderkey
                        JOIN nation_v ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY c_custkey, c_name, n_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 20""")
    }),

    // custom table-generating function: one row per word trigram with
    // its position, via a real Generator subclass (functions.NGramsUdtf)
    // instead of the transform+filter+explode composition — completes
    // the UDTF extension surface with a custom implementation
    "explode_ngrams_udtf" -> ((s, dir) => {
      import graft.functions.NGramsUdtf.ngrams
      Tables.documents(s, dir)
        .select(col("doc_id"),
          ngrams(split(col("text"), " "), 3).as(Seq("pos", "ngram")))
        .select(col("doc_id"), col("pos").cast("long").as("pos"), col("ngram"))
        .orderBy("doc_id", "pos")
    }),

    // dialect parity: GROUP BY ALL / ORDER BY ALL through the SQL
    // front-end (every non-aggregate output column groups; order by
    // the full output row)
    "sql_group_order_all" -> ((s, dir) => {
      Tables.events(s, dir).createOrReplaceTempView("events_v")
      s.sql("""
        SELECT event_type, user_id % 4 AS ubucket, COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS sv
        FROM events_v GROUP BY ALL ORDER BY ALL""")
    }),

    // inline literal table source (VALUES clause)
    "source_values" -> ((s, dir) =>
      s.sql("""
        SELECT CAST(id AS BIGINT) AS id, name, CAST(score AS DOUBLE) AS score
        FROM VALUES (1, 'alpha', 1.5), (2, 'beta', 2.5), (3, 'gamma', 3.5)
          AS t(id, name, score)
        ORDER BY id""")),

    // null-handling API surface: na.fill / na.drop / na.replace over
    // derived nullable columns (the cleanup pass every ingest runs)
    "fn_na" -> ((s, dir) => {
      val withNulls = Tables.events(s, dir).select(
        col("event_id"),
        nullif(col("user_id") % 5, lit(2L)).as("u5"),
        nullif(col("event_type"), lit("error")).as("etype"),
        when(col("value") > 100, col("value")).as("hi"))
      withNulls.na.fill(Map("u5" -> -1L, "etype" -> "none"))
        .na.replace("etype", Map("signup" -> "join"))
        .na.drop(Seq("hi"))
        .orderBy("event_id")
    }),

    // second map family: construction, merge, filtering, value
    // transformation — entries emitted as a sorted k=v string so the
    // unordered map type compares deterministically across engines
    "fn_map2" -> ((s, dir) => {
      val base = map(lit("type"), col("event_type"),
        lit("uid"), col("user_id").cast("string"))
      val extra = map(lit("k"), get_json_object(col("props"), "$.k"))
      val m = map_concat(base, extra)
      Tables.events(s, dir).select(
        col("event_id"),
        // null-valued entries become NULL (array_join skips them) — a
        // bare concat_ws would keep the key as "k" while the oracle's
        // 'k=' || NULL drops the whole entry
        array_join(sort_array(transform(map_entries(m),
          e => when(e.getField("value").isNotNull,
            concat_ws("=", e.getField("key"), e.getField("value"))))), ",")
          .as("entries"),
        map_contains_key(m, "uid").as("has_uid"),
        map_contains_key(m, "missing").as("has_missing"),
        size(map_filter(m, (_, v) => length(v) >= 3)).cast("long").as("n_long_vals"),
        element_at(transform_values(m, (_, v) => upper(v)), "type").as("type_up"))
        .orderBy("event_id")
    }),

    // third string family: character-class trims, prefix/suffix tests
    "fn_string3" -> ((s, dir) =>
      Tables.customer(s, dir).select(
        col("c_custkey"),
        trim(col("c_name"), "Customer#0").as("tr"),
        ltrim(col("c_name"), "Custo").as("ltr"),
        rtrim(col("c_name"), "0123456789").as("rtr"),
        substring(col("c_name"), 1, 8).as("l8"),
        col("c_name").substr(length(col("c_name")) - 2, lit(3)).as("r3"),
        col("c_name").startsWith("Customer").as("sw"),
        col("c_name").endsWith("0").as("ew"),
        col("c_name").contains("#").as("ct"))
        .orderBy("c_custkey")),

    // ordered string aggregation: listagg ... WITHIN GROUP (the ANSI
    // form — deterministic because the order is declared)
    "agg_listagg" -> ((s, dir) => {
      Tables.customer(s, dir).createOrReplaceTempView("customer_v")
      s.sql("""
        SELECT c_mktsegment,
               listagg(c_name, ',') WITHIN GROUP (ORDER BY c_name) AS names
        FROM customer_v
        WHERE c_custkey <= 40
        GROUP BY c_mktsegment ORDER BY c_mktsegment""")
    }),

    // sketch-based percentiles (KLL-style bounded memory — the form
    // that replaces exact percentile at 100 TB, where a full sort per
    // group is off the table). Probabilistic: no SQL oracle; rank-error
    // bound vs the exact twin asserted in FunctionsSpec.
    "agg_approx_percentile" -> ((s, dir) =>
      Tables.orders(s, dir)
        .groupBy(col("o_orderstatus"))
        .agg(
          expr("approx_percentile(o_totalprice, 0.5, 1000)").as("p50"),
          expr("approx_percentile(o_totalprice, 0.95, 1000)").as("p95"),
          count(lit(1)).as("n"))
        .orderBy("o_orderstatus")),

    // multi-column distinct counting (one pass, no concat hacks)
    "agg_distinct_multi" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("event_type"))
        .agg(
          count_distinct(col("user_id"), col("event_type")).as("uid_type"),
          count_distinct(col("user_id")).as("uids"))
        .orderBy("event_type"))
  )

  val oracleSql: Map[String, String] = Map(
    "set_intersect_all" ->
      """SELECT user_id, event_type FROM events WHERE event_id <= 6000
        |INTERSECT ALL
        |SELECT user_id, event_type FROM events WHERE event_id > 3000
        |ORDER BY user_id, event_type""".stripMargin,

    "set_except_all" ->
      """SELECT user_id, event_type FROM events WHERE event_id <= 6000
        |EXCEPT ALL
        |SELECT user_id, event_type FROM events WHERE event_id > 3000
        |ORDER BY user_id, event_type""".stripMargin,

    "source_range" ->
      """SELECT CAST(g AS BIGINT) AS id, CAST(g * g AS BIGINT) AS sq,
        |       CAST(g % 7 AS BIGINT) AS m7
        |FROM generate_series(1, 1000) t(g) ORDER BY id""".stripMargin,

    "fn_inline" ->
      """SELECT o_orderkey, 'lo' AS tag, ROUND(o_totalprice * 0.1, 4) AS amt
        |FROM orders WHERE o_orderkey <= 2000
        |UNION ALL
        |SELECT o_orderkey, 'hi', ROUND(o_totalprice * 0.9, 4)
        |FROM orders WHERE o_orderkey <= 2000
        |ORDER BY o_orderkey, tag""".stripMargin,

    "fn_stack" ->
      """SELECT l_orderkey, l_linenumber, m, v FROM (
        |  SELECT l_orderkey, l_linenumber, 'qty' AS m, l_quantity AS v
        |  FROM lineitem WHERE l_orderkey <= 2000
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'disc', l_discount
        |  FROM lineitem WHERE l_orderkey <= 2000)
        |ORDER BY l_orderkey, l_linenumber, m""".stripMargin,

    "win_ignore_nulls" ->
      """WITH e AS (
        |  SELECT event_id, user_id,
        |    CAST(floor(epoch(date_trunc('second', ts))) AS BIGINT) AS t,
        |    CASE WHEN value > 100 THEN value END AS hi
        |  FROM events)
        |SELECT event_id, user_id, t, hi,
        |  lag(hi IGNORE NULLS) OVER w AS prev_hi,
        |  lead(hi IGNORE NULLS) OVER w AS next_hi
        |FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)
        |ORDER BY event_id""".stripMargin,

    "fn_array2" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |s AS (SELECT ['the', 'and', 'a', 'of'] AS stop)
        |SELECT doc_id,
        |  coalesce(array_to_string(list_sort(list_intersect(toks, stop)), ','), '')
        |    AS stops_present,
        |  array_to_string(list_sort(list_filter(list_distinct(toks),
        |    x -> NOT list_contains(stop, x))), ',') AS content_vocab,
        |  array_to_string(list_sort(list_distinct(list_concat(toks[1:3], stop))), ',')
        |    AS head_u_stop,
        |  CAST(coalesce(list_position(toks, 'the'), 0) AS BIGINT) AS first_the,
        |  CAST(len(list_filter(toks, x -> x != 'the')) AS BIGINT) AS n_no_the
        |FROM d, s ORDER BY doc_id""".stripMargin,

    "topk_per_group_native" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |QUALIFY row_number() OVER (PARTITION BY o_orderstatus
        |  ORDER BY o_totalprice DESC, o_orderkey) <= 3
        |ORDER BY o_orderstatus, o_totalprice DESC, o_orderkey""".stripMargin,

    "sql_tpch_q3" ->
      """SELECT o_orderkey,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,4)))
        |       AS DOUBLE) AS revenue,
        |  CAST(o_orderdate AS DATE) AS odate
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |              JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1997-03-15 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1997-03-15 00:00:00'
        |GROUP BY o_orderkey, o_orderdate
        |ORDER BY revenue DESC, o_orderkey
        |LIMIT 10""".stripMargin,

    "sql_tpch_q10" ->
      """SELECT c_custkey, c_name, n_name,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,4)))
        |       AS DOUBLE) AS revenue
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |              JOIN lineitem ON l_orderkey = o_orderkey
        |              JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY c_custkey, c_name, n_name
        |ORDER BY revenue DESC, c_custkey
        |LIMIT 20""".stripMargin,

    "explode_ngrams_udtf" ->
      """WITH t AS (
        |  SELECT doc_id, generate_subscripts(string_split(text, ' '), 1) AS p,
        |         unnest(string_split(text, ' ')) AS tok
        |  FROM documents)
        |SELECT doc_id, CAST(p - 1 AS BIGINT) AS pos,
        |  tok || ' ' || lead(tok) OVER w || ' ' || lead(tok, 2) OVER w AS ngram
        |FROM t WINDOW w AS (PARTITION BY doc_id ORDER BY p)
        |QUALIFY lead(tok, 2) OVER w IS NOT NULL
        |ORDER BY doc_id, pos""".stripMargin,

    "sql_group_order_all" ->
      """SELECT event_type, user_id % 4 AS ubucket, COUNT(*) AS n,
        |       CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS sv
        |FROM events GROUP BY ALL ORDER BY ALL""".stripMargin,

    "source_values" ->
      """SELECT CAST(id AS BIGINT) AS id, name, CAST(score AS DOUBLE) AS score
        |FROM (VALUES (1, 'alpha', 1.5), (2, 'beta', 2.5), (3, 'gamma', 3.5))
        |  t(id, name, score)
        |ORDER BY id""".stripMargin,

    "fn_na" ->
      """SELECT event_id,
        |  coalesce(nullif(user_id % 5, 2), -1) AS u5,
        |  CASE coalesce(nullif(event_type, 'error'), 'none')
        |    WHEN 'signup' THEN 'join'
        |    ELSE coalesce(nullif(event_type, 'error'), 'none') END AS etype,
        |  CASE WHEN value > 100 THEN value END AS hi
        |FROM events
        |WHERE (CASE WHEN value > 100 THEN value END) IS NOT NULL
        |ORDER BY event_id""".stripMargin,

    "fn_map2" ->
      """SELECT event_id,
        |  array_to_string(list_sort([
        |    'type=' || event_type,
        |    'uid=' || CAST(user_id AS VARCHAR),
        |    'k=' || (props->>'$.k')]), ',') AS entries,
        |  TRUE AS has_uid,
        |  FALSE AS has_missing,
        |  CAST(len(list_filter(
        |    [event_type, CAST(user_id AS VARCHAR), props->>'$.k'],
        |    v -> length(v) >= 3)) AS BIGINT) AS n_long_vals,
        |  upper(event_type) AS type_up
        |FROM events ORDER BY event_id""".stripMargin,

    "fn_string3" ->
      """SELECT c_custkey,
        |  trim(c_name, 'Customer#0') AS tr,
        |  ltrim(c_name, 'Custo') AS ltr,
        |  rtrim(c_name, '0123456789') AS rtr,
        |  left(c_name, 8) AS l8,
        |  right(c_name, 3) AS r3,
        |  starts_with(c_name, 'Customer') AS sw,
        |  ends_with(c_name, '0') AS ew,
        |  contains(c_name, '#') AS ct
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "agg_listagg" ->
      """SELECT c_mktsegment,
        |  string_agg(c_name, ',' ORDER BY c_name) AS names
        |FROM customer WHERE c_custkey <= 40
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "agg_distinct_multi" ->
      """SELECT event_type,
        |  COUNT(DISTINCT (user_id, event_type)) AS uid_type,
        |  COUNT(DISTINCT user_id) AS uids
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin
  )
}
