package graft.relational

import graft.{QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Round-2 widening: the SQL front-end surface, second date family,
  * median, schema-flexible set ops (union-by-name, unpivot), grouping
  * indicators, sequence generation, bitwise aggregates, and Zipf vocab
  * ranking. Each key mirrors a DuckDB oracle exactly (determinism rules
  * in SURVEY §7.5).
  */
object Extras2 extends QueryPack {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // SQL front-end surface: the same engine drives spark.sql over
    // registered temp views — TPC-H Q1 shape with decimal-stable sums
    "sql_api" -> ((s, dir) => {
      Tables.lineitem(s, dir).createOrReplaceTempView("lineitem_v")
      s.sql("""
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) AS sum_base,
               COUNT(*) AS n
        FROM lineitem_v
        WHERE l_shipdate <= TIMESTAMP '1997-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus""")
    }),

    // exact median (interpolated) per group
    "agg_median" -> ((s, dir) =>
      Tables.orders(s, dir)
        .groupBy(col("o_orderpriority"))
        .agg(
          round(median(col("o_totalprice")), 4).as("med_price"),
          count(lit(1)).as("n"))
        .orderBy("o_orderpriority")),

    // second date family: month arithmetic, boundaries, ISO calendar
    "fn_date2" -> ((s, dir) =>
      Tables.orders(s, dir).select(
        col("o_orderkey"),
        add_months(col("o_orderdate").cast("date"), 2).as("plus2m"),
        last_day(col("o_orderdate")).as("eom"),
        quarter(col("o_orderdate")).cast("long").as("qtr"),
        weekofyear(col("o_orderdate")).cast("long").as("iso_week"),
        dayofweek(col("o_orderdate")).cast("long").as("dow"),
        dayofyear(col("o_orderdate")).cast("long").as("doy"),
        date_format(col("o_orderdate"), "yyyy-MM").as("ym"))
        .orderBy("o_orderkey")),

    // schema-flexible union: columns matched BY NAME across different
    // projection orders (position-based union would silently mismatch)
    "set_union_byname" -> ((s, dir) => {
      val a = Tables.events(s, dir).where(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("value"))
      val b = Tables.events(s, dir).where(col("event_type") === "purchase")
        .select(col("value"), col("event_id"), col("user_id")) // shuffled order
      a.unionByName(b)
        .select(col("event_id"), col("user_id"), col("value"))
        .orderBy("event_id")
    }),

    // unpivot/melt: wide measure columns to (measure, value) rows —
    // the layout step feeding any long-format statistics pass
    "unpivot_melt" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"), col("l_discount"), col("l_tax"))
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_discount"), col("l_tax")),
          "measure", "val")
        .orderBy("l_orderkey", "l_linenumber", "measure")),

    // rollup with grouping indicators: grouping() per column and the
    // composed grouping_id() — how a consumer tells subtotal rows apart
    "agg_grouping" -> ((s, dir) =>
      Tables.orders(s, dir)
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          grouping(col("o_orderstatus")).cast("long").as("g_status"),
          grouping(col("o_orderpriority")).cast("long").as("g_prio"),
          grouping_id().as("gid"))
        .orderBy(col("gid"), col("o_orderstatus"), col("o_orderpriority"))),

    // sequence generation + explode: one row per month covered by the
    // order's quarter — interval enumeration without a driver-side loop
    "fn_sequence" -> ((s, dir) =>
      Tables.orders(s, dir)
        .where(col("o_orderkey") <= 1000)
        .select(col("o_orderkey"),
          explode(sequence(lit(1), quarter(col("o_orderdate")))).as("qm"))
        .select(col("o_orderkey"), col("qm").cast("long").as("q_month"))
        .orderBy("o_orderkey", "q_month")),

    // bitwise aggregates over the key domain per event type
    "agg_bit" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("event_type"))
        .agg(
          bit_and(col("user_id")).as("band"),
          bit_or(col("user_id")).as("bor"),
          bit_xor(col("user_id")).as("bxor"))
        .orderBy("event_type")),

    // binary/text encodings: hex round-trip, base64, ascii/chr
    "fn_encode" -> ((s, dir) =>
      Tables.customer(s, dir).select(
        col("c_custkey"),
        hex(col("c_mktsegment")).as("hx"),
        unhex(hex(col("c_mktsegment"))).cast("string").as("rt"),
        base64(col("c_name").cast("binary")).as("b64"),
        ascii(col("c_mktsegment")).cast("long").as("asc"),
        chr(ascii(col("c_mktsegment")) + 32).as("ch"))
        .orderBy("c_custkey")),

    // distributed higher moments the numerically-portable way: exact
    // DECIMAL power sums (order-independent — the engine-exactness rule
    // that makes raw SUM(double) unusable, SURVEY §7.5), then one
    // closed-form double projection mirrored token-for-token in the
    // oracle. Built-in skewness/kurtosis can't be oracle-checked:
    // Spark computes population g1/g2, DuckDB sample G1/G2, and both
    // accumulate doubles order-dependently.
    "agg_moments" -> ((s, dir) => {
      import org.apache.spark.sql.types.DecimalType
      val x = col("l_quantity")
      val d = (c: org.apache.spark.sql.Column) => c.cast(DecimalType(38, 8))
      val agg = Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).cast("double").as("n"),
          sum(d(x)).cast("double").as("s1"),
          sum(d(x * x)).cast("double").as("s2"),
          sum(d(x * x * x)).cast("double").as("s3"),
          sum(d(x * x * x * x)).cast("double").as("s4"))
      val mean = col("s1") / col("n")
      val m2 = col("s2") / col("n") - mean * mean
      val skew = (col("s3") / col("n") - lit(3.0) * mean * (col("s2") / col("n"))
        + lit(2.0) * mean * mean * mean) / (m2 * sqrt(m2))
      val kurt = (col("s4") / col("n") - lit(4.0) * mean * (col("s3") / col("n"))
        + lit(6.0) * (mean * mean) * (col("s2") / col("n"))
        - lit(3.0) * ((mean * mean) * (mean * mean))) / (m2 * m2) - lit(3.0)
      agg.select(col("l_returnflag"),
          round(mean, 6).as("mean_q"),
          round(m2, 6).as("var_p"),
          round(skew, 6).as("skew_p"),
          round(kurt, 6).as("kurt_p"))
        .orderBy("l_returnflag")
    }),

    // correlated LATERAL subquery through the SQL front-end: per-order
    // aggregate computed in a lateral derived table (decorrelates to a
    // grouped join — no per-row re-execution at scale)
    "sub_lateral" -> ((s, dir) => {
      Tables.orders(s, dir).createOrReplaceTempView("orders_v")
      Tables.lineitem(s, dir).createOrReplaceTempView("lineitem_v")
      s.sql("""
        SELECT o_orderkey, o_orderstatus, t.max_qty, t.n_lines
        FROM orders_v,
        LATERAL (SELECT MAX(l_quantity) AS max_qty, COUNT(*) AS n_lines
                 FROM lineitem_v WHERE l_orderkey = o_orderkey) t
        WHERE o_orderkey <= 5000
        ORDER BY o_orderkey""")
    }),

    // Zipf view of the corpus: frequency-ranked vocabulary top 30.
    // (The unpartitioned rank window runs over the AGGREGATED vocab —
    // a few hundred rows — not the corpus; scale-safe like the chunk
    // summaries in stream_watermark.)
    "text_zipf" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(explode(split(col("text"), " ")).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("cnt"))
        .withColumn("rank", row_number().over(
          Window.orderBy(col("cnt").desc, col("tok"))))
        .where(col("rank") <= 30)
        .select(col("rank"), col("tok"), col("cnt"))
        .orderBy("rank"))
  )

  val oracleSql: Map[String, String] = Map(
    "sql_api" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) AS sum_base,
        |  COUNT(*) AS n
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1997-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "agg_median" ->
      """SELECT o_orderpriority,
        |  ROUND(median(o_totalprice), 4) AS med_price, COUNT(*) AS n
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "fn_date2" ->
      """SELECT o_orderkey,
        |  CAST(o_orderdate + INTERVAL 2 MONTH AS DATE) AS plus2m,
        |  last_day(CAST(o_orderdate AS DATE)) AS eom,
        |  CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
        |  CAST(weekofyear(o_orderdate) AS BIGINT) AS iso_week,
        |  CAST(dayofweek(o_orderdate) + 1 AS BIGINT) AS dow,
        |  CAST(dayofyear(o_orderdate) AS BIGINT) AS doy,
        |  strftime(o_orderdate, '%Y-%m') AS ym
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "set_union_byname" ->
      """SELECT event_id, user_id, value FROM (
        |  SELECT event_id, user_id, value FROM events WHERE event_type = 'click'
        |  UNION ALL BY NAME
        |  SELECT value, event_id, user_id FROM events WHERE event_type = 'purchase')
        |ORDER BY event_id""".stripMargin,

    "unpivot_melt" ->
      """SELECT l_orderkey, l_linenumber, measure, val FROM (
        |  SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure, l_quantity AS val FROM lineitem
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem)
        |ORDER BY l_orderkey, l_linenumber, measure""".stripMargin,

    "agg_grouping" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
        |  CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
        |  CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_prio,
        |  CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS BIGINT) AS gid
        |FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
        |ORDER BY gid, o_orderstatus, o_orderpriority""".stripMargin,

    "fn_sequence" ->
      """SELECT o_orderkey, CAST(unnest(generate_series(1, quarter(o_orderdate))) AS BIGINT) AS q_month
        |FROM orders WHERE o_orderkey <= 1000
        |ORDER BY o_orderkey, q_month""".stripMargin,

    "agg_bit" ->
      """SELECT event_type,
        |  bit_and(user_id) AS band, bit_or(user_id) AS bor, bit_xor(user_id) AS bxor
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "fn_encode" ->
      """SELECT c_custkey,
        |  hex(c_mktsegment) AS hx,
        |  CAST(unhex(hex(c_mktsegment)) AS VARCHAR) AS rt,
        |  to_base64(encode(c_name)) AS b64,
        |  CAST(ascii(c_mktsegment) AS BIGINT) AS asc,
        |  chr(ascii(c_mktsegment) + 32) AS ch
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "agg_moments" ->
      """WITH a AS (
        |  SELECT l_returnflag,
        |    CAST(COUNT(*) AS DOUBLE) AS n,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(38,8))) AS DOUBLE) AS s1,
        |    CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(38,8))) AS DOUBLE) AS s2,
        |    CAST(SUM(CAST(l_quantity * l_quantity * l_quantity AS DECIMAL(38,8))) AS DOUBLE) AS s3,
        |    CAST(SUM(CAST(l_quantity * l_quantity * l_quantity * l_quantity AS DECIMAL(38,8))) AS DOUBLE) AS s4
        |  FROM lineitem GROUP BY l_returnflag),
        |m AS (SELECT l_returnflag, n, s1, s2, s3, s4, s1 / n AS mean,
        |             s2 / n - (s1 / n) * (s1 / n) AS m2
        |      FROM a)
        |SELECT l_returnflag,
        |  ROUND(mean, 6) AS mean_q,
        |  ROUND(m2, 6) AS var_p,
        |  ROUND((s3 / n - 3.0 * mean * (s2 / n) + 2.0 * mean * mean * mean)
        |        / (m2 * sqrt(m2)), 6) AS skew_p,
        |  ROUND((s4 / n - 4.0 * mean * (s3 / n) + 6.0 * (mean * mean) * (s2 / n)
        |        - 3.0 * ((mean * mean) * (mean * mean))) / (m2 * m2) - 3.0, 6) AS kurt_p
        |FROM m ORDER BY l_returnflag""".stripMargin,

    "sub_lateral" ->
      """SELECT o_orderkey, o_orderstatus, t.max_qty, t.n_lines
        |FROM orders,
        |LATERAL (SELECT MAX(l_quantity) AS max_qty, COUNT(*) AS n_lines
        |         FROM lineitem WHERE l_orderkey = o_orderkey) t
        |WHERE o_orderkey <= 5000
        |ORDER BY o_orderkey""".stripMargin,

    "text_zipf" ->
      """WITH v AS (
        |  SELECT tok, COUNT(*) AS cnt
        |  FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
        |  GROUP BY tok)
        |SELECT row_number() OVER (ORDER BY cnt DESC, tok) AS rank, tok, cnt
        |FROM v QUALIFY rank <= 30 ORDER BY rank""".stripMargin
  )
}
