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

    "text_zipf" ->
      """WITH v AS (
        |  SELECT tok, COUNT(*) AS cnt
        |  FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
        |  GROUP BY tok)
        |SELECT row_number() OVER (ORDER BY cnt DESC, tok) AS rank, tok, cnt
        |FROM v QUALIFY rank <= 30 ORDER BY rank""".stripMargin
  )
}
