package graft.relational

import graft.{QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Round-7 relational widening: the remaining reporting / sampling /
  * interval shapes a message-analytics surface offers.
  *
  *  - deterministic mode (`agg_mode`) — most-frequent value per group
  *    with a total tie-break (count desc, value asc), so the result is
  *    unique, unlike the built-in `mode()` whose tie winner is
  *    plan-dependent in both engines.
  *  - equi-width histogram (`agg_histogram`) — fixed-bin binning is one
  *    map-side-combinable groupBy on a computed bin key; the bin math
  *    stays in integer space so both engines agree exactly.
  *  - ratio-to-report (`win_ratio_report`) — share-of-partition-total,
  *    the denominator accumulated in DECIMAL over the window so it is
  *    order-independent (a double window SUM would hash-mismatch
  *    across partitionings; Stable.scala discipline).
  *  - deterministic fixed-size per-group sample (`sample_reservoir`) —
  *    the reservoir-sampling shape made rerun-stable: rank by a
  *    salted md5 hash (uniform, portable) instead of an RNG, keep
  *    k = 5 per group. Distributed form is a grouped top-k by hash —
  *    partial per partition, no full sort (cf. topk_per_group).
  *  - interval self-overlap join (`join_interval_overlap`) — pairs of
  *    same-customer 30-day order windows that overlap. The equi key
  *    (o_custkey) is the natural block: Spark plans an ordinary
  *    shuffle/broadcast hash join with the interval predicate as a
  *    residual, so there is no cross product. For unkeyed interval
  *    joins the same pattern blocks on a time bucket (join_range).
  *  - OHLC downsampling (`ts_ohlc`) — 6-hour open/high/low/close bars
  *    per event_type via min_by/max_by on the unique event_id (the
  *    deterministic open/close witness; raw ts order is not portable
  *    across the ns/µs boundary, FIXTURES.md pitfall 1). One
  *    map-side-combinable groupBy: min_by/max_by/min/max/count all
  *    have partial merges, so the bar build is a single shuffle of
  *    one row per (type, bucket) — the shape that holds at 100 TB.
  */
object Extras9 extends QueryPack {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // deterministic per-group mode of l_quantity: count per value, then
    // one tiny window over the per-group value counts (|groups|×50 rows)
    "agg_mode" -> ((s, dir) => {
      val counts = Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"), col("l_quantity"))
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy(col("l_returnflag"))
        .orderBy(col("n").desc, col("l_quantity").asc)
      counts.withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select(col("l_returnflag"), col("l_quantity").as("mode_qty"), col("n"))
        .orderBy("l_returnflag")
    }),

    // equi-width histogram of o_totalprice: 10 bins of 50k over [0, 500k)
    "agg_histogram" -> ((s, dir) =>
      Tables.orders(s, dir)
        .select(least(floor(col("o_totalprice") / 50000), lit(9L)).as("bin"),
          col("o_totalprice"))
        .groupBy("bin")
        .agg(count(lit(1)).as("n"),
          round(min(col("o_totalprice")), 2).as("lo"),
          round(max(col("o_totalprice")), 2).as("hi"),
          round(Stable.dsum(col("o_totalprice")), 2).as("tot"))
        .orderBy("bin")),

    // ratio-to-report: each order's share of its customer's total spend;
    // decimal window sum => order-independent denominator
    "win_ratio_report" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
      Tables.orders(s, dir)
        .withColumn("cust_total",
          sum(col("o_totalprice").cast(DecimalType(28, 2))).over(w).cast("double"))
        .select(col("o_custkey"), col("o_orderkey"),
          round(col("o_totalprice"), 2).as("price"),
          round(col("o_totalprice") / col("cust_total"), 6).as("share"))
        .orderBy("o_orderkey")
    }),

    // deterministic fixed-k-per-group sample: rank events by salted md5
    // (portable uniform), keep 5 per event_type
    "sample_reservoir" -> ((s, dir) => {
      val h = Extras3.md5Val(col("event_id"))
      val w = Window.partitionBy(col("event_type"))
        .orderBy(h.asc, col("event_id").asc)
      Tables.events(s, dir)
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= 5)
        .select(col("event_type"), col("event_id"),
          round(col("value"), 2).as("value"))
        .orderBy("event_type", "event_id")
    }),

    // same-customer overlapping 30-day order windows: equi join on the
    // customer key + residual half-open interval predicate
    "join_interval_overlap" -> ((s, dir) => {
      def win(p: String) = Tables.orders(s, dir).select(
        col("o_custkey"),
        col("o_orderkey").as(s"k$p"),
        col("o_orderdate").cast("date").as(s"s$p"),
        date_add(col("o_orderdate").cast("date"), 30).as(s"e$p"))
      win("1").join(win("2"), Seq("o_custkey"))
        .where(col("k1") < col("k2") &&
          col("s1") < col("e2") && col("s2") < col("e1"))
        .select(col("o_custkey"), col("k1"), col("k2"),
          datediff(least(col("e1"), col("e2")),
            greatest(col("s1"), col("s2"))).as("overlap_days"))
        .orderBy("k1", "k2")
    }),

    // 6h OHLC bars per event_type; open/close witnessed by min/max
    // event_id (unique, time-ordered-ish; portable across ns/µs ts)
    "ts_ohlc" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("event_type"),
          (unix_timestamp(col("ts")).cast("long") / 21600L).cast("long").as("bar"))
        .agg(round(min_by(col("value"), col("event_id")), 2).as("open"),
          round(max(col("value")), 2).as("high"),
          round(min(col("value")), 2).as("low"),
          round(max_by(col("value"), col("event_id")), 2).as("close"),
          count(lit(1)).as("n"))
        .orderBy("event_type", "bar"))
  )

  val oracleSql: Map[String, String] = Map(
    "agg_mode" ->
      """WITH c AS (
        |  SELECT l_returnflag, l_quantity, COUNT(*) AS n
        |  FROM lineitem GROUP BY 1, 2)
        |SELECT l_returnflag, l_quantity AS mode_qty, n FROM c
        |QUALIFY row_number() OVER
        |  (PARTITION BY l_returnflag ORDER BY n DESC, l_quantity ASC) = 1
        |ORDER BY l_returnflag""".stripMargin,

    "agg_histogram" ->
      """SELECT CAST(LEAST(FLOOR(o_totalprice / 50000), 9) AS BIGINT) AS bin, COUNT(*) AS n,
        |  ROUND(MIN(o_totalprice), 2) AS lo, ROUND(MAX(o_totalprice), 2) AS hi,
        |  ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE), 2) AS tot
        |FROM orders GROUP BY 1 ORDER BY bin""".stripMargin,

    "win_ratio_report" ->
      """SELECT o_custkey, o_orderkey, ROUND(o_totalprice, 2) AS price,
        |  ROUND(o_totalprice / CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2)))
        |    OVER (PARTITION BY o_custkey) AS DOUBLE), 6) AS share
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "sample_reservoir" ->
      s"""SELECT event_type, event_id, ROUND(value, 2) AS value FROM events
         |QUALIFY row_number() OVER (PARTITION BY event_type
         |  ORDER BY ${Extras3.md5ValD("event_id")} ASC, event_id ASC) <= 5
         |ORDER BY event_type, event_id""".stripMargin,

    "join_interval_overlap" ->
      """WITH w AS (
        |  SELECT o_custkey, o_orderkey AS k, CAST(o_orderdate AS DATE) AS s,
        |         CAST(o_orderdate AS DATE) + 30 AS e
        |  FROM orders)
        |SELECT a.o_custkey, a.k AS k1, b.k AS k2,
        |  date_diff('day', GREATEST(a.s, b.s), LEAST(a.e, b.e)) AS overlap_days
        |FROM w a JOIN w b
        |  ON a.o_custkey = b.o_custkey AND a.k < b.k
        |  AND a.s < b.e AND b.s < a.e
        |ORDER BY k1, k2""".stripMargin,

    "ts_ohlc" ->
      """SELECT event_type, CAST(FLOOR(epoch(ts) / 21600) AS BIGINT) AS bar,
        |  ROUND(arg_min(value, event_id), 2) AS open,
        |  ROUND(MAX(value), 2) AS high, ROUND(MIN(value), 2) AS low,
        |  ROUND(arg_max(value, event_id), 2) AS close, COUNT(*) AS n
        |FROM events GROUP BY 1, 2 ORDER BY event_type, bar""".stripMargin
  )
}
