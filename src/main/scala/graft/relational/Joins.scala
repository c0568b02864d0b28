package graft.relational

import graft.{QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Join operators (SURVEY.md §2.4). Scale posture: equi joins shuffle on
  * their keys (sort-merge / shuffled-hash, Catalyst + AQE pick); dims
  * (region/nation/part/supplier — bounded cardinality) are broadcast so
  * the fact side never shuffles; non-equi joins keep one side broadcast-
  * small; the ASOF join is a single-shuffle window carry-forward, NOT an
  * m×n candidate join, so it survives 100 TB of events.
  */
object Joins extends QueryPack {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "join_inner" -> ((s, dir) =>
      Tables.customer(s, dir)
        .join(Tables.orders(s, dir),
          col("c_custkey") === col("o_custkey"), "inner")
        .select("o_orderkey", "c_custkey", "c_name", "o_totalprice")
        .orderBy("o_orderkey")),

    // star-dim join, broadcast forced: no shuffle of the fact side
    "join_broadcast" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .join(broadcast(Tables.part(s, dir).where(col("p_type") === "STANDARD")),
          col("l_partkey") === col("p_partkey"), "inner")
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n_items"),
          Stable.dsum(col("l_extendedprice")).as("sum_price"))
        .orderBy("p_brand")),

    "join_left" -> ((s, dir) =>
      Tables.customer(s, dir)
        .join(Tables.orders(s, dir).where(col("o_totalprice") > 400000),
          col("c_custkey") === col("o_custkey"), "left")
        .select(col("c_custkey"), col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("c_custkey"), col("o_orderkey").asc_nulls_first)),

    "join_right" -> ((s, dir) =>
      Tables.lineitem(s, dir).where(col("l_quantity") >= 49)
        .join(Tables.part(s, dir), col("l_partkey") === col("p_partkey"), "right")
        .select(col("p_partkey"), col("l_orderkey"), col("l_linenumber"))
        .orderBy(col("p_partkey"), col("l_orderkey").asc_nulls_first,
          col("l_linenumber").asc_nulls_first)),

    "join_full" -> ((s, dir) =>
      Tables.customer(s, dir).where(col("c_mktsegment") === "BUILDING")
        .join(Tables.orders(s, dir).where(col("o_totalprice") > 450000),
          col("c_custkey") === col("o_custkey"), "full")
        .select(col("c_custkey"), col("o_orderkey"), col("o_custkey"))
        .orderBy(col("c_custkey").asc_nulls_first,
          col("o_orderkey").asc_nulls_first)),

    "join_semi" -> ((s, dir) =>
      Tables.customer(s, dir)
        .join(Tables.orders(s, dir).where(col("o_totalprice") > 300000),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")),

    "join_anti" -> ((s, dir) =>
      Tables.customer(s, dir)
        .join(Tables.orders(s, dir),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name", "c_nationkey")
        .orderBy("c_custkey")),

    "join_cross" -> ((s, dir) =>
      Tables.region(s, dir)
        .crossJoin(Tables.nation(s, dir))
        .select("r_name", "n_name")
        .orderBy("r_name", "n_name")),

    // pure non-equi theta join — Spark plans a broadcast-nested-loop;
    // acceptable only because supplier is a bounded dim (1k rows at sf0.1)
    "join_theta" -> ((s, dir) => {
      val s1 = Tables.supplier(s, dir).select(
        col("s_suppkey").as("a_key"), col("s_acctbal").as("a_bal"))
      val s2 = Tables.supplier(s, dir).select(
        col("s_suppkey").as("b_key"), col("s_acctbal").as("b_bal"))
      s1.join(s2, col("a_bal") > col("b_bal") + 9000, "inner")
        .select("a_key", "b_key")
        .orderBy("a_key", "b_key")
    }),

    // range join done the scalable way: equi key + residual range pred —
    // shuffles once on the key, never enumerates the cross product. The
    // date casts (and the +30d upper bound) are projected once per input
    // row BEFORE the join, so the residual predicate is two primitive
    // comparisons instead of re-casting per probed pair.
    "join_range" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_orderdate").cast("date").as("odate"))
        .withColumn("odate_hi", date_add(col("odate"), 30))
      val l = Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_shipdate").cast("date").as("sdate"))
      o.join(l,
          col("o_orderkey") === col("l_orderkey") &&
            col("sdate") >= col("odate") && col("sdate") <= col("odate_hi"),
          "inner")
        .select(col("o_orderkey"), col("l_linenumber"), col("odate"), col("sdate"))
        .orderBy("o_orderkey", "l_linenumber")
    }),

    // ASOF join: for each purchase, the latest click at-or-before it per
    // user. Single window pass (carry-forward), not an m×n join — this is
    // the 100 TB pattern. Second-precision ts + event_id gives a total
    // order both engines agree on (events.ts is ns in storage; Spark
    // only sees µs — FIXTURES.md pitfall 1).
    "join_asof" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .withColumn("ts_sec", date_trunc("second", col("ts")))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_sec"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ev.withColumn("click_id",
          last(when(col("event_type") === "click", col("event_id")), ignoreNulls = true).over(w))
        .withColumn("click_value",
          last(when(col("event_type") === "click", col("value")), ignoreNulls = true).over(w))
        .where(col("event_type") === "purchase")
        .select(col("event_id"),
          date_format(col("ts_sec"), "yyyy-MM-dd HH:mm:ss").as("ts_s"),
          col("user_id"), col("click_id"), col("click_value"))
        .orderBy("event_id")
    }),

    "join_star3" -> ((s, dir) =>
      Tables.orders(s, dir)
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(count(lit(1)).as("n_orders"),
          Stable.dsum(col("o_totalprice")).as("sum_price"))
        .orderBy("r_name"))
  )

  val oracleSql: Map[String, String] = Map(
    "join_inner" ->
      """SELECT o_orderkey, c_custkey, c_name, o_totalprice
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |ORDER BY o_orderkey""".stripMargin,

    "join_broadcast" ->
      """SELECT p_brand, COUNT(*) AS n_items,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) AS sum_price
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_type = 'STANDARD'
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    "join_left" ->
      """SELECT c_custkey, o_orderkey, o_totalprice
        |FROM customer LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 400000) o
        |  ON c_custkey = o_custkey
        |ORDER BY c_custkey, o_orderkey NULLS FIRST""".stripMargin,

    "join_right" ->
      """SELECT p_partkey, l_orderkey, l_linenumber
        |FROM (SELECT * FROM lineitem WHERE l_quantity >= 49) l
        |RIGHT JOIN part ON l_partkey = p_partkey
        |ORDER BY p_partkey, l_orderkey NULLS FIRST, l_linenumber NULLS FIRST""".stripMargin,

    "join_full" ->
      """SELECT c_custkey, o_orderkey, o_custkey
        |FROM (SELECT * FROM customer WHERE c_mktsegment = 'BUILDING') c
        |FULL JOIN (SELECT * FROM orders WHERE o_totalprice > 450000) o
        |  ON c_custkey = o_custkey
        |ORDER BY c_custkey NULLS FIRST, o_orderkey NULLS FIRST""".stripMargin,

    "join_semi" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 300000)
        |ORDER BY c_custkey""".stripMargin,

    "join_anti" ->
      """SELECT c_custkey, c_name, c_nationkey FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "join_cross" ->
      """SELECT r_name, n_name FROM region CROSS JOIN nation
        |ORDER BY r_name, n_name""".stripMargin,

    "join_theta" ->
      """SELECT s1.s_suppkey AS a_key, s2.s_suppkey AS b_key
        |FROM supplier s1 JOIN supplier s2 ON s1.s_acctbal > s2.s_acctbal + 9000
        |ORDER BY a_key, b_key""".stripMargin,

    "join_range" ->
      """SELECT o_orderkey, l_linenumber,
        |  CAST(o_orderdate AS DATE) AS odate, CAST(l_shipdate AS DATE) AS sdate
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |  AND CAST(l_shipdate AS DATE) >= CAST(o_orderdate AS DATE)
        |  AND CAST(l_shipdate AS DATE) <= CAST(o_orderdate AS DATE) + 30
        |ORDER BY o_orderkey, l_linenumber""".stripMargin,

    "join_asof" ->
      """WITH ev AS (
        |  SELECT event_id, date_trunc('second', ts) AS ts_sec, user_id,
        |         event_type, value,
        |         last_value(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS)
        |           OVER (PARTITION BY user_id ORDER BY date_trunc('second', ts), event_id
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS click_id,
        |         last_value(CASE WHEN event_type = 'click' THEN value END IGNORE NULLS)
        |           OVER (PARTITION BY user_id ORDER BY date_trunc('second', ts), event_id
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS click_value
        |  FROM events)
        |SELECT event_id, strftime(ts_sec, '%Y-%m-%d %H:%M:%S') AS ts_s,
        |       user_id, click_id, click_value
        |FROM ev WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin,

    "join_star3" ->
      """SELECT r_name, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS sum_price
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin
  )
}
