package graft.relational

import graft.{QueryPack, Tables}
import graft.functions.WeightedAvgAgg
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Aggregation operators (SURVEY.md §2.5). Pure DataFrame API: Spark's
  * HashAggregateExec gives partial (map-side) + final aggregation for
  * free, so at 100 TB each group's traffic over the shuffle is one row
  * per map partition, not raw data.
  */
object Aggs extends QueryPack {

  /** TPC-H Q1 shape: the flagship grouped aggregation. */
  def aggGroup(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        Stable.dsum(col("l_quantity"), 2).as("sum_qty"),
        Stable.dsum(col("l_extendedprice"), 2).as("sum_base_price"),
        Stable.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4).as("sum_disc_price"),
        Stable.davg(col("l_quantity")).as("avg_qty"),
        Stable.davg(col("l_extendedprice")).as("avg_price"),
        Stable.davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "agg_group" -> aggGroup,

    "agg_global" -> ((s, dir) =>
      Tables.lineitem(s, dir).agg(
        count(lit(1)).as("n_rows"),
        countDistinct(col("l_orderkey")).as("n_orders"),
        Stable.dsum(col("l_quantity")).as("sum_qty"),
        min(col("l_extendedprice")).as("min_price"),
        max(col("l_extendedprice")).as("max_price"),
        Stable.davg(col("l_discount")).as("avg_disc"))),

    "agg_having" -> ((s, dir) =>
      Tables.orders(s, dir)
        .groupBy(col("o_custkey"))
        .agg(Stable.dsum(col("o_totalprice")).as("total_spent"),
          count(lit(1)).as("n_orders"))
        .where(col("total_spent") > 1000000)
        .orderBy("o_custkey")),

    "agg_count_distinct" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("n_users"),
          count(lit(1)).as("n_events"))
        .orderBy("event_type")),

    "agg_rollup" -> ((s, dir) =>
      Tables.customer(s, dir)
        .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_cust"), grouping_id().cast("int").as("gid"))
        .select(coalesce(col("r_name"), lit("(all)")).as("rname"),
          coalesce(col("n_name"), lit("(all)")).as("nname"),
          col("n_cust"), col("gid"))
        .orderBy("gid", "rname", "nname")),

    "agg_cube" -> ((s, dir) =>
      Tables.orders(s, dir)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          Stable.dsum(col("o_totalprice")).as("total"),
          grouping_id().cast("int").as("gid"))
        .select(coalesce(col("o_orderstatus"), lit("(all)")).as("status"),
          coalesce(col("o_orderpriority"), lit("(all)")).as("priority"),
          col("n"), col("total"), col("gid"))
        .orderBy("gid", "status", "priority")),

    // explicit GROUPING SETS via the SQL front-end
    "agg_gsets" -> ((s, dir) => {
      Tables.orders(s, dir).createOrReplaceTempView("orders_gs")
      s.sql(
        """SELECT coalesce(o_orderstatus, '(all)') AS status,
          |       coalesce(o_orderpriority, '(all)') AS priority,
          |       count(1) AS n
          |FROM orders_gs
          |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
          |ORDER BY status, priority""".stripMargin)
    }),

    // pivot with a pinned value list => deterministic schema
    "agg_pivot" -> ((s, dir) =>
      Tables.events(s, dir)
        .withColumn("user_bucket", col("user_id") % 10)
        .groupBy(col("user_bucket"))
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(Stable.dsum(col("value")))
        .orderBy("user_bucket")),

    // per-group sorted array — emitted as a joined string (deterministic)
    "agg_collect" -> ((s, dir) =>
      Tables.events(s, dir)
        .where(col("user_id") < 50)
        .groupBy(col("event_type"))
        .agg(array_join(sort_array(collect_set(col("user_id"))), ",").as("users"))
        .orderBy("event_type")),

    // HLL sketch — approximate, no SQL oracle; bounded vs exact in tests
    "agg_approx_distinct" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("event_type"))
        .agg(approx_count_distinct(col("user_id")).as("approx_users"))
        .orderBy("event_type")),

    // custom typed Aggregator (exact decimal buffer, see WeightedAvgAgg)
    "agg_custom_typed" -> ((s, dir) => {
      val wavg = udaf(WeightedAvgAgg)
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(wavg(col("l_extendedprice"), col("l_discount")).as("wavg_price"))
        .orderBy("l_returnflag")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "agg_global" ->
      """SELECT COUNT(*) AS n_rows, COUNT(DISTINCT l_orderkey) AS n_orders,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) AS sum_qty,
        |  MIN(l_extendedprice) AS min_price, MAX(l_extendedprice) AS max_price,
        |  ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*), 4) AS avg_disc
        |FROM lineitem""".stripMargin,

    "agg_having" ->
      """SELECT o_custkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS total_spent,
        |  COUNT(*) AS n_orders
        |FROM orders GROUP BY o_custkey
        |HAVING CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE) > 1000000
        |ORDER BY o_custkey""".stripMargin,

    "agg_count_distinct" ->
      """SELECT event_type, COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "agg_rollup" ->
      """SELECT coalesce(r_name, '(all)') AS rname, coalesce(n_name, '(all)') AS nname,
        |  COUNT(*) AS n_cust, CAST(GROUPING(r_name, n_name) AS INT) AS gid
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)
        |ORDER BY gid, rname, nname""".stripMargin,

    "agg_cube" ->
      """SELECT coalesce(o_orderstatus, '(all)') AS status,
        |  coalesce(o_orderpriority, '(all)') AS priority,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS total,
        |  CAST(GROUPING(o_orderstatus, o_orderpriority) AS INT) AS gid
        |FROM orders
        |GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY gid, status, priority""".stripMargin,

    "agg_gsets" ->
      """SELECT coalesce(o_orderstatus, '(all)') AS status,
        |  coalesce(o_orderpriority, '(all)') AS priority,
        |  COUNT(*) AS n
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY status, priority""".stripMargin,

    "agg_pivot" ->
      """SELECT user_id % 10 AS user_bucket,
        |  CAST(SUM(CAST(value AS DECIMAL(28,2))) FILTER (WHERE event_type = 'click') AS DOUBLE) AS click,
        |  CAST(SUM(CAST(value AS DECIMAL(28,2))) FILTER (WHERE event_type = 'error') AS DOUBLE) AS error,
        |  CAST(SUM(CAST(value AS DECIMAL(28,2))) FILTER (WHERE event_type = 'purchase') AS DOUBLE) AS purchase,
        |  CAST(SUM(CAST(value AS DECIMAL(28,2))) FILTER (WHERE event_type = 'signup') AS DOUBLE) AS signup,
        |  CAST(SUM(CAST(value AS DECIMAL(28,2))) FILTER (WHERE event_type = 'view') AS DOUBLE) AS view
        |FROM events GROUP BY user_id % 10 ORDER BY user_bucket""".stripMargin,

    "agg_collect" ->
      """SELECT event_type,
        |  string_agg(CAST(user_id AS VARCHAR), ',' ORDER BY user_id) AS users
        |FROM (SELECT DISTINCT event_type, user_id FROM events WHERE user_id < 50)
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "agg_custom_typed" ->
      """SELECT l_returnflag,
        |  ROUND(CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(28,6))) AS DOUBLE)
        |      / CAST(SUM(CAST(l_discount AS DECIMAL(28,6))) AS DOUBLE), 4) AS wavg_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "agg_group" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,4))) AS DOUBLE) AS sum_disc_price,
        |  ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*), 4) AS avg_qty,
        |  ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*), 4) AS avg_price,
        |  ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*), 4) AS avg_disc,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin
  )
}
