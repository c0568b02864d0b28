package graft.relational

import graft.{QueryPack, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Window functions (SURVEY.md §2.6). One shuffle per partitioning key —
  * all event windows partition by user_id and all order windows by
  * o_orderstatus, so Spark reuses the exchange across frames in a query.
  *
  * Determinism: every event window orders by (second-truncated ts,
  * event_id) — a total order both Spark (µs) and DuckDB (ns) agree on;
  * every order window breaks o_totalprice ties with o_orderkey. Running
  * sums accumulate in DECIMAL so frame evaluation order can't change
  * low-order bits (see Stable).
  */
object Windows extends QueryPack {

  /** events + a cross-engine-stable second-truncated ts. */
  private def ev(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir).withColumn("ts_sec", date_trunc("second", col("ts")))

  private val wUser = Window.partitionBy(col("user_id"))
    .orderBy(col("ts_sec"), col("event_id"))

  private val wStatus = Window.partitionBy(col("o_orderstatus"))
    .orderBy(col("o_totalprice").desc, col("o_orderkey"))

  /** Windowed exact sum: `.over` must attach to the aggregate itself, so
    * the double cast is applied by the caller via decSumOver. */
  private def decSumOver(c: Column, w: org.apache.spark.sql.expressions.WindowSpec): Column =
    sum(c.cast(DecimalType(28, 2))).over(w).cast("double")

  // DuckDB twin of wUser's ORDER BY
  private val duckUserOrder = "PARTITION BY user_id ORDER BY date_trunc('second', ts), event_id"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "win_rownum" -> ((s, dir) =>
      ev(s, dir)
        .withColumn("rn", row_number().over(wUser))
        .select("event_id", "user_id", "rn")
        .orderBy("event_id")),

    "win_rank" -> ((s, dir) =>
      Tables.orders(s, dir)
        .withColumn("rnk", rank().over(wStatus))
        .withColumn("drnk", dense_rank().over(wStatus))
        .select("o_orderkey", "o_orderstatus", "o_totalprice", "rnk", "drnk")
        .orderBy("o_orderkey")),

    "win_lag_lead" -> ((s, dir) =>
      ev(s, dir)
        .withColumn("prev_value", lag(col("value"), 1).over(wUser))
        .withColumn("next_value", lead(col("value"), 1).over(wUser))
        .withColumn("gap_sec",
          unix_timestamp(col("ts_sec")) - lag(unix_timestamp(col("ts_sec")), 1).over(wUser))
        .select("event_id", "user_id", "value", "prev_value", "next_value", "gap_sec")
        .orderBy("event_id")),

    "win_running" -> ((s, dir) =>
      ev(s, dir)
        .withColumn("running_sum",
          decSumOver(col("value"), wUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("running_n",
          count(lit(1)).over(wUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select("event_id", "user_id", "value", "running_sum", "running_n")
        .orderBy("event_id")),

    "win_moving" -> ((s, dir) => {
      val frame = wUser.rowsBetween(-3, 0)
      ev(s, dir)
        .withColumn("mov_avg",
          round(decSumOver(col("value"), frame) / count(lit(1)).over(frame), 4))
        .select("event_id", "user_id", "value", "mov_avg")
        .orderBy("event_id")
    }),

    "win_range_frame" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_orderstatus"))
        .orderBy(col("o_totalprice")).rangeBetween(-10000, 0)
      Tables.orders(s, dir)
        .withColumn("n_in_band", count(lit(1)).over(w))
        .withColumn("band_total", decSumOver(col("o_totalprice"), w))
        .select("o_orderkey", "o_orderstatus", "o_totalprice", "n_in_band", "band_total")
        .orderBy("o_orderkey")
    }),

    "win_ntile_pct" -> ((s, dir) =>
      Tables.orders(s, dir)
        .withColumn("quartile", ntile(4).over(wStatus))
        .withColumn("pct_rank", percent_rank().over(wStatus))
        .withColumn("cume", cume_dist().over(wStatus))
        .select("o_orderkey", "o_orderstatus", "quartile", "pct_rank", "cume")
        .orderBy("o_orderkey")),

    "win_first_last" -> ((s, dir) => {
      val full = wUser.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      ev(s, dir)
        .withColumn("first_value", first(col("value")).over(full))
        .withColumn("last_value", last(col("value")).over(full))
        .select("event_id", "user_id", "value", "first_value", "last_value")
        .orderBy("event_id")
    }),

    "topk_per_group" -> ((s, dir) =>
      Tables.orders(s, dir)
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("o_custkey"))
            .orderBy(col("o_totalprice").desc, col("o_orderkey"))))
        .where(col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
        .orderBy("o_custkey", "rn"))
  )

  val oracleSql: Map[String, String] = Map(
    "win_rownum" ->
      s"""SELECT event_id, user_id,
         |  row_number() OVER ($duckUserOrder) AS rn
         |FROM events ORDER BY event_id""".stripMargin,

    "win_rank" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice,
        |  rank() OVER w AS rnk, dense_rank() OVER w AS drnk
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey)
        |ORDER BY o_orderkey""".stripMargin,

    "win_lag_lead" ->
      s"""SELECT event_id, user_id, value,
         |  lag(value, 1) OVER w AS prev_value,
         |  lead(value, 1) OVER w AS next_value,
         |  CAST(epoch(date_trunc('second', ts)) AS BIGINT)
         |    - lag(CAST(epoch(date_trunc('second', ts)) AS BIGINT), 1) OVER w AS gap_sec
         |FROM events WINDOW w AS ($duckUserOrder) ORDER BY event_id""".stripMargin,

    "win_running" ->
      s"""SELECT event_id, user_id, value,
         |  CAST(SUM(CAST(value AS DECIMAL(28,2))) OVER w AS DOUBLE) AS running_sum,
         |  COUNT(*) OVER w AS running_n
         |FROM events
         |WINDOW w AS ($duckUserOrder ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |ORDER BY event_id""".stripMargin,

    "win_moving" ->
      s"""SELECT event_id, user_id, value,
         |  ROUND(CAST(SUM(CAST(value AS DECIMAL(28,2))) OVER w AS DOUBLE)
         |        / COUNT(*) OVER w, 4) AS mov_avg
         |FROM events
         |WINDOW w AS ($duckUserOrder ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
         |ORDER BY event_id""".stripMargin,

    "win_range_frame" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice,
        |  COUNT(*) OVER w AS n_in_band,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) OVER w AS DOUBLE) AS band_total
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice
        |             RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW)
        |ORDER BY o_orderkey""".stripMargin,

    "win_ntile_pct" ->
      """SELECT o_orderkey, o_orderstatus,
        |  ntile(4) OVER w AS quartile,
        |  percent_rank() OVER w AS pct_rank,
        |  cume_dist() OVER w AS cume
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey)
        |ORDER BY o_orderkey""".stripMargin,

    "win_first_last" ->
      s"""SELECT event_id, user_id, value,
         |  first_value(value) OVER w AS first_value,
         |  last_value(value) OVER w AS last_value
         |FROM events
         |WINDOW w AS ($duckUserOrder ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
         |ORDER BY event_id""".stripMargin,

    "topk_per_group" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  row_number() OVER (PARTITION BY o_custkey
        |                     ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |FROM orders
        |QUALIFY rn <= 3
        |ORDER BY o_custkey, rn""".stripMargin
  )
}
