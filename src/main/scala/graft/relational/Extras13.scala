package graft.relational

import graft.{QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-7 third wave: two window/join shapes real analytics users ask
  * for that the suite was still missing.
  *
  *  - `win_drawdown` — running-peak drawdown per customer over the
  *    cumulative order-value series (the classic risk/monitoring
  *    window: how far below its historical peak has the series
  *    fallen). Cumulative sums are exact DECIMAL over a deterministic
  *    (date, orderkey) order, the peak is a running MAX over those
  *    exact values, and the report reduces per customer — so the hash
  *    gate survives float ordering. Shape: ONE hash exchange on
  *    o_custkey, windows inside the partition, then a per-customer
  *    two-phase agg; groups ≈ customers, so parallelism is data-wide.
  *
  *  - `join_asof_nearest` — the NEAREST-neighbor as-of join (backward
  *    OR forward, whichever is closer in time, ±30 min tolerance):
  *    each 'error' event matched to the nearest same-user 'purchase'.
  *    join_asof/join_asof_tolerance are backward-only carry-forwards;
  *    nearest needs both directions. Implemented the single-shuffle
  *    way: union the two event kinds into one (user, time)-sorted
  *    stream and carry the last-purchase-backward and first-purchase-
  *    forward as window state — never a range join, never an
  *    inequality-pair blowup; cost is one exchange + one sort, same
  *    as the plain as-of. Tie at equal distance resolves backward
  *    (the as-of convention); the DuckDB oracle is the structurally
  *    different |Δ|-ranked range join with the same tie order, which
  *    is what makes it a strong oracle.
  */
object Extras13 extends QueryPack {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "win_drawdown" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.orders(s, dir)
        .withColumn("cum",
          sum(col("o_totalprice").cast("decimal(28,2)")).over(w))
        .withColumn("peak", max(col("cum")).over(w))
        .withColumn("dd", col("peak") - col("cum"))
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n_orders"),
          round(max(col("dd")).cast("double"), 2).as("max_drawdown"),
          round(max(col("peak")).cast("double"), 2).as("peak_value"))
        .orderBy("o_custkey")
    }),

    "join_asof_nearest" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .withColumn("t", unix_timestamp(date_trunc("second", col("ts"))))
        .where(col("event_type").isin("error", "purchase"))
        .select(col("user_id"), col("t"), col("event_id"), col("event_type"))
      val w = Window.partitionBy("user_id").orderBy(col("t"), col("event_id"))
      val pRow = when(col("event_type") === "purchase",
        struct(col("t").as("pt"), col("event_id").as("pid")))
      val back = last(pRow, ignoreNulls = true)
        .over(w.rowsBetween(Window.unboundedPreceding, -1))
      val fwd = first(pRow, ignoreNulls = true)
        .over(w.rowsBetween(0, Window.unboundedFollowing))
      ev.withColumn("back", back).withColumn("fwd", fwd)
        .where(col("event_type") === "error")
        .withColumn("db", col("t") - col("back.pt"))
        .withColumn("df", col("fwd.pt") - col("t"))
        .withColumn("use_back",
          col("back").isNotNull && col("db") <= 1800 &&
            (col("fwd").isNull || col("df") > 1800 || col("db") <= col("df")))
        .where(col("use_back") ||
          (col("fwd").isNotNull && col("df") <= 1800))
        .select(col("event_id"), col("user_id"), col("t"),
          when(col("use_back"), col("back.pid")).otherwise(col("fwd.pid"))
            .as("purchase_id"),
          (when(col("use_back"), col("back.pt")).otherwise(col("fwd.pt"))
            - col("t")).as("delta"))
        .orderBy("event_id")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "win_drawdown" ->
      """WITH c AS (
        |  SELECT o_custkey, o_orderdate, o_orderkey,
        |    SUM(CAST(o_totalprice AS DECIMAL(28,2))) OVER (
        |      PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |      ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM orders),
        |d AS (
        |  SELECT o_custkey, cum,
        |    MAX(cum) OVER (
        |      PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |      ROWS UNBOUNDED PRECEDING) AS peak
        |  FROM c)
        |SELECT o_custkey, COUNT(*) AS n_orders,
        |  ROUND(CAST(MAX(peak - cum) AS DOUBLE), 2) AS max_drawdown,
        |  ROUND(CAST(MAX(peak) AS DOUBLE), 2) AS peak_value
        |FROM d GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,

    // |Δ|-ranked range join, tie order matching the carry windows:
    // backward-classified = before the error in (t, event_id) order;
    // equal |Δ| prefers backward; within backward the LATEST purchase
    // (carry-forward takes the last ≤), within forward the EARLIEST
    "join_asof_nearest" ->
      """WITH ev AS (
        |  SELECT event_id, user_id, event_type,
        |    CAST(floor(epoch(date_trunc('second', ts))) AS BIGINT) AS t
        |  FROM events),
        |e AS (SELECT event_id, user_id, t FROM ev WHERE event_type = 'error'),
        |p AS (SELECT event_id AS pid, user_id, t AS pt FROM ev
        |      WHERE event_type = 'purchase')
        |SELECT event_id, e.user_id, t, pid AS purchase_id, pt - t AS delta
        |FROM e JOIN p ON e.user_id = p.user_id AND abs(pt - t) <= 1800
        |QUALIFY row_number() OVER (
        |  PARTITION BY event_id
        |  ORDER BY abs(pt - t),
        |    CASE WHEN pt < t OR (pt = t AND pid < event_id) THEN 0 ELSE 1 END,
        |    CASE WHEN pt < t OR (pt = t AND pid < event_id) THEN -pid ELSE pid END
        |) = 1
        |ORDER BY event_id""".stripMargin
  )
}
