package graft.relational

import graft.{QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-6 relational widening: the time-series + hierarchy shapes a
  * message-analytics surface still lacked.
  *
  *  - recursive CTE (`WITH RECURSIVE`, Spark 4.x) — hierarchy
  *    traversal entirely inside the declarative planner; derived from
  *    the JMS-selector domain's need to resolve reply-to chains /
  *    topic hierarchies (reference identity: pulsar message filtering;
  *    the fixture stands in with a digit-truncation forest over
  *    customer keys).
  *  - calendar gap-fill (`ts_gapfill`) — downsample to an hourly grid
  *    and materialize EMPTY cells explicitly; the dashboarding twin of
  *    a windowed aggregate. The calendar frame is O(hours × types) —
  *    metadata-sized at any corpus scale — so the only corpus-sized
  *    operation is the one map-side-combinable groupBy; the grid join
  *    is a broadcast against that bounded aggregate.
  *  - linear interpolation (`ts_interpolate`) — fill the same gaps by
  *    interpolating between the nearest observed neighbors
  *    (IGNORE NULLS window scans, one sort per type partition; edge
  *    gaps take the nearest one-sided neighbor). Window partitions are
  *    by event_type over the bounded grid, so the window never sees
  *    corpus-sized partitions.
  *  - funnel resolution (`win_funnel`) — ordered-subsequence detection
  *    (view → click → purchase) per user: each stage is a filtered
  *    map-side-combinable min-aggregate joined on the previous stage's
  *    user-grain result, so shuffled bytes are ∝ distinct users, never
  *    ∝ events, and each stage's type filter is pushed to the scan.
  */
object Extras7 extends QueryPack {

  /** Hourly (event_type × hour) sparse aggregate of high-value events
    * (value > 200 ≈ p99 — genuinely sparse at every fixture SF), plus
    * the dense calendar grid spanning observed min..max hour. */
  private def sparseHourly(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val f = Tables.events(s, dir).where(col("value") > 200)
      .select(col("event_type"), date_trunc("hour", col("ts")).as("h"), col("value"))
    val cal = f.agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
      .select(explode(sequence(col("h0"), col("h1"), expr("INTERVAL 1 HOUR"))).as("h"))
    val grid = f.select("event_type").distinct().crossJoin(broadcast(cal))
    (f, grid)
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // WITH RECURSIVE hierarchy walk: parent(k) = floor(k / 10) gives a
    // deterministic digit-truncation forest over customer keys (roots
    // are keys < 10, node 0 is its own parent and is seeded, not
    // recursed, to keep the derivation well-founded). Depth+root per
    // node, fully inside Catalyst's recursive-CTE operator (UnionLoop)
    // — each iteration is one broadcast-able join of the frontier
    // against the table; total work ∝ Σ frontier = n rows.
    "sql_recursive" -> ((s, dir) => {
      Tables.customer(s, dir).createOrReplaceTempView("customer_rcte")
      s.sql("""
        WITH RECURSIVE chain(custkey, root, depth) AS (
          SELECT c_custkey, c_custkey, 0 FROM customer_rcte WHERE c_custkey < 10
          UNION ALL
          SELECT c.c_custkey, ch.root, ch.depth + 1
          FROM customer_rcte c JOIN chain ch
            ON CAST(floor(c.c_custkey / 10) AS INT) = ch.custkey
          WHERE c.c_custkey >= 10
        )
        SELECT custkey, root, depth FROM chain ORDER BY custkey""")
    }),

    "ts_gapfill" -> ((s, dir) => {
      val (f, grid) = sparseHourly(s, dir)
      val obs = f.groupBy("event_type", "h")
        .agg(count(lit(1)).as("n"), Stable.dsum(col("value")).as("sum_v"))
      grid.join(obs, Seq("event_type", "h"), "left")
        .select(col("event_type"), unix_timestamp(col("h")).as("hour_ts"),
          coalesce(col("n"), lit(0L)).as("n"),
          coalesce(col("sum_v"), lit(0.0)).as("sum_v"))
        .orderBy("event_type", "hour_ts")
    }),

    // Interior gaps interpolate in INTEGER 1e-4 units (scaled values,
    // integer half-up division) so the result is a cross-engine-exact
    // rational — a bare double ROUND(interp, 4) ties at the .00005
    // boundary differently in Spark (BigDecimal HALF_UP on the exact
    // binary expansion) vs DuckDB (scaled-multiply nearbyint).
    "ts_interpolate" -> ((s, dir) => {
      val (f, grid) = sparseHourly(s, dir)
      val obs = f.groupBy("event_type", "h")
        .agg(Stable.davg(col("value")).as("v"))
      val g = grid.join(obs, Seq("event_type", "h"), "left")
        .select(col("event_type"), unix_timestamp(col("h")).as("hour_ts"), col("v"),
          round(col("v") * 10000).cast("long").as("vi"))
      val wp = Window.partitionBy("event_type").orderBy("hour_ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wn = Window.partitionBy("event_type").orderBy("hour_ts")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      g.select(col("event_type"), col("hour_ts"), col("v"),
          last(col("vi"), ignoreNulls = true).over(wp).as("pvi"),
          last(when(col("v").isNotNull, col("hour_ts")), ignoreNulls = true).over(wp).as("pti"),
          first(col("vi"), ignoreNulls = true).over(wn).as("nvi"),
          first(when(col("v").isNotNull, col("hour_ts")), ignoreNulls = true).over(wn).as("nti"))
        .select(col("event_type"), col("hour_ts"),
          when(col("v").isNotNull, lit(1)).otherwise(lit(0)).cast("int").as("observed"),
          when(col("v").isNotNull, col("v"))
            .when(col("pti").isNull, col("nvi") / lit(10000.0))
            .when(col("nti").isNull, col("pvi") / lit(10000.0))
            .otherwise(expr(
              """CAST((2 * (pvi * (nti - hour_ts) + nvi * (hour_ts - pti)) + (nti - pti))
                 DIV (2 * (nti - pti)) AS DOUBLE) / 10000.0""")).as("v"))
        .orderBy("event_type", "hour_ts")
    }),

    "win_funnel" -> ((s, dir) => {
      val e = Tables.events(s, dir).select(col("user_id"), col("event_type"),
        unix_timestamp(date_trunc("second", col("ts"))).as("t"))
      val v = e.where(col("event_type") === "view")
        .groupBy("user_id").agg(min("t").as("t_view"))
      val c = e.where(col("event_type") === "click").join(v, "user_id")
        .where(col("t") > col("t_view"))
        .groupBy("user_id").agg(min("t").as("t_click"))
      val p = e.where(col("event_type") === "purchase").join(c, "user_id")
        .where(col("t") > col("t_click"))
        .groupBy("user_id").agg(min("t").as("t_purchase"))
      v.join(c, Seq("user_id"), "left").join(p, Seq("user_id"), "left")
        .select(col("user_id"),
          (lit(1) + when(col("t_click").isNotNull, 1).otherwise(0)
                  + when(col("t_purchase").isNotNull, 1).otherwise(0))
            .cast("int").as("stage"),
          col("t_view"), col("t_click"), col("t_purchase"))
        .orderBy("user_id")
    })
  )

  override def oracleSql: Map[String, String] = Map(

    "sql_recursive" ->
      """WITH RECURSIVE chain(custkey, root, depth) AS (
        |  SELECT c_custkey, c_custkey, 0 FROM customer WHERE c_custkey < 10
        |  UNION ALL
        |  SELECT c.c_custkey, ch.root, ch.depth + 1
        |  FROM customer c JOIN chain ch
        |    ON CAST(floor(c.c_custkey / 10) AS INT) = ch.custkey
        |  WHERE c.c_custkey >= 10
        |)
        |SELECT custkey, root, depth FROM chain ORDER BY custkey""".stripMargin,

    "ts_gapfill" ->
      """WITH f AS (SELECT event_type, date_trunc('hour', ts) AS h, value
        |           FROM events WHERE value > 200),
        |obs AS (SELECT event_type, h, CAST(count(*) AS BIGINT) AS n,
        |          CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS sum_v
        |        FROM f GROUP BY 1, 2),
        |cal AS (SELECT unnest(generate_series((SELECT min(h) FROM f),
        |                                      (SELECT max(h) FROM f),
        |                                      INTERVAL 1 HOUR)) AS h),
        |ty AS (SELECT DISTINCT event_type FROM f)
        |SELECT ty.event_type, CAST(floor(epoch(cal.h)) AS BIGINT) AS hour_ts,
        |  coalesce(n, 0) AS n, coalesce(sum_v, 0.0) AS sum_v
        |FROM ty CROSS JOIN cal
        |LEFT JOIN obs ON obs.event_type = ty.event_type AND obs.h = cal.h
        |ORDER BY 1, 2""".stripMargin,

    "ts_interpolate" ->
      """WITH f AS (SELECT event_type, date_trunc('hour', ts) AS h, value
        |           FROM events WHERE value > 200),
        |obs AS (SELECT event_type, h,
        |          ROUND(CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*), 4) AS v
        |        FROM f GROUP BY 1, 2),
        |cal AS (SELECT unnest(generate_series((SELECT min(h) FROM f),
        |                                      (SELECT max(h) FROM f),
        |                                      INTERVAL 1 HOUR)) AS h),
        |ty AS (SELECT DISTINCT event_type FROM f),
        |g AS (SELECT ty.event_type, CAST(floor(epoch(cal.h)) AS BIGINT) AS hour_ts, v,
        |        CAST(round(v * 10000) AS BIGINT) AS vi
        |      FROM ty CROSS JOIN cal
        |      LEFT JOIN obs ON obs.event_type = ty.event_type AND obs.h = cal.h),
        |x AS (SELECT event_type, hour_ts, v,
        |  last_value(vi IGNORE NULLS) OVER wp AS pvi,
        |  last_value(CASE WHEN v IS NOT NULL THEN hour_ts END IGNORE NULLS) OVER wp AS pti,
        |  first_value(vi IGNORE NULLS) OVER wn AS nvi,
        |  first_value(CASE WHEN v IS NOT NULL THEN hour_ts END IGNORE NULLS) OVER wn AS nti
        |  FROM g WINDOW
        |    wp AS (PARTITION BY event_type ORDER BY hour_ts
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |    wn AS (PARTITION BY event_type ORDER BY hour_ts
        |           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT event_type, hour_ts,
        |  CAST(CASE WHEN v IS NOT NULL THEN 1 ELSE 0 END AS INT) AS observed,
        |  CASE WHEN v IS NOT NULL THEN v
        |       WHEN pti IS NULL THEN nvi / 10000.0
        |       WHEN nti IS NULL THEN pvi / 10000.0
        |       ELSE CAST((2 * (pvi * (nti - hour_ts) + nvi * (hour_ts - pti)) + (nti - pti))
        |            // (2 * (nti - pti)) AS DOUBLE) / 10000.0
        |  END AS v
        |FROM x ORDER BY 1, 2""".stripMargin,

    "win_funnel" ->
      """WITH e AS (SELECT user_id, event_type,
        |  CAST(floor(epoch(date_trunc('second', ts))) AS BIGINT) AS t FROM events),
        |v AS (SELECT user_id, min(t) AS t_view FROM e
        |      WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, min(t) AS t_click FROM e JOIN v USING (user_id)
        |      WHERE event_type = 'click' AND t > t_view GROUP BY 1),
        |p AS (SELECT e.user_id, min(t) AS t_purchase FROM e JOIN c USING (user_id)
        |      WHERE event_type = 'purchase' AND t > t_click GROUP BY 1)
        |SELECT v.user_id,
        |  CAST(1 + CAST(t_click IS NOT NULL AS INT)
        |         + CAST(t_purchase IS NOT NULL AS INT) AS INT) AS stage,
        |  t_view, t_click, t_purchase
        |FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)
        |ORDER BY user_id""".stripMargin
  )
}
