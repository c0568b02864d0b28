package graft.relational

import graft.{QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Round-7 widening: the eight TPC-H queries the suite was still
  * missing (Q2, Q9, Q11, Q12, Q16, Q20, Q21, Q22), adapted to the
  * trimmed fixture schema exactly the way `sql_tpch_q4` was
  * (FIXTURES.md: no partsupp table, no l_commitdate / l_receiptdate /
  * l_shipmode / c_phone columns). Each adaptation keeps the query's
  * canonical OPTIMIZER shape — that is what these benchmarks exist to
  * exercise — and swaps only the missing physical columns:
  *
  *  - partsupp is derived from lineitem: `ps(partkey, suppkey,
  *    supplycost = MIN(l_extendedprice / l_quantity))` — the observed
  *    min unit price per (part, supplier). Division is IEEE-754 double
  *    in both engines, and MIN is selection (not accumulation), so the
  *    derived cost is bit-identical across Spark and the DuckDB oracle.
  *  - "late" (Q12/Q21) = shipped more than N days after the order date
  *    (Q4's precedent: no receipt/commit dates exist).
  *  - Q22's phone country code = c_nationkey (no c_phone column).
  *
  * Numeric discipline is SURVEY §7.5 throughout: doubles are cast to
  * DECIMAL before SUM (exact, order-independent accumulation — HAVING /
  * scalar-subquery threshold comparisons can then never flip on
  * partial-sum ordering), emitted as DOUBLE, ROUNDed where a ratio or
  * division reintroduces float noise. LIMITed queries carry a total
  * ORDER BY (unique tiebreak columns) so the kept prefix is
  * deterministic in both engines.
  *
  * What each query shape buys at 100 TB (the reason these eight exist):
  * Q2 correlated-scalar-MIN decorrelation; Q9 five-table join reorder
  * with an expression aggregate; Q11 global-scalar HAVING (one tiny
  * broadcast scalar against a shuffled agg); Q12 conditional two-way
  * counting; Q16 NOT-IN null-safe anti join + distinct agg; Q20 nested
  * IN with a grouped HAVING inner; Q21 the EXISTS + NOT-EXISTS double
  * self-join (the classic hardest plan); Q22 anti join + scalar avg
  * gate. All dims broadcast; every fact-side exchange is a key shuffle
  * Catalyst already plans two-phase.
  */
object Extras12 extends QueryPack {

  import org.apache.spark.sql.functions._

  /** One-time persisted derived-partsupp artifact (VERDICT r07 item
    * 4): ONE lineitem scan distills both partsupp-shaped aggregates
    * the suite consumes — ps_supplycost = MIN(l_extendedprice /
    * l_quantity) (Q2's derived cost; MIN is selection, bit-identical
    * to the row-level form) and ps_value = SUM(DECIMAL(28,4)
    * price·qty) per (part, supplier) (Q11's value; DECIMAL sums
    * re-aggregate exactly, so Q11's per-part rollup over the artifact
    * equals the row-level sum bit-for-bit). Catalyst does not reuse a
    * CTE across its two references, so the un-materialized form paid
    * the lineitem aggregation TWICE per query (BASELINE.md round-7
    * 10× probe); every consumer now reads this bucketed table
    * (ps_partkey = Q2's join key and Q11's rollup key — bucket-to-
    * bucket, no artifact-side exchange). Fingerprint-keyed write-once,
    * the pagerank-edge / curate-head pattern. In production this IS
    * the materialized partsupp a user maintains next to lineitem. */
  private[graft] def psTable(s: SparkSession, dir: String): String = {
    val t = s"tpch_ps_${Tables.pathKey(dir)}_" +
      Tables.pathKey(Tables.fingerprint(dir, "lineitem"))
    if (!s.catalog.tableExists(t)) {
      Tables.dropStaleTables(s, s"tpch_ps_${Tables.pathKey(dir)}_")
      Tables.lineitem(s, dir)
        .groupBy(col("l_partkey").as("ps_partkey"),
          col("l_suppkey").as("ps_suppkey"))
        .agg(min(col("l_extendedprice") / col("l_quantity"))
            .as("ps_supplycost"),
          sum((col("l_extendedprice") * col("l_quantity"))
            .cast("decimal(28,4)")).as("ps_value"))
        .write.mode("overwrite")
        .bucketBy(16, "ps_partkey").sortBy("ps_partkey")
        .format("parquet").saveAsTable(t)
    }
    t
  }

  private def views(s: SparkSession, dir: String): Unit = {
    Tables.region(s, dir).createOrReplaceTempView("region_v")
    Tables.nation(s, dir).createOrReplaceTempView("nation_v")
    Tables.customer(s, dir).createOrReplaceTempView("customer_v")
    Tables.supplier(s, dir).createOrReplaceTempView("supplier_v")
    Tables.part(s, dir).createOrReplaceTempView("part_v")
    Tables.orders(s, dir).createOrReplaceTempView("orders_v")
    Tables.lineitem(s, dir).createOrReplaceTempView("lineitem_v")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Q2 (min-cost supplier): the correlated scalar-MIN subquery that
    // Catalyst decorrelates into an aggregate-then-join on p_partkey.
    // partsupp is the PERSISTED derived artifact (psTable — round 8):
    // both references read the bucketed table instead of re-aggregating
    // lineitem per consumer; p_size<=5 LARGE in EUROPE keeps the
    // result non-empty from sf0.001 up. Oracle unchanged — it still
    // derives the CTE from scratch, which is what proves the artifact
    // faithful.
    "sql_tpch_q2" -> ((s, dir) => {
      views(s, dir)
      s.table(psTable(s, dir)).createOrReplaceTempView("ps")
      s.sql("""
        SELECT s_acctbal, s_name, n_name, p_partkey, p_name
        FROM part_v, supplier_v, ps, nation_v, region_v
        WHERE p_partkey = ps_partkey AND s_suppkey = ps_suppkey
          AND p_size <= 5 AND p_type = 'LARGE'
          AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
          AND r_name = 'EUROPE'
          AND ps_supplycost = (
            SELECT MIN(ps_supplycost)
            FROM ps, supplier_v, nation_v, region_v
            WHERE ps_partkey = p_partkey AND s_suppkey = ps_suppkey
              AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
              AND r_name = 'EUROPE')
        ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        LIMIT 100""")
    }),

    // Q9 (product-type profit): five-table join, profit expression
    // aggregate by (nation, year). supplycost stands in as 10% of
    // retail price per unit (header note).
    "sql_tpch_q9" -> ((s, dir) => {
      views(s, dir)
      s.sql("""
        SELECT nation, o_year,
               CAST(SUM(amount) AS DOUBLE) AS sum_profit
        FROM (
          SELECT n_name AS nation,
                 CAST(year(o_orderdate) AS BIGINT) AS o_year,
                 CAST(l_extendedprice * (1 - l_discount)
                      - p_retailprice * l_quantity * 0.1
                      AS DECIMAL(28,4)) AS amount
          FROM part_v, supplier_v, lineitem_v, orders_v, nation_v
          WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
            AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
            AND p_name LIKE '%red%') profit
        GROUP BY nation, o_year
        ORDER BY nation, o_year DESC""")
    }),

    // Q11 (important part values): grouped sum gated by a global
    // scalar subquery in HAVING — exact DECIMAL accumulation on both
    // sides so the 0.1% threshold comparison can never flip on
    // partial-sum order. v reads the persisted artifact's
    // per-(part,supplier) DECIMAL sums (psTable — round 8): decimal
    // addition is associative, so the two-stage rollup is bit-equal to
    // the row-level form the (unchanged) oracle computes; both CTE
    // references now touch an artifact-sized join, never lineitem.
    "sql_tpch_q11" -> ((s, dir) => {
      views(s, dir)
      s.table(psTable(s, dir)).createOrReplaceTempView("ps")
      s.sql("""
        WITH v AS (
          SELECT ps_partkey, ps_value AS val
          FROM ps JOIN supplier_v ON s_suppkey = ps_suppkey
               JOIN nation_v ON s_nationkey = n_nationkey
          WHERE n_name = 'NATION_3')
        SELECT ps_partkey,
               ROUND(CAST(SUM(val) AS DOUBLE), 2) AS part_value
        FROM v
        GROUP BY ps_partkey
        HAVING SUM(val) > (SELECT SUM(val) * 0.001 FROM v)
        ORDER BY part_value DESC, ps_partkey""")
    }),

    // Q12 (shipping priority classes): conditional two-way counting.
    // l_linestatus stands in for the absent l_shipmode; late = shipped
    // more than 60 days after the order date (Q4's precedent).
    "sql_tpch_q12" -> ((s, dir) => {
      views(s, dir)
      s.sql("""
        SELECT l_linestatus,
               COUNT(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                          THEN 1 END) AS high_line_count,
               COUNT(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
                          THEN 1 END) AS low_line_count
        FROM orders_v JOIN lineitem_v ON o_orderkey = l_orderkey
        WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
          AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY l_linestatus
        ORDER BY l_linestatus""")
    }),

    // Q16 (supplier count by part attrs): NOT IN (null-free key →
    // plain anti join) + COUNT(DISTINCT) over the lineitem-derived
    // part-supplier relation. "Complaint" suppliers — the original's
    // comment LIKE — become negative-balance suppliers.
    "sql_tpch_q16" -> ((s, dir) => {
      views(s, dir)
      s.sql("""
        SELECT p_brand, p_type, p_size,
               COUNT(DISTINCT l_suppkey) AS supplier_cnt
        FROM lineitem_v JOIN part_v ON p_partkey = l_partkey
        WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
          AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
          AND l_suppkey NOT IN
              (SELECT s_suppkey FROM supplier_v WHERE s_acctbal < 0)
        GROUP BY p_brand, p_type, p_size
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""")
    }),

    // Q20 (potential part promotion): nested IN whose inner is a
    // grouped HAVING over shipped quantity — suppliers in EUROPE who
    // moved >30 units of any red part in 1996.
    "sql_tpch_q20" -> ((s, dir) => {
      views(s, dir)
      s.sql("""
        SELECT s_suppkey, s_name
        FROM supplier_v JOIN nation_v ON s_nationkey = n_nationkey
             JOIN region_v ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE'
          AND s_suppkey IN (
            SELECT l_suppkey
            FROM lineitem_v JOIN part_v ON p_partkey = l_partkey
            WHERE p_name LIKE '%red%'
              AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
            GROUP BY l_suppkey, l_partkey
            HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 30)
        ORDER BY s_suppkey""")
    }),

    // Q21 (suppliers who kept orders waiting): the EXISTS + NOT EXISTS
    // double lineitem self-join — the canonical hardest TPC-H plan.
    // Late = shipped >90 days after the order date; the NOT EXISTS
    // correlates on the OUTER order's date (multi-table correlation).
    "sql_tpch_q21" -> ((s, dir) => {
      views(s, dir)
      s.sql("""
        SELECT s_name, COUNT(*) AS numwait
        FROM supplier_v, lineitem_v l1, orders_v, nation_v
        WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
          AND o_orderstatus = 'F'
          AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
          AND EXISTS (SELECT 1 FROM lineitem_v l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem_v l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_shipdate > o_orderdate + INTERVAL 90 DAY)
          AND s_nationkey = n_nationkey AND n_name = 'NATION_3'
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 100""")
    }),

    // Q22 (global sales opportunity): scalar-average gate + anti join.
    // Country code = c_nationkey (no c_phone exists); "never ordered"
    // becomes "dormant since 1999" (every fixture customer has some
    // order). The average is an exact DECIMAL sum divided as DOUBLE, so
    // the > gate is bit-identical across engines.
    "sql_tpch_q22" -> ((s, dir) => {
      views(s, dir)
      s.sql("""
        SELECT cntrycode, COUNT(*) AS numcust,
               ROUND(CAST(SUM(acctbal) AS DOUBLE), 2) AS totacctbal
        FROM (
          SELECT c_nationkey AS cntrycode, c_custkey,
                 CAST(c_acctbal AS DECIMAL(18,2)) AS acctbal
          FROM customer_v
          WHERE c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
            AND c_acctbal > (
              SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                     / COUNT(*)
              FROM customer_v
              WHERE c_acctbal > 0.0
                AND c_nationkey IN (1, 3, 5, 7, 9, 11, 13))) cand
        WHERE NOT EXISTS (
          SELECT 1 FROM orders_v
          WHERE o_custkey = c_custkey
            AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
        GROUP BY cntrycode
        ORDER BY cntrycode""")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "sql_tpch_q2" ->
      """WITH ps AS (
        |  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
        |         MIN(l_extendedprice / l_quantity) AS ps_supplycost
        |  FROM lineitem GROUP BY l_partkey, l_suppkey)
        |SELECT s_acctbal, s_name, n_name, p_partkey, p_name
        |FROM part, supplier, ps, nation, region
        |WHERE p_partkey = ps_partkey AND s_suppkey = ps_suppkey
        |  AND p_size <= 5 AND p_type = 'LARGE'
        |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |  AND r_name = 'EUROPE'
        |  AND ps_supplycost = (
        |    SELECT MIN(ps_supplycost)
        |    FROM ps, supplier, nation, region
        |    WHERE ps_partkey = p_partkey AND s_suppkey = ps_suppkey
        |      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |      AND r_name = 'EUROPE')
        |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        |LIMIT 100""".stripMargin,

    "sql_tpch_q9" ->
      """SELECT nation, o_year,
        |       CAST(SUM(amount) AS DOUBLE) AS sum_profit
        |FROM (
        |  SELECT n_name AS nation,
        |         CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |         CAST(l_extendedprice * (1 - l_discount)
        |              - p_retailprice * l_quantity * 0.1
        |              AS DECIMAL(28,4)) AS amount
        |  FROM part, supplier, lineitem, orders, nation
        |  WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
        |    AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
        |    AND p_name LIKE '%red%') profit
        |GROUP BY nation, o_year
        |ORDER BY nation, o_year DESC""".stripMargin,

    "sql_tpch_q11" ->
      """WITH v AS (
        |  SELECT l_partkey AS ps_partkey,
        |         CAST(l_extendedprice * l_quantity AS DECIMAL(28,4)) AS val
        |  FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
        |       JOIN nation ON s_nationkey = n_nationkey
        |  WHERE n_name = 'NATION_3')
        |SELECT ps_partkey,
        |       ROUND(CAST(SUM(val) AS DOUBLE), 2) AS part_value
        |FROM v
        |GROUP BY ps_partkey
        |HAVING SUM(val) > (SELECT SUM(val) * 0.001 FROM v)
        |ORDER BY part_value DESC, ps_partkey""".stripMargin,

    "sql_tpch_q12" ->
      """SELECT l_linestatus,
        |       COUNT(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
        |                  THEN 1 END) AS high_line_count,
        |       COUNT(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
        |                  THEN 1 END) AS low_line_count
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
        |  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY l_linestatus
        |ORDER BY l_linestatus""".stripMargin,

    "sql_tpch_q16" ->
      """SELECT p_brand, p_type, p_size,
        |       COUNT(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
        |  AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
        |  AND l_suppkey NOT IN
        |      (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,

    "sql_tpch_q20" ->
      """SELECT s_suppkey, s_name
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |     JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'EUROPE'
        |  AND s_suppkey IN (
        |    SELECT l_suppkey
        |    FROM lineitem JOIN part ON p_partkey = l_partkey
        |    WHERE p_name LIKE '%red%'
        |      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        |    GROUP BY l_suppkey, l_partkey
        |    HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 30)
        |ORDER BY s_suppkey""".stripMargin,

    "sql_tpch_q21" ->
      """SELECT s_name, COUNT(*) AS numwait
        |FROM supplier, lineitem l1, orders, nation
        |WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
        |  AND o_orderstatus = 'F'
        |  AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_shipdate > o_orderdate + INTERVAL 90 DAY)
        |  AND s_nationkey = n_nationkey AND n_name = 'NATION_3'
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name
        |LIMIT 100""".stripMargin,

    "sql_tpch_q22" ->
      """SELECT cntrycode, COUNT(*) AS numcust,
        |       ROUND(CAST(SUM(acctbal) AS DOUBLE), 2) AS totacctbal
        |FROM (
        |  SELECT c_nationkey AS cntrycode, c_custkey,
        |         CAST(c_acctbal AS DECIMAL(18,2)) AS acctbal
        |  FROM customer
        |  WHERE c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
        |    AND c_acctbal > (
        |      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
        |             / COUNT(*)
        |      FROM customer
        |      WHERE c_acctbal > 0.0
        |        AND c_nationkey IN (1, 3, 5, 7, 9, 11, 13))) cand
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey
        |    AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
        |GROUP BY cntrycode
        |ORDER BY cntrycode""".stripMargin
  )
}
