package graft.relational

import graft.{QueryPack, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-quality gates (SURVEY.md §2 round-8 widening): the
  * expectations/contract-check layer every production pipeline runs
  * before publishing a table — rule-based checks (PK uniqueness, FK
  * integrity, range/enum/null contracts) and per-column profiling.
  *
  * Scale shape: all per-table rules for one table FUSE into ONE
  * scan-aggregate (conditional counts — no rule re-scans the table),
  * FK integrity is a LEFT ANTI join counted (the honest shape: at
  * cluster scale it shuffles on the key like any referential check),
  * and the report assembly unions 1-row frames — driver-light at any
  * table size. The acctbal rule intentionally FAILS on the fixture
  * (TPC-H-style data allows negative balances): the report's fail
  * path is exercised by real data, not a synthetic violation.
  */
object Quality extends QueryPack {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // rule-based contract checks: (rule, n_checked, n_violations, pass)
    "dq_checks" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      val l = Tables.lineitem(s, dir)
      val c = Tables.customer(s, dir)
      // one fused aggregate per table
      val oAgg = o.agg(count(lit(1)).as("n"),
        (count(lit(1)) - countDistinct(col("o_orderkey"))).as("v_pk"),
        sum((!col("o_orderstatus").isin("O", "F", "P")).cast("long")).as("v_enum"),
        sum((col("o_totalprice") <= 0).cast("long")).as("v_price"))
      val lAgg = l.agg(count(lit(1)).as("n"),
        sum((col("l_quantity") < 1 || col("l_quantity") > 50).cast("long")).as("v_qty"),
        sum((col("l_discount") < 0 || col("l_discount") > 0.1).cast("long")).as("v_disc"))
      val cAgg = c.agg(count(lit(1)).as("n"),
        sum(col("c_name").isNull.cast("long")).as("v_name"),
        sum((col("c_acctbal") < 0).cast("long")).as("v_bal"))
      // FK integrity: anti-join counts (parent side deduplicated by
      // the join semantics; only the key columns are scanned)
      val vFkL = l.select(col("l_orderkey"))
        .join(o.select(col("o_orderkey")),
          col("l_orderkey") === col("o_orderkey"), "left_anti")
        .agg(count(lit(1)).as("v_fk"))
      val vFkO = o.select(col("o_custkey"))
        .join(c.select(col("c_custkey")),
          col("o_custkey") === col("c_custkey"), "left_anti")
        .agg(count(lit(1)).as("v_fk"))
      val rows =
        oAgg.selectExpr(
          """stack(3,
             |'orders_pk_unique', n, v_pk,
             |'orders_status_enum', n, v_enum,
             |'orders_totalprice_positive', n, v_price)
             |AS (rule, n_checked, n_violations)""".stripMargin) union
        lAgg.selectExpr(
          """stack(2,
             |'lineitem_quantity_1_50', n, v_qty,
             |'lineitem_discount_0_01', n, v_disc)
             |AS (rule, n_checked, n_violations)""".stripMargin) union
        cAgg.selectExpr(
          """stack(2,
             |'customer_name_notnull', n, v_name,
             |'customer_acctbal_nonnegative', n, v_bal)
             |AS (rule, n_checked, n_violations)""".stripMargin) union
        lAgg.select(col("n")).crossJoin(vFkL)
          .select(lit("lineitem_orderkey_fk").as("rule"),
            col("n").as("n_checked"), col("v_fk").as("n_violations")) union
        oAgg.select(col("n")).crossJoin(vFkO)
          .select(lit("orders_custkey_fk").as("rule"),
            col("n").as("n_checked"), col("v_fk").as("n_violations"))
      rows.withColumn("pass", col("n_violations") === 0)
        .orderBy("rule")
    }),

    // Distribution-drift monitor (PSI): day-1 vs delta doc-length
    // distributions over 16 fixed buckets — the population-stability
    // check a training-data pipeline runs per snapshot before trusting
    // its mixture. Laplace add-1 smoothing makes every bucket share
    // well-defined on both engines; shares are exact-int quotients
    // ((cnt+1)/(n+16), ONE double division each), each bucket's PSI
    // term (q-p)·ln(q/p) is rounded to 12 BEFORE emission so libm ulp
    // never reaches the hash gate. Per-bucket rows (the diagnostic a
    // human reads); Σ psi_term is the headline statistic. Shape: one
    // map-side bucket assignment + a 16-row conditional rollup per
    // side — scan-bound, output O(buckets).
    "dq_drift_psi" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"),
          least(floor(size(split(col("text"), " ")) / 32), lit(15L))
            .cast("long").as("bkt"))
      val side = (pred: Column, pfx: String) => docs.where(pred)
        .groupBy("bkt").agg(count(lit(1)).as(s"${pfx}_c"))
      val grid = s.range(0, 16).select(col("id").as("bkt"))
      val counts = grid
        .join(side(col("doc_id") % 4 =!= 0, "d1"), Seq("bkt"), "left")
        .join(side(col("doc_id") % 4 === 0, "dl"), Seq("bkt"), "left")
        .select(col("bkt"),
          coalesce(col("d1_c"), lit(0L)).as("n_day1"),
          coalesce(col("dl_c"), lit(0L)).as("n_delta"))
      val tot = counts.agg(sum(col("n_day1")).as("t1"),
        sum(col("n_delta")).as("t2"))
      counts.crossJoin(broadcast(tot))
        .withColumn("p", (col("n_day1") + 1).cast("double") / (col("t1") + 16))
        .withColumn("q", (col("n_delta") + 1).cast("double") / (col("t2") + 16))
        .select(col("bkt"), col("n_day1"), col("n_delta"),
          round((col("q") - col("p")) * log(col("q") / col("p")), 12)
            .as("psi_term"))
        .orderBy("bkt")
    }),

    // Join-skew pre-flight: the "should I salt this join?" histogram —
    // per log2-size bucket, how many join keys and how many rows sit
    // there, plus each bucket's max group. A single groupBy(key) count
    // (the exchange any join on this key pays anyway) reduced to a
    // ≤64-row report; read before choosing join_skew_salted vs a plain
    // shuffle join. log2 via floor(ln/ln2 + ε): cnt is a power-of-2
    // boundary value exactly when it matters, and libm ln(2^k)/ln(2)
    // can land 1 ulp BELOW k — the epsilon (≪ the gap to the next
    // representable quotient elsewhere) pins the bucket on both
    // engines.
    "obs_join_skew" -> ((s, dir) => {
      val sizes = Tables.lineitem(s, dir)
        .groupBy(col("l_orderkey")).agg(count(lit(1)).as("cnt"))
      sizes
        .withColumn("sz_log2",
          floor(log(col("cnt").cast("double")) / math.log(2.0) + 1e-9)
            .cast("long"))
        .groupBy("sz_log2")
        .agg(count(lit(1)).as("n_keys"), sum(col("cnt")).as("n_rows"),
          max(col("cnt")).as("max_group"))
        .orderBy("sz_log2")
    }),

    // per-column profile of orders: nulls, distinct, min/max rendered
    // through parity-safe casts (dates via DATE, doubles via
    // DECIMAL(18,2) — raw double→string formatting is engine-
    // dependent; decimal keeps scale identically on both). One
    // single-column aggregate PER COLUMN, unioned: each branch's
    // parquet scan prunes to exactly its column (columnar-friendly —
    // same total bytes as one all-column pass) and a single
    // countDistinct plans as a plain two-phase aggregate. The first
    // cut fused all five into one agg: Catalyst's mixed
    // multi-distinct rewrite expanded ×5 AND duplicated the whole
    // aggregate subtree — measured 2.2 s vs 0.9 s for this shape at
    // sf0.1.
    "dq_profile" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      def prof(c: String, mn: Column, mx: Column): DataFrame =
        o.agg(
          sum(col(c).isNull.cast("long")).as("n_nulls"),
          countDistinct(col(c)).as("n_distinct"),
          mn.as("min_s"), mx.as("max_s"))
          .select(lit(c).as("column"), col("n_nulls"), col("n_distinct"),
            col("min_s"), col("max_s"))
      prof("o_orderkey", min(col("o_orderkey")).cast("string"),
          max(col("o_orderkey")).cast("string"))
        .unionAll(prof("o_custkey", min(col("o_custkey")).cast("string"),
          max(col("o_custkey")).cast("string")))
        .unionAll(prof("o_orderstatus", min(col("o_orderstatus")),
          max(col("o_orderstatus"))))
        .unionAll(prof("o_totalprice",
          min(col("o_totalprice")).cast("decimal(18,2)").cast("string"),
          max(col("o_totalprice")).cast("decimal(18,2)").cast("string")))
        .unionAll(prof("o_orderdate",
          min(col("o_orderdate")).cast("date").cast("string"),
          max(col("o_orderdate")).cast("date").cast("string")))
        .orderBy("column")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "dq_checks" ->
      """WITH oa AS (
        |  SELECT COUNT(*) AS n,
        |    COUNT(*) - COUNT(DISTINCT o_orderkey) AS v_pk,
        |    CAST(SUM(CASE WHEN o_orderstatus NOT IN ('O','F','P') THEN 1 ELSE 0 END) AS BIGINT) AS v_enum,
        |    CAST(SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS v_price
        |  FROM orders),
        |la AS (
        |  SELECT COUNT(*) AS n,
        |    CAST(SUM(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END) AS BIGINT) AS v_qty,
        |    CAST(SUM(CASE WHEN l_discount < 0 OR l_discount > 0.1 THEN 1 ELSE 0 END) AS BIGINT) AS v_disc
        |  FROM lineitem),
        |ca AS (
        |  SELECT COUNT(*) AS n,
        |    CAST(SUM(CASE WHEN c_name IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v_name,
        |    CAST(SUM(CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END) AS BIGINT) AS v_bal
        |  FROM customer),
        |fkl AS (
        |  SELECT COUNT(*) AS v_fk FROM lineitem l
        |  WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)),
        |fko AS (
        |  SELECT COUNT(*) AS v_fk FROM orders o
        |  WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)),
        |r AS (
        |  SELECT 'orders_pk_unique' AS rule, n AS n_checked, v_pk AS n_violations FROM oa
        |  UNION ALL SELECT 'orders_status_enum', n, v_enum FROM oa
        |  UNION ALL SELECT 'orders_totalprice_positive', n, v_price FROM oa
        |  UNION ALL SELECT 'lineitem_quantity_1_50', n, v_qty FROM la
        |  UNION ALL SELECT 'lineitem_discount_0_01', n, v_disc FROM la
        |  UNION ALL SELECT 'customer_name_notnull', n, v_name FROM ca
        |  UNION ALL SELECT 'customer_acctbal_nonnegative', n, v_bal FROM ca
        |  UNION ALL SELECT 'lineitem_orderkey_fk', (SELECT n FROM la), v_fk FROM fkl
        |  UNION ALL SELECT 'orders_custkey_fk', (SELECT n FROM oa), v_fk FROM fko)
        |SELECT rule, n_checked, n_violations, n_violations = 0 AS pass
        |FROM r ORDER BY rule""".stripMargin,

    "dq_drift_psi" ->
      """WITH b AS (
        |  SELECT doc_id,
        |    least(CAST(floor(len(string_split(text, ' ')) / 32) AS BIGINT), 15) AS bkt
        |  FROM documents),
        |g AS (SELECT unnest(generate_series(0, 15)) AS bkt),
        |d1 AS (SELECT bkt, COUNT(*) AS c FROM b WHERE doc_id % 4 <> 0 GROUP BY bkt),
        |dl AS (SELECT bkt, COUNT(*) AS c FROM b WHERE doc_id % 4 = 0 GROUP BY bkt),
        |cc AS (
        |  SELECT g.bkt,
        |    COALESCE(d1.c, 0) AS n_day1, COALESCE(dl.c, 0) AS n_delta
        |  FROM g LEFT JOIN d1 USING (bkt) LEFT JOIN dl USING (bkt)),
        |t AS (SELECT CAST(SUM(n_day1) AS BIGINT) AS t1,
        |             CAST(SUM(n_delta) AS BIGINT) AS t2 FROM cc),
        |pq AS (
        |  SELECT bkt, n_day1, n_delta,
        |    CAST(n_day1 + 1 AS DOUBLE) / (t1 + 16) AS p,
        |    CAST(n_delta + 1 AS DOUBLE) / (t2 + 16) AS q
        |  FROM cc CROSS JOIN t)
        |SELECT bkt, n_day1, n_delta,
        |       ROUND((q - p) * ln(q / p), 12) AS psi_term
        |FROM pq ORDER BY bkt""".stripMargin,

    "obs_join_skew" ->
      """WITH s AS (
        |  SELECT l_orderkey, COUNT(*) AS cnt FROM lineitem GROUP BY l_orderkey)
        |SELECT CAST(floor(ln(CAST(cnt AS DOUBLE)) / ln(2.0) + 0.000000001) AS BIGINT) AS sz_log2,
        |       COUNT(*) AS n_keys,
        |       CAST(SUM(cnt) AS BIGINT) AS n_rows,
        |       MAX(cnt) AS max_group
        |FROM s GROUP BY 1 ORDER BY sz_log2""".stripMargin,

    "dq_profile" ->
      """WITH a AS (
        |  SELECT
        |    CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nl_ok,
        |    COUNT(DISTINCT o_orderkey) AS nd_ok,
        |    CAST(MIN(o_orderkey) AS VARCHAR) AS mn_ok,
        |    CAST(MAX(o_orderkey) AS VARCHAR) AS mx_ok,
        |    CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nl_ck,
        |    COUNT(DISTINCT o_custkey) AS nd_ck,
        |    CAST(MIN(o_custkey) AS VARCHAR) AS mn_ck,
        |    CAST(MAX(o_custkey) AS VARCHAR) AS mx_ck,
        |    CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nl_st,
        |    COUNT(DISTINCT o_orderstatus) AS nd_st,
        |    MIN(o_orderstatus) AS mn_st,
        |    MAX(o_orderstatus) AS mx_st,
        |    CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nl_tp,
        |    COUNT(DISTINCT o_totalprice) AS nd_tp,
        |    CAST(CAST(MIN(o_totalprice) AS DECIMAL(18,2)) AS VARCHAR) AS mn_tp,
        |    CAST(CAST(MAX(o_totalprice) AS DECIMAL(18,2)) AS VARCHAR) AS mx_tp,
        |    CAST(SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nl_od,
        |    COUNT(DISTINCT o_orderdate) AS nd_od,
        |    CAST(CAST(MIN(o_orderdate) AS DATE) AS VARCHAR) AS mn_od,
        |    CAST(CAST(MAX(o_orderdate) AS DATE) AS VARCHAR) AS mx_od
        |  FROM orders)
        |SELECT 'o_orderkey' AS "column", nl_ok AS n_nulls, nd_ok AS n_distinct, mn_ok AS min_s, mx_ok AS max_s FROM a
        |UNION ALL SELECT 'o_custkey', nl_ck, nd_ck, mn_ck, mx_ck FROM a
        |UNION ALL SELECT 'o_orderstatus', nl_st, nd_st, mn_st, mx_st FROM a
        |UNION ALL SELECT 'o_totalprice', nl_tp, nd_tp, mn_tp, mx_tp FROM a
        |UNION ALL SELECT 'o_orderdate', nl_od, nd_od, mn_od, mx_od FROM a
        |ORDER BY "column"""".stripMargin
  )
}
