package graft.relational

import graft.{QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-8 SQL-front-end surface, continued: named-parameter queries
  * and SQL-defined functions — the two remaining "day-one" API shapes
  * a user migrating a SQL workload expects.
  *
  *  - `sql_parameterized` — `spark.sql(query, args)` with named
  *    parameter markers (`:minp`): the injection-safe templating API.
  *    Parameters are bound as literals BEFORE analysis, so constant
  *    folding and parquet pushdown see the bound value exactly as if
  *    it were inlined — the oracle IS the inlined form.
  *
  *  - `fn_sql_udf` — a SQL scalar UDF (`CREATE TEMPORARY FUNCTION …
  *    RETURNS … RETURN expr`, Spark 4 SQL UDFs): the engine inlines
  *    the body into the calling plan at analysis time, so the UDF
  *    costs NOTHING at execution — same codegen'd expression tree as
  *    writing the formula inline (unlike a JVM closure UDF, which
  *    black-boxes optimization). The aggregate runs over an exact
  *    decimal widening of the UDF result (the repo's stable-sum rule),
  *    so engines agree bit-for-bit.
  *
  *  - `fn_sql_udtf` — a SQL table function (`RETURNS TABLE`): the
  *    declarative macro for a parameterized subquery, LATERAL-joined
  *    per input row. Inlined the same way; the lateral correlation
  *    plans as a join, not a per-row re-execution.
  */
object Extras15 extends QueryPack {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sql_parameterized" -> ((s, dir) => {
      Tables.orders(s, dir).createOrReplaceTempView("orders")
      s.sql(
        """SELECT o_orderpriority, count(*) AS n,
          |       cast(max(o_totalprice) AS double) AS max_price
          |FROM orders
          |WHERE o_totalprice > :minp AND o_orderstatus = :st
          |GROUP BY o_orderpriority
          |ORDER BY o_orderpriority""".stripMargin,
        Map("minp" -> 150000, "st" -> "F"))
    }),

    "fn_sql_udf" -> ((s, dir) => {
      Tables.lineitem(s, dir).createOrReplaceTempView("lineitem")
      s.sql("""CREATE OR REPLACE TEMPORARY FUNCTION disc_price(p DOUBLE, d DOUBLE)
              |RETURNS DECIMAL(28,6) RETURN cast(p * (1.0 - d) AS decimal(28,6))
              |""".stripMargin)
      s.sql(
        """SELECT l_returnflag,
          |       cast(round(sum(disc_price(l_extendedprice, l_discount)), 2)
          |            AS double) AS revenue,
          |       count(*) AS n
          |FROM lineitem
          |GROUP BY l_returnflag
          |ORDER BY l_returnflag""".stripMargin)
    }),

    "fn_sql_udtf" -> ((s, dir) => {
      Tables.orders(s, dir).createOrReplaceTempView("orders")
      Tables.lineitem(s, dir).createOrReplaceTempView("lineitem")
      s.sql("""CREATE OR REPLACE TEMPORARY FUNCTION order_lines(k BIGINT)
              |RETURNS TABLE (n_lines BIGINT, qty DOUBLE)
              |RETURN SELECT count(*), sum(l_quantity)
              |       FROM lineitem WHERE l_orderkey = k
              |""".stripMargin)
      s.sql(
        """SELECT o_orderkey, t.n_lines, t.qty
          |FROM orders, LATERAL order_lines(o_orderkey) t
          |WHERE o_orderkey % 100 = 0 AND t.n_lines >= 4
          |ORDER BY o_orderkey""".stripMargin)
    })
  )

  val oracleSql: Map[String, String] = Map(
    "sql_parameterized" ->
      """SELECT o_orderpriority, count(*) AS n,
        |       CAST(max(o_totalprice) AS DOUBLE) AS max_price
        |FROM orders
        |WHERE o_totalprice > 150000 AND o_orderstatus = 'F'
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "fn_sql_udf" ->
      """SELECT l_returnflag,
        |       CAST(round(sum(CAST(l_extendedprice * (1.0 - l_discount)
        |                           AS DECIMAL(28,6))), 2) AS DOUBLE) AS revenue,
        |       count(*) AS n
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    "fn_sql_udtf" ->
      """SELECT o_orderkey, t.n_lines, t.qty
        |FROM orders, LATERAL (
        |  SELECT count(*) AS n_lines, sum(l_quantity) AS qty
        |  FROM lineitem WHERE l_orderkey = o_orderkey) t
        |WHERE o_orderkey % 100 = 0 AND t.n_lines >= 4
        |ORDER BY o_orderkey""".stripMargin
  )
}
