package graft.relational

import graft.{QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Subquery shapes through the SQL front-end (SURVEY.md §4: Catalyst
  * decorrelates these into joins — RewriteCorrelatedScalarSubquery /
  * RewritePredicateSubquery — so at scale they execute as the
  * broadcast/shuffle joins they should be, not per-row lookups). The
  * oracle strings are the same portable SQL.
  */
object Subqueries extends QueryPack {

  private def withViews(s: SparkSession, dir: String): Unit = {
    Tables.orders(s, dir).createOrReplaceTempView("orders")
    Tables.customer(s, dir).createOrReplaceTempView("customer")
  }

  private val scalarSql =
    """SELECT o_orderkey, o_totalprice FROM orders
      |WHERE o_totalprice > 3 * (SELECT AVG(o_totalprice) FROM orders)
      |ORDER BY o_orderkey""".stripMargin

  private val existsSql =
    """SELECT c_custkey, c_name FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders
      |              WHERE o_custkey = c_custkey AND o_totalprice > 450000)
      |ORDER BY c_custkey""".stripMargin

  private val inSql =
    """SELECT o_orderkey, o_custkey FROM orders
      |WHERE o_custkey IN (SELECT c_custkey FROM customer
      |                    WHERE c_mktsegment = 'MACHINERY' AND c_acctbal > 9000)
      |ORDER BY o_orderkey""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sub_scalar" -> ((s, dir) => { withViews(s, dir); s.sql(scalarSql) }),
    "sub_exists" -> ((s, dir) => { withViews(s, dir); s.sql(existsSql) }),
    "sub_in" -> ((s, dir) => { withViews(s, dir); s.sql(inSql) }),

    // Generator null-preserving variant: rows with empty arrays survive
    // with a NULL element
    "explode_outer_empty" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"),
          filter(split(col("text"), " "), t => t === "nonexistent-token").as("arr"))
        .select(col("doc_id"), explode_outer(col("arr")).as("tok"))
        .orderBy("doc_id"))
  )

  // AVG(double) in the scalar subquery: both engines average the same
  // doubles; the 3x-threshold comparison tolerates last-ulp drift unless
  // a row sits within ~1e-10 of the cut — accepted (verified at sf0.01).
  val oracleSql: Map[String, String] = Map(
    "sub_scalar" -> scalarSql,
    "sub_exists" -> existsSql,
    "sub_in" -> inSql,
    "explode_outer_empty" ->
      """SELECT doc_id, unnest(CASE WHEN len(arr) = 0 THEN [NULL] ELSE arr END) AS tok
        |FROM (SELECT doc_id,
        |             list_filter(string_split(text, ' '), t -> t = 'nonexistent-token') AS arr
        |      FROM documents)
        |ORDER BY doc_id""".stripMargin
  )
}
