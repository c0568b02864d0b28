package graft.relational

import graft.{QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-8 Spark-4 language-surface keys: SQL pipe syntax and
  * case-insensitive collations — features a user migrating to this
  * engine on Spark 4.x will reach for on day one. Both compile to the
  * SAME Catalyst plans as their classic forms (pipe stages are sugar;
  * a collated comparison is an expression), so the 100 TB posture is
  * whatever the underlying plan already proved — the point of these
  * keys is that the SURFACE works and hash-matches an engine-neutral
  * oracle.
  */
object Extras14 extends QueryPack {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // SQL pipe syntax (Spark 4.0+): the linear FROM |> JOIN |> WHERE
    // |> AGGREGATE |> ORDER BY form of a classic segment rollup —
    // stage order IS evaluation order, so the query reads the way the
    // plan executes. Same plan as the nested-SQL twin; the oracle is
    // the classic form in DuckDB.
    "sql_pipe" -> ((s, dir) => {
      Tables.orders(s, dir).createOrReplaceTempView("orders")
      Tables.customer(s, dir).createOrReplaceTempView("customer")
      s.sql(
        """FROM orders
          ||> JOIN customer ON o_custkey = c_custkey
          ||> WHERE o_orderstatus = 'F'
          ||> AGGREGATE count(*) AS n_orders,
          |             cast(sum(cast(o_totalprice AS decimal(28,2))) AS double) AS sum_price
          |   GROUP BY c_mktsegment
          ||> ORDER BY c_mktsegment""".stripMargin)
        .select(col("c_mktsegment"), col("n_orders"),
          round(col("sum_price"), 2).as("sum_price"))
    }),

    // Case-insensitive collation (Spark 4.0+): names are
    // deterministically case-mangled (UPPER on even keys, Initcap on
    // odd), then grouped under UTF8_LCASE — 'ALGERIA' and 'Algeria'
    // land in one group without a lower() projection; the emitted
    // representative is the BINARY min of the original spellings
    // (deterministic on both engines, no collation in the output
    // schema — collated strings don't cross the hash gate). The
    // oracle reproduces the grouping with lower() — provably the same
    // partition of rows, reached through a different mechanism.
    "fn_collation" -> ((s, dir) => {
      // first-letter-only capitalization, spelled out identically on
      // both engines (Spark initcap is word-wise — "UNITED STATES"
      // would diverge from a first-letter-only SQL twin)
      val cap1 = concat(upper(substring(lower(col("n_name")), 1, 1)),
        substring(lower(col("n_name")), 2, 1000000))
      val mangled = when(col("n_nationkey") % 2 === 0, upper(col("n_name")))
        .otherwise(cap1)
      val two = Tables.nation(s, dir).select(col("n_nationkey"), mangled.as("nm"))
        .unionAll(Tables.nation(s, dir)
          .select(col("n_nationkey") + 100, lower(mangled).as("nm")))
      two.groupBy(collate(col("nm"), "UTF8_LCASE").as("g"))
        .agg(min(col("nm")).as("rep"), count(lit(1)).as("n"))
        .select(col("rep"), col("n"))
        .orderBy("rep")
    }),

    // Collation-aware JOIN: the same UTF8_LCASE comparison flowing
    // through the join machinery — a case-mangled nation list
    // equi-joins the lowercased original ON collated equality, no
    // lower() normalization column anywhere. Output keys are the
    // original (binary) spellings from both sides, so nothing
    // collated reaches the hash gate. The oracle joins on lower() —
    // same row pairing, different mechanism.
    "fn_collation_join" -> ((s, dir) => {
      val cap1 = concat(upper(substring(lower(col("n_name")), 1, 1)),
        substring(lower(col("n_name")), 2, 1000000))
      val mangled = when(col("n_nationkey") % 2 === 0, upper(col("n_name")))
        .otherwise(cap1)
      val a = Tables.nation(s, dir)
        .select(col("n_nationkey").as("key_a"), mangled.as("nm_a"))
      val b = Tables.nation(s, dir)
        .select(col("n_nationkey").as("key_b"), lower(col("n_name")).as("nm_b"))
      a.join(b,
          collate(col("nm_a"), "UTF8_LCASE") === collate(col("nm_b"), "UTF8_LCASE"))
        .select(col("key_a"), col("nm_a"), col("key_b"), col("nm_b"))
        .orderBy("key_a", "key_b")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "sql_pipe" ->
      """SELECT c_mktsegment,
        |       COUNT(*) AS n_orders,
        |       ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE), 2) AS sum_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE o_orderstatus = 'F'
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,

    "fn_collation_join" ->
      """WITH m AS (
        |  SELECT n_nationkey,
        |    CASE WHEN n_nationkey % 2 = 0 THEN upper(n_name)
        |         ELSE upper(substring(lower(n_name), 1, 1)) || substring(lower(n_name), 2) END AS nm
        |  FROM nation),
        |a AS (SELECT n_nationkey AS key_a, nm AS nm_a FROM m),
        |b AS (SELECT n_nationkey AS key_b, lower(n_name) AS nm_b FROM nation)
        |SELECT key_a, nm_a, key_b, nm_b
        |FROM a JOIN b ON lower(nm_a) = lower(nm_b)
        |ORDER BY key_a, key_b""".stripMargin,

    "fn_collation" ->
      """WITH m AS (
        |  SELECT n_nationkey,
        |    CASE WHEN n_nationkey % 2 = 0 THEN upper(n_name)
        |         ELSE upper(substring(lower(n_name), 1, 1)) || substring(lower(n_name), 2) END AS nm
        |  FROM nation),
        |two AS (
        |  SELECT n_nationkey, nm FROM m
        |  UNION ALL SELECT n_nationkey + 100, lower(nm) FROM m)
        |SELECT MIN(nm) AS rep, COUNT(*) AS n
        |FROM two GROUP BY lower(nm) ORDER BY rep""".stripMargin
  )
}
