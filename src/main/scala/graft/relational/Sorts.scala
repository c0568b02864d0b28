package graft.relational

import graft.{QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sorts, limits, top-k (SURVEY.md §2.7). `orderBy(...).limit(k)` plans
  * as TakeOrderedAndProject — each partition keeps only its local top-k
  * and the driver merges k·p rows, so a global top-100 over 100 TB never
  * materializes a full sort.
  */
object Sorts extends QueryPack {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sort_multi" -> ((s, dir) =>
      Tables.orders(s, dir)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .orderBy(col("o_orderstatus").asc, col("o_totalprice").desc,
          col("o_orderkey").asc)),

    "topk_global" -> ((s, dir) =>
      Tables.orders(s, dir)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(100)),

    "limit_offset" -> ((s, dir) =>
      Tables.orders(s, dir)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .offset(100).limit(50))
  )

  val oracleSql: Map[String, String] = Map(
    "sort_multi" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |ORDER BY o_orderstatus ASC, o_totalprice DESC, o_orderkey ASC""".stripMargin,

    "topk_global" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100""".stripMargin,

    "limit_offset" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 50 OFFSET 100""".stripMargin
  )
}
