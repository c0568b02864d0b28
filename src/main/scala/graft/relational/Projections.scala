package graft.relational

import graft.{QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Projection operators (SURVEY.md §2.3). Column pruning means these
  * read only the projected columns from parquet (ReadSchema in the plan).
  */
object Projections extends QueryPack {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // subset + rename + computed column; per-row FP arithmetic is
    // bit-identical across engines so no rounding needed
    "project_select" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .select(
          col("l_orderkey"),
          col("l_linenumber").as("line_no"),
          col("l_quantity"),
          (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
        .orderBy("l_orderkey", "line_no")),

    "project_distinct" -> ((s, dir) =>
      Tables.orders(s, dir)
        .select("o_orderstatus", "o_orderpriority")
        .distinct()
        .orderBy("o_orderstatus", "o_orderpriority")),

    // build struct + map from flat columns, then read fields back out —
    // final output is flat scalars (hash-compare can't see nested types)
    "project_struct_map" -> ((s, dir) =>
      Tables.customer(s, dir)
        .select(
          struct(col("c_custkey").as("key"), col("c_name").as("name")).as("cust"),
          map(lit("segment"), col("c_mktsegment"), lit("name"), col("c_name")).as("m"),
          col("c_acctbal"))
        .select(
          col("cust.key").as("c_custkey"),
          col("cust.name").as("c_name"),
          element_at(col("m"), "segment").as("segment"),
          col("c_acctbal"))
        .orderBy("c_custkey"))
  )

  val oracleSql: Map[String, String] = Map(
    "project_select" ->
      """SELECT l_orderkey, l_linenumber AS line_no, l_quantity,
        |       l_extendedprice * (1.0 - l_discount) AS revenue
        |FROM lineitem ORDER BY l_orderkey, line_no""".stripMargin,

    "project_distinct" ->
      """SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
        |ORDER BY o_orderstatus, o_orderpriority""".stripMargin,

    "project_struct_map" ->
      """SELECT c_custkey, c_name, c_mktsegment AS segment, c_acctbal
        |FROM customer ORDER BY c_custkey""".stripMargin
  )
}
