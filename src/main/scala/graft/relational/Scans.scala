package graft.relational

import graft.{QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scan operators (SURVEY.md §2.1). scan_pruned exists to demonstrate
  * that projection + predicate reach the parquet reader (ReadSchema /
  * PushedFilters — asserted on the physical plan in PlanSpec): at 100 TB
  * the scan reads two columns of the row groups that survive min/max
  * pruning, not the table.
  */
object Scans extends QueryPack {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "scan_parquet" -> ((s, dir) =>
      Tables.lineitem(s, dir).agg(
        count(lit(1)).as("n_rows"),
        min(col("l_orderkey")).as("min_key"),
        max(col("l_orderkey")).as("max_key"))),

    "scan_pruned" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .select("l_orderkey", "l_quantity")
        .where(col("l_quantity") >= 45)
        .orderBy("l_orderkey", "l_quantity"))
  )

  val oracleSql: Map[String, String] = Map(
    "scan_parquet" ->
      """SELECT COUNT(*) AS n_rows, MIN(l_orderkey) AS min_key,
        |  MAX(l_orderkey) AS max_key FROM lineitem""".stripMargin,

    "scan_pruned" ->
      """SELECT l_orderkey, l_quantity FROM lineitem WHERE l_quantity >= 45
        |ORDER BY l_orderkey, l_quantity""".stripMargin
  )
}
