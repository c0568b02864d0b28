package graft.relational

import graft.{QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Aggregation operators (SURVEY.md §2.5). Pure DataFrame API: Spark's
  * HashAggregateExec gives partial (map-side) + final aggregation for
  * free, so at 100 TB each group's traffic over the shuffle is one row
  * per map partition, not raw data.
  */
object Aggs extends QueryPack {

  /** TPC-H Q1 shape: the flagship grouped aggregation. */
  def aggGroup(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        Stable.dsum(col("l_quantity"), 2).as("sum_qty"),
        Stable.dsum(col("l_extendedprice"), 2).as("sum_base_price"),
        Stable.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4).as("sum_disc_price"),
        Stable.davg(col("l_quantity")).as("avg_qty"),
        Stable.davg(col("l_extendedprice")).as("avg_price"),
        Stable.davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "agg_group" -> aggGroup
  )

  val oracleSql: Map[String, String] = Map(
    "agg_group" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,4))) AS DOUBLE) AS sum_disc_price,
        |  ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*), 4) AS avg_qty,
        |  ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*), 4) AS avg_price,
        |  ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*), 4) AS avg_disc,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin
  )
}
