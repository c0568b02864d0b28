package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Aggregates every QueryPack into the judged registries.
  */
object SparkEntry {
  private def packs: Seq[QueryPack] = Seq(
    relational.Aggs,
    relational.Filters,
    relational.Projections,
    relational.Joins,
    relational.Sets,
    relational.Sorts,
    relational.Windows,
    relational.Scalars,
    llm.Dedup,
    llm.Similarity,
    llm.Text,
    llm.Multimodal
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    relational.Aggs.aggGroup(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.iterator.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    packs.iterator.flatMap(_.oracleSql).toMap
}
