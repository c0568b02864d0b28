package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Aggregates every QueryPack into the judged registries.
  */
object SparkEntry {
  private def packs: Seq[QueryPack] = Seq(
    relational.Scans,
    relational.Aggs,
    relational.Filters,
    relational.Projections,
    relational.Joins,
    relational.Sets,
    relational.Sorts,
    relational.Windows,
    relational.Scalars,
    relational.Extras,
    relational.Extras2,
    relational.Extras3,
    relational.Extras4,
    relational.Extras5,
    relational.Extras6,
    relational.Extras7,
    relational.Extras8,
    relational.Extras9,
    relational.Extras10,
    relational.Extras11,
    relational.Extras12,
    relational.Storage,
    relational.Subqueries,
    llm.Cluster,
    llm.Dedup,
    llm.Incremental,
    llm.Embeddings,
    llm.Text2,
    llm.Text3,
    llm.Text4,
    llm.Similarity,
    llm.Text,
    llm.Multimodal,
    llm.Quantize,
    llm.Curate,
    streaming.Streams
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The batch form of the message-filter pipeline: selector → tri-state
    * route → broadcast enrich → 5-min windowed aggregation (SURVEY §7.3). */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    streaming.Pipeline
      .filterPipeline(Tables.events(spark, dir), Tables.customer(spark, dir))
      .orderBy("ws", "event_type")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.iterator.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    packs.iterator.flatMap(_.oracleSql).toMap
}
