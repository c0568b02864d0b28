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
    relational.Extras13,
    relational.Extras14,
    relational.Extras15,
    relational.Lineage,
    relational.Quality,
    relational.Storage,
    relational.Subqueries,
    llm.Cluster,
    llm.Clustering,
    llm.Dedup,
    llm.Incremental,
    llm.Embeddings,
    llm.Text2,
    llm.Text3,
    llm.Text4,
    llm.Text5,
    llm.Similarity,
    llm.Retrieval,
    llm.Text,
    llm.Selection,
    llm.Multimodal,
    llm.Quantize,
    llm.Curate,
    streaming.Streams,
    streaming.Broker
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

  /** The ONLY keys allowed to omit an SQL oracle — probabilistic /
    * sketch / ANN / iterative-driver-loop operators whose outputs have
    * no SQL twin. Every member carries a named recall/error-bound test
    * (LlmSpec/ExtrasSpec/FunctionsSpec; streaming keys additionally
    * assert stream==batch in StreamSpec). ExtrasSpec asserts
    * queries = oracleSql ∪ THIS set exactly, so a new key cannot ship
    * ungated; tools/gen_key_index.py parses this list for SURVEY §2.13
    * (single source of truth). */
  val oracleExempt: Set[String] = Set(
    "agg_approx_distinct", "agg_approx_percentile", "agg_heavy_hitters",
    "agg_sketch_merge", "agg_sketch_persisted", "ann_query_bq",
    "ann_query_filtered", "ann_query_ivf",
    "ann_query_ivfpq", "ann_query_pq", "ann_query_range", "ann_query_rrf",
    "ann_query_topk",
    "dedup_edit_banded", "dedup_embed_lsh", "dedup_incr_edit_banded",
    "dedup_incr_embed",
    "dedup_near", "dedup_semantic_ann", "dedup_semantic_cells",
    "embed_cluster_drift", "embed_cluster_profile",
    "embed_label_purity_ann", "embed_pca_power",
    "embed_pq", "pipeline_curate_incr_stream", "pipeline_curate_incr_v3",
    "sample_cluster_balanced",
    "sim_edge_histogram_ann", "sim_ivf_ann", "sim_knn_graph_ann",
    "sample_kcenter", "sim_lsh_ann", "sim_mmr_rerank",
    "text_bpe_compression", "text_bpe_drift", "text_bpe_train")
}
