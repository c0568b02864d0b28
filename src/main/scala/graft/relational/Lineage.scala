package graft.relational

import graft.{QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Column-level lineage extraction (round 8) — the third observability
  * primitive next to obs_metrics (same-pass aggregates) and
  * obs_join_skew (pre-flight key histogram): for every output column
  * of a query, which base-relation columns feed it. This is the data-
  * governance question ("which raw fields reach this report?") every
  * production deployment eventually has to answer, and the engine can
  * answer it from the ANALYZED logical plan — no execution, no data
  * access, O(plan) driver work.
  *
  * Mechanics: one bottom-up pass over the analyzed plan building
  * attribute → {source table.column} sets. Leaves (parquet relations)
  * seed their output attributes with the file's table name; nodes that
  * mint attributes (Project/Aggregate/Window/Generate) union the
  * lineage of each named expression's references; everything else
  * (Filter/Join/Sort/...) passes attributes through unchanged — data
  * lineage, deliberately not control lineage (a filter's predicate
  * columns shape WHICH rows flow, not what a column IS; predicate
  * provenance is obs_metrics/dq territory). An aggregate with no
  * column references (count(*)) has no source column and reports the
  * explicit marker '(none)' rather than silently vanishing.
  *
  * The key reports the lineage of the engine's own flagship pipeline
  * (selector route → broadcast enrich → windowed agg); the oracle pins
  * the answer as a literal table — the CONTRACT of the flagship's
  * provenance, so any plan refactor that changes where a column comes
  * from fails the driver gate loudly.
  */
object Lineage extends QueryPack {

  import org.apache.spark.sql.catalyst.expressions.{ExprId, Expression, NamedExpression}
  import org.apache.spark.sql.catalyst.plans.logical._
  import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

  /** (output column, source "table.column") pairs for `df`, sorted. */
  private[graft] def lineage(df: DataFrame): Seq[(String, String)] = {
    def walk(p: LogicalPlan): Map[ExprId, Set[String]] = {
      val merged = p.children.map(walk)
        .foldLeft(Map.empty[ExprId, Set[String]])(_ ++ _)
      def refs(e: Expression): Set[String] =
        e.references.toSeq.flatMap(a => merged.getOrElse(a.exprId, Set.empty[String])).toSet
      p match {
        case lr: LogicalRelation =>
          val table = lr.relation match {
            case h: HadoopFsRelation =>
              val base = h.location.rootPaths.head.getName
              base.stripSuffix(".parquet")
            case _ => "relation"
          }
          lr.output.map(a => a.exprId -> Set(s"$table.${a.name}")).toMap
        case Project(list, _) =>
          merged ++ list.map(ne => ne.toAttribute.exprId -> refs(ne))
        case a: Aggregate =>
          merged ++ a.aggregateExpressions.map(ne => ne.toAttribute.exprId -> refs(ne))
        case w: Window =>
          merged ++ w.windowExpressions.map(ne => ne.toAttribute.exprId -> refs(ne))
        case g: Generate =>
          merged ++ g.generatorOutput.map(a => a.exprId -> refs(g.generator))
        case _ =>
          // pass-through nodes (Filter/Join/Sort/Limit/SubqueryAlias/…)
          // plus a generic net for any other attribute-minting node:
          // aliases appearing in this node's expressions that are not
          // child attributes
          val childOut = p.children.flatMap(_.output).map(_.exprId).toSet
          val minted = p.expressions.flatMap(_.collect {
            case ne: NamedExpression if !childOut.contains(ne.toAttribute.exprId) &&
              p.outputSet.contains(ne.toAttribute) => ne
          })
          merged ++ minted.map(ne => ne.toAttribute.exprId -> refs(ne))
      }
    }
    val analyzed = df.queryExecution.analyzed
    val m = walk(analyzed)
    analyzed.output.flatMap { a =>
      val srcs = m.getOrElse(a.exprId, Set.empty)
      if (srcs.isEmpty) Seq(a.name -> "(none)")
      else srcs.toSeq.sorted.map(a.name -> _)
    }.sortBy(identity)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "obs_lineage" -> ((s, dir) => {
      import s.implicits._
      val flagship = graft.streaming.Pipeline.filterPipeline(
        Tables.events(s, dir), Tables.customer(s, dir))
      lineage(flagship).toDF("out_col", "src_col")
        .orderBy("out_col", "src_col")
    })
  )

  val oracleSql: Map[String, String] = Map(
    // the flagship's provenance contract, spelled out: the windowed
    // keys come off the event timestamp, the measures off value /
    // nothing (count(*)), and no customer column survives to the
    // output (the enrich join only gates rows)
    "obs_lineage" ->
      """SELECT * FROM (VALUES
        |  ('event_type', 'events.event_type'),
        |  ('n', '(none)'),
        |  ('sum_value', 'events.value'),
        |  ('ws', 'events.ts')) AS t(out_col, src_col)
        |ORDER BY out_col, src_col""".stripMargin
  )
}
