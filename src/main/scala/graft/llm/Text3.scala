package graft.llm

import graft.{QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Benchmark decontamination — the training-pipeline step that removes
  * from the corpus every document sharing a 5-token n-gram with a held
  * evaluation set, so eval scores measure generalization rather than
  * memorization.
  *
  * Scale shape: the eval set is benchmarks — thousands of docs, i.e.
  * O(1) in corpus size — so its distinct 5-gram set is broadcast and the
  * corpus side stays a map-side semi-join probe followed by one distinct
  * on contaminated doc ids: no shuffle ever carries corpus n-grams. At
  * 100 TB the corpus pass is embarrassingly parallel; only the (tiny)
  * contaminated-id set and the eval grams move.
  */
object Text3 extends QueryPack {

  /** Distinct (doc_id, ng) 5-grams, map-side deduped (same discipline
    * as Dedup.trigrams — array_distinct before explode so the shuffle
    * never carries duplicate grams of a repetitive doc). */
  private[graft] def fivegrams(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), explode(array_distinct(
        filter(
          transform(col("toks"), (t, i) =>
            concat_ws(" ", t,
              try_element_at(col("toks"), i + 2),
              try_element_at(col("toks"), i + 3),
              try_element_at(col("toks"), i + 4),
              try_element_at(col("toks"), i + 5))),
          (_, i) => i < size(col("toks")) - 4))).as("ng"))

  /** Corpus docs minus every doc sharing a 5-gram with evalDocs.
    * evalDocs must be small relative to the corpus (it is broadcast). */
  private[graft] def decontaminate(corpus: DataFrame, evalDocs: DataFrame): DataFrame = {
    val evalGrams = fivegrams(evalDocs).select("ng").distinct()
    val contaminated = fivegrams(corpus)
      .join(broadcast(evalGrams), "ng")
      .select("doc_id").distinct()
    corpus.join(contaminated, Seq("doc_id"), "left_anti")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // eval set = doc_id % 97 == 0 AND doc_id < 100k (a deterministic
    // stand-in for "the benchmark suite"); the remaining corpus is
    // scrubbed of any doc overlapping it on a 5-gram. The fixed id
    // bound keeps the eval set — and therefore the broadcast gram set —
    // O(1) in corpus size (a real benchmark suite does not grow with
    // the crawl); every fixture doc_id is < 100k, so fixture results
    // are unchanged.
    "text_decontaminate" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val isEval = col("doc_id") % 97 === 0 && col("doc_id") < 100000L
      val eval = docs.where(isEval)
      val corpus = docs.where(!isEval)
      Text3.decontaminate(corpus, eval)
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
        .orderBy("doc_id")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "text_decontaminate" ->
      """WITH d AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |g AS (
        |  SELECT doc_id, array_to_string(toks[CAST(i AS INT):CAST(i+4 AS INT)], ' ') AS ng
        |  FROM d, UNNEST(range(1, len(toks) - 3)) AS r(i)),
        |contaminated AS (
        |  SELECT DISTINCT g.doc_id
        |  FROM g JOIN (SELECT DISTINCT ng FROM g
        |               WHERE doc_id % 97 = 0 AND doc_id < 100000) e USING (ng)
        |  WHERE NOT (g.doc_id % 97 = 0 AND g.doc_id < 100000))
        |SELECT doc_id, lang, source, n_chars FROM documents
        |WHERE NOT (doc_id % 97 = 0 AND doc_id < 100000)
        |  AND doc_id NOT IN (SELECT doc_id FROM contaminated)
        |ORDER BY doc_id""".stripMargin
  )
}
