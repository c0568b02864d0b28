package graft.llm

import graft.{QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** The end-to-end training-data curation pipeline (north star): quality
  * filter → exact dedup → near-dup drop, composed from the verified
  * building blocks. This is the query a 100 TB pre-training data run
  * executes: each stage is shuffle-bounded (quality is a map-only
  * filter; exact dedup one hash shuffle; near-dup the df-pruned
  * postings join), and each stage shrinks the data for the next.
  */
object Curate extends QueryPack {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipeline_curate" -> ((s, dir) => {
      // 1. quality gate
      val scored = Tables.documents(s, dir)
        .withColumn("quality", Text.qualityScore(col("text")))
        .where(col("quality") >= 0.75)
      // 2. exact dedup: keep the lowest doc_id per content hash
      val exact = scored
        .withColumn("rn", row_number().over(
          Window.partitionBy(sha2(col("text"), 256)).orderBy(col("doc_id"))))
        .where(col("rn") === 1).drop("rn")
      // 3. near-dup drop: the higher doc_id of each trigram-Jaccard pair
      val drops = Dedup.ngramJaccardPairs(exact.select("doc_id", "text"), 0.5)
        .select(col("id_b").as("doc_id")).distinct()
      exact.join(drops, Seq("doc_id"), "left_anti")
        .select(col("doc_id"), col("lang"), col("source"), col("quality"))
        .orderBy("doc_id")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "pipeline_curate" ->
      s"""WITH q AS (
         |  SELECT doc_id, lang, source, text, ${Text.qualityScoreD} AS quality
         |  FROM documents),
         |f AS (SELECT * FROM q WHERE quality >= 0.75),
         |ex AS (SELECT * FROM f
         |       QUALIFY row_number() OVER (PARTITION BY sha256(text) ORDER BY doc_id) = 1),
         |t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
         |             generate_subscripts(string_split(text, ' '), 1) AS pos
         |      FROM ex),
         |tg AS (SELECT DISTINCT doc_id,
         |         tok || ' ' || lead(tok) OVER w || ' ' || lead(tok, 2) OVER w AS ng
         |       FROM t WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
         |       QUALIFY lead(tok, 2) OVER w IS NOT NULL),
         |pruned AS (SELECT tg.doc_id, tg.ng FROM tg
         |           JOIN (SELECT ng, count(*) AS dfreq FROM tg GROUP BY ng) d USING (ng)
         |           WHERE dfreq <= 20),
         |sizes AS (SELECT doc_id, count(*) AS n FROM pruned GROUP BY doc_id),
         |pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
         |          FROM pruned a JOIN pruned b ON a.ng = b.ng AND a.doc_id < b.doc_id
         |          GROUP BY 1, 2),
         |drops AS (SELECT DISTINCT id_b AS doc_id FROM pairs
         |          JOIN sizes sa ON sa.doc_id = id_a
         |          JOIN sizes sb ON sb.doc_id = id_b
         |          WHERE CAST(shared AS DOUBLE) / (sa.n + sb.n - shared) >= 0.5)
         |SELECT ex.doc_id, lang, source, quality
         |FROM ex LEFT JOIN drops ON ex.doc_id = drops.doc_id
         |WHERE drops.doc_id IS NULL
         |ORDER BY ex.doc_id""".stripMargin
  )
}
