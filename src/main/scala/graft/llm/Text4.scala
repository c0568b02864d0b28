package graft.llm

import graft.{QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-8 text-analysis batch: the two remaining Gopher-family corpus
  * signals (repetition, vocabulary concentration).
  *
  *  - repetition report (`text_repetition`) — per-document repetition
  *    signals in the Gopher §A.1.1 family: the fraction of bigram
  *    instances consumed by the single most frequent bigram
  *    (`top_bigram_frac`) and the fraction of trigram instances whose
  *    trigram occurs more than once in the document
  *    (`dup_trigram_frac`). Highly repetitive machine-generated text
  *    scores near 1 on both; a curation pipeline thresholds these
  *    before training. Shape: one posexplode + two lead()s inside a
  *    per-document window, then per-(doc, gram) counts with map-side
  *    combine — every shuffle is keyed by doc_id, per-doc work is
  *    bounded by document length, nothing is corpus-global.
  *  - dataset card (`pipeline_dataset_card`) — the per-source corpus
  *    summary a training-data run publishes: docs, tokens, token share
  *    of the corpus, language count + entropy, mean quality, exact-dup
  *    rate, mean length. Composes the SHARED definitions (qualityScore,
  *    the sha256 exact-dup identity, the agg_entropy formula) so the
  *    card can never disagree with the pipeline stages it describes.
  *    Shape: token counts / hashes / quality are map-side per-doc
  *    expressions (no explode — size(split)), then two source-keyed
  *    two-phase aggregates + one (source, lang) aggregate + a 1-row
  *    corpus total broadcast back; sources are dimension-sized, so
  *    every post-reduction join is broadcast.
  *  - vocabulary coverage (`text_vocab_coverage`) — the top-100 corpus
  *    vocabulary with cumulative token-coverage fraction (the "how few
  *    types cover 90% of tokens" curve a tokenizer-budget decision
  *    reads). The corpus-wide token count is a two-phase aggregate;
  *    the rank/cumsum window then runs over the REDUCED vocabulary
  *    (Heaps-law bounded, ≪ corpus), not the token stream — the only
  *    single-partition step is vocabulary-sized by construction.
  */
object Text4 extends QueryPack {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_repetition" -> ((s, dir) => {
      val w = Window.partitionBy("doc_id").orderBy("pos")
      val g = Tables.documents(s, dir)
        .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "t1")))
        .withColumn("t2", lead(col("t1"), 1).over(w))
        .withColumn("t3", lead(col("t1"), 2).over(w))
      val bi = g.where(col("t2").isNotNull)
        .groupBy(col("doc_id"), concat_ws(" ", col("t1"), col("t2")).as("bg"))
        .agg(count(lit(1)).as("c"))
        .groupBy("doc_id")
        .agg(max(col("c")).as("topc"), sum(col("c")).as("totb"))
      val tri = g.where(col("t3").isNotNull)
        .groupBy(col("doc_id"), concat_ws(" ", col("t1"), col("t2"), col("t3")).as("tg"))
        .agg(count(lit(1)).as("c"))
        .groupBy("doc_id")
        .agg(sum(when(col("c") > 1, col("c")).otherwise(0)).as("dupt"),
          sum(col("c")).as("tott"))
      bi.join(tri, Seq("doc_id"))
        .select(col("doc_id"),
          round(col("topc").cast("double") / col("totb"), 6).as("top_bigram_frac"),
          round(col("dupt").cast("double") / col("tott"), 6).as("dup_trigram_frac"))
        .orderBy("doc_id")
    }),

    // Deterministic 90/5/5 train/val/test split by the shared md5
    // uniform of doc_id (content-independent — re-crawling a page can't
    // move it between splits), then the TRAIN side is decontaminated
    // against val∪test on shared 5-grams (the text_decontaminate
    // definition, reused verbatim): leaked docs are quarantined, not
    // silently dropped, so the output accounts for every input doc.
    // The eval-gram set is 10% of the corpus here but O(benchmark) in
    // production; the decontaminate join broadcasts it.
    "pipeline_split" -> ((s, dir) => {
      val lab = Tables.documents(s, dir)
        .withColumn("bkt", graft.relational.Extras3.md5Val(col("doc_id")) % 100)
        .withColumn("s0", when(col("bkt") < 90, "train")
          .when(col("bkt") < 95, "val").otherwise("test"))
      val clean = Text3.decontaminate(
          lab.where(col("s0") === "train"), lab.where(col("s0") =!= "train"))
        .select(col("doc_id"), lit(1).as("ok"))
      lab.join(clean, Seq("doc_id"), "left")
        .select(col("doc_id"),
          when(col("s0") =!= "train", col("s0"))
            .when(col("ok").isNotNull, lit("train"))
            .otherwise(lit("train_quarantined")).as("split"))
        .orderBy("doc_id")
    }),

    "pipeline_dataset_card" -> ((s, dir) => {
      val d = Tables.documents(s, dir).select(
        col("source"), col("lang"), col("n_chars"),
        size(split(col("text"), " ")).cast("long").as("n_tok"),
        sha2(col("text"), 256).as("h"),
        Text.qualityScore(col("text")).as("q"))
      val base = d.groupBy("source").agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("n_tokens"),
        countDistinct(col("h")).as("n_uniq"),
        graft.relational.Stable.davg(col("q"), 4).as("mean_quality"),
        graft.relational.Stable.davg(col("n_chars"), 2).as("mean_chars"))
      val lc = d.groupBy("source", "lang").agg(count(lit(1)).as("n"))
      val lt = lc.groupBy("source").agg(sum(col("n")).as("ltot"))
      val langs = lc.join(lt, Seq("source"))
        .withColumn("p", col("n").cast("double") / col("ltot"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_langs"),
          round(-sum((col("p") * log(col("p")))
            .cast(org.apache.spark.sql.types.DecimalType(28, 12)))
            .cast("double"), 6).as("lang_entropy"))
      val tot = d.agg(sum(col("n_tok")).as("corpus_tokens"))
      base.join(broadcast(langs), Seq("source"))
        .crossJoin(broadcast(tot))
        .select(col("source"), col("n_docs"), col("n_tokens"),
          round(col("n_tokens").cast("double") / col("corpus_tokens"), 6)
            .as("token_share"),
          col("n_langs"), col("lang_entropy"),
          col("mean_quality"), col("mean_chars"),
          round(lit(1.0) - col("n_uniq").cast("double") / col("n_docs"), 6)
            .as("dup_rate"))
        .orderBy("source")
    }),

    "text_vocab_coverage" -> ((s, dir) => {
      val counts = Tables.documents(s, dir)
        .select(explode(split(col("text"), " ")).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("cnt"))
      val tot = counts.agg(sum(col("cnt")).as("total"))
      // top-100 FIRST (TakeOrderedAndProject — map-side partial top-k,
      // never a full sort), THEN the rank/cumsum windows over exactly
      // those 100 rows. The old form ran both unpartitioned windows
      // over the whole reduced vocabulary before the rank ≤ 100
      // filter — Heaps-bounded but still O(vocab) through ONE task at
      // corpus scale (r14 VERDICT item 8). The running sum at rank
      // r only ever sees rows ranked ≤ r — all inside the top-100 —
      // so the pre-limit is exact; the limit's (cnt desc, tok) order
      // is the windows' total order (tok breaks ties), so the kept
      // row SET is identical.
      val w = Window.orderBy(col("cnt").desc, col("tok"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      counts.orderBy(col("cnt").desc, col("tok")).limit(100)
        .crossJoin(broadcast(tot))
        .withColumn("rank", row_number().over(Window.orderBy(col("cnt").desc, col("tok"))))
        .withColumn("cum", sum(col("cnt")).over(w))
        .select(col("rank"), col("tok"), col("cnt"),
          round(col("cum").cast("double") / col("total"), 6).as("coverage"))
        .orderBy("rank")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "text_repetition" ->
      """WITH t AS (
        |  SELECT doc_id, generate_subscripts(string_split(text, ' '), 1) AS pos,
        |         unnest(string_split(text, ' ')) AS t1
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, t1, lead(t1, 1) OVER w AS t2, lead(t1, 2) OVER w AS t3
        |  FROM t WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
        |bi AS (
        |  SELECT doc_id, MAX(c) AS topc, SUM(c) AS totb FROM (
        |    SELECT doc_id, t1 || ' ' || t2 AS bg, COUNT(*) AS c
        |    FROM g WHERE t2 IS NOT NULL GROUP BY 1, 2)
        |  GROUP BY 1),
        |tri AS (
        |  SELECT doc_id, SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS dupt,
        |         SUM(c) AS tott FROM (
        |    SELECT doc_id, t1 || ' ' || t2 || ' ' || t3 AS tg, COUNT(*) AS c
        |    FROM g WHERE t3 IS NOT NULL GROUP BY 1, 2)
        |  GROUP BY 1)
        |SELECT bi.doc_id,
        |  ROUND(CAST(topc AS DOUBLE) / totb, 6) AS top_bigram_frac,
        |  ROUND(CAST(dupt AS DOUBLE) / tott, 6) AS dup_trigram_frac
        |FROM bi JOIN tri ON bi.doc_id = tri.doc_id
        |ORDER BY bi.doc_id""".stripMargin,

    "pipeline_split" -> {
      val bkt = graft.relational.Extras3.md5ValD("doc_id") + " % 100"
      s"""WITH lab AS (
         |  SELECT doc_id, string_split(text, ' ') AS toks,
         |    CASE WHEN $bkt < 90 THEN 'train'
         |         WHEN $bkt < 95 THEN 'val' ELSE 'test' END AS s0
         |  FROM documents),
         |g AS (
         |  SELECT doc_id, array_to_string(toks[CAST(i AS INT):CAST(i+4 AS INT)], ' ') AS ng
         |  FROM lab, UNNEST(range(1, len(toks) - 3)) AS r(i)),
         |evalg AS (
         |  SELECT DISTINCT ng FROM g JOIN lab USING (doc_id) WHERE s0 <> 'train'),
         |cont AS (
         |  SELECT DISTINCT g.doc_id FROM g JOIN evalg USING (ng)
         |  JOIN lab USING (doc_id) WHERE s0 = 'train')
         |SELECT doc_id,
         |  CASE WHEN s0 <> 'train' THEN s0
         |       WHEN doc_id IN (SELECT doc_id FROM cont) THEN 'train_quarantined'
         |       ELSE 'train' END AS split
         |FROM lab ORDER BY doc_id""".stripMargin
    },

    "pipeline_dataset_card" ->
      s"""WITH d AS (
         |  SELECT source, lang, n_chars,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
         |    sha256(text) AS h,
         |    ${Text.qualityScoreD.replace("\n", "\n    ")} AS q
         |  FROM documents),
         |base AS (
         |  SELECT source, COUNT(*) AS n_docs,
         |    CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
         |    COUNT(DISTINCT h) AS n_uniq,
         |    ROUND(CAST(SUM(CAST(q AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*), 4)
         |      AS mean_quality,
         |    ROUND(CAST(SUM(CAST(n_chars AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*), 2)
         |      AS mean_chars
         |  FROM d GROUP BY 1),
         |lc AS (SELECT source, lang, COUNT(*) AS n FROM d GROUP BY 1, 2),
         |lt AS (SELECT source, SUM(n) AS ltot FROM lc GROUP BY 1),
         |langs AS (
         |  SELECT lc.source, COUNT(*) AS n_langs,
         |    ROUND(-CAST(SUM(CAST((CAST(n AS DOUBLE) / ltot) *
         |      ln(CAST(n AS DOUBLE) / ltot) AS DECIMAL(28,12))) AS DOUBLE), 6)
         |      AS lang_entropy
         |  FROM lc JOIN lt ON lc.source = lt.source GROUP BY 1),
         |tot AS (SELECT CAST(SUM(n_tok) AS BIGINT) AS corpus_tokens FROM d)
         |SELECT base.source, n_docs, n_tokens,
         |  ROUND(CAST(n_tokens AS DOUBLE) / corpus_tokens, 6) AS token_share,
         |  n_langs, lang_entropy, mean_quality, mean_chars,
         |  ROUND(1.0 - CAST(n_uniq AS DOUBLE) / n_docs, 6) AS dup_rate
         |FROM base JOIN langs ON base.source = langs.source, tot
         |ORDER BY base.source""".stripMargin,

    "text_vocab_coverage" ->
      """WITH c AS (
        |  SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
        |counts AS (SELECT tok, COUNT(*) AS cnt FROM c GROUP BY 1),
        |tot AS (SELECT SUM(cnt) AS total FROM counts),
        |r AS (
        |  SELECT tok, cnt,
        |    row_number() OVER (ORDER BY cnt DESC, tok) AS rank,
        |    SUM(cnt) OVER (ORDER BY cnt DESC, tok
        |      ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM counts)
        |SELECT CAST(rank AS INT) AS rank, tok, CAST(cnt AS BIGINT) AS cnt,
        |  ROUND(CAST(cum AS DOUBLE) / total, 6) AS coverage
        |FROM r, tot WHERE rank <= 100 ORDER BY rank""".stripMargin
  )
}
