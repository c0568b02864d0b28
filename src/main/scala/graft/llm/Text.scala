package graft.llm

import graft.{QueryPack, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Text-analysis operators for a training-data pipeline (SURVEY.md §2.11
  * + north star): token/BPE-ish counting, n-gram stats, closed-form
  * TF-IDF, corpus stats, language-ID heuristic, quality scoring, and
  * positional rolling-hash fingerprinting. All pure built-in expressions
  * (codegen) over `split(text, ' ')` — fixture text is pre-normalized
  * (FIXTURES.md), so no punctuation pipeline is needed here; at 100 TB
  * the same plans apply after a normalization pass.
  */
object Text extends QueryPack {

  /** Portable token hash: first 8 md5 hex digits as a base-16 number
    * (Spark: one conv call; DuckDB twin expands digit-by-digit). Shared
    * with the data-selection keys (Selection.scala) and the Key_Shared
    * router, which hash over other expressions — hence the
    * parameterized DuckDB form. */
  private[graft] def tokHashS(tok: Column): Column =
    conv(substring(md5(tok), 1, 8), 16, 10).cast("long")

  /** DuckDB twin over an arbitrary SQL expression `e`. */
  private[graft] def tokHashDOn(e: String): String =
    (0 until 8).map(d =>
      s"(instr('0123456789abcdef', substring(md5($e), ${d + 1}, 1)) - 1) * ${1L << (4 * (7 - d))}")
      .mkString("(", " + ", ")")

  private val tokHashD: String = tokHashDOn("tok")

  /** The threshold grid the quality curve sweeps — ONE Seq, consumed
    * by the Spark key's conditional aggregates and interpolated into
    * the twin's VALUES list (the subFractions discipline: a grid edit
    * can never compile clean yet fail only at the hash gate). */
  private val qualityTaus = Seq(0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9)
  private val qualityTausD: String =
    qualityTaus.map(t => s"($t)").mkString(", ")

  /** The composite quality score (see text_quality for the dyadic/epsilon
    * rationale). Shared with the curation pipeline. */
  private[llm] def qualityScore(text: Column): Column = {
    val toks = split(text, " ")
    val nTok = size(toks).cast("double")
    val stopRatio = size(filter(toks,
      t => t === "the" || t === "and" || t === "a" || t === "of")).cast("double") / nTok
    val avgWordLen = (length(text) - (nTok - 1)) / nTok
    round(lit(0.25) * least(nTok / 64.0, lit(1.0))
      + lit(0.5) * (lit(1.0) - stopRatio)
      + lit(0.25) * least(avgWordLen / 8.0, lit(1.0)) + lit(1e-9), 4)
  }

  /** DuckDB twin of qualityScore over a column named `text`. */
  private[llm] val qualityScoreD: String =
    """ROUND(CAST(0.25 AS DOUBLE) * least(CAST(len(string_split(text, ' ')) AS DOUBLE) / 64.0, 1.0)
      |    + CAST(0.5 AS DOUBLE) * (1.0 - CAST(len(list_filter(string_split(text, ' '),
      |          x -> x IN ('the', 'and', 'a', 'of'))) AS DOUBLE)
      |        / CAST(len(string_split(text, ' ')) AS DOUBLE))
      |    + CAST(0.25 AS DOUBLE) * least((CAST(length(text) AS DOUBLE)
      |        - (CAST(len(string_split(text, ' ')) AS DOUBLE) - 1))
      |        / CAST(len(string_split(text, ' ')) AS DOUBLE) / 8.0, 1.0)
      |    + 0.000000001, 4)""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // whitespace token count, BPE-ish subword count (ceil(len/4) units
    // per token), distinct token count
    "text_tokens" -> ((s, dir) => {
      val toks = split(col("text"), " ")
      Tables.documents(s, dir).select(
        col("doc_id"),
        size(toks).cast("long").as("n_tokens"),
        aggregate(transform(toks, t => ceil(length(t) / 4.0)), lit(0L),
          (acc, v) => acc + v).as("n_bpe"),
        size(array_distinct(toks)).cast("long").as("n_uniq"))
        .orderBy("doc_id")
    }),

    // global bigram frequency top-20
    "text_ngrams" -> ((s, dir) => {
      val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      Tables.documents(s, dir)
        .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
        .withColumn("nxt", lead(col("tok"), 1).over(w))
        .where(col("nxt").isNotNull)
        .withColumn("ng", concat_ws(" ", col("tok"), col("nxt")))
        .groupBy("ng").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("ng"))
        .limit(20)
    }),

    // closed-form TF-IDF, top-5 terms per doc (explicit formula — a
    // hashed HashingTF wouldn't be oracle-able)
    "text_tfidf" -> ((s, dir) => {
      val toks = Tables.documents(s, dir)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      val n = Tables.rowCount(s, dir, "documents") // corpus size: scalar, driver-side once
      val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      val df = toks.select("doc_id", "term").distinct()
        .groupBy("term").agg(count(lit(1)).as("dfreq"))
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("tfidf").desc, col("term"))
      tf.join(df, Seq("term"))
        .withColumn("tfidf",
          col("tf") * (log((lit(n) + 1.0) / (col("dfreq") + 1.0)) + 1.0))
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= 5)
        .select(col("doc_id"), col("rn"), col("term"), round(col("tfidf"), 4).as("score"))
        .orderBy("doc_id", "rn")
    }),

    // per-(lang, source) corpus stats incl. vocabulary size. Doc-level
    // stats aggregate BEFORE the token explode (summing n_chars after
    // the explode counts each doc once per token — token-weighted, not
    // per-doc; ADVICE r01), then join the vocab count per group.
    "text_lang_stats" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val docStats = docs.groupBy("lang", "source")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
      val vocab = docs
        .select(col("lang"), col("source"), explode(split(col("text"), " ")).as("tok"))
        .groupBy("lang", "source")
        .agg(countDistinct(col("tok")).as("vocab"))
      docStats.join(vocab, Seq("lang", "source"))
        .select(col("lang"), col("source"), col("n_docs"),
          round(col("sum_chars").cast("double") / col("n_docs"), 4).as("avg_chars"),
          col("vocab"))
        .orderBy("lang", "source")
    }),

    // language-ID heuristic: diacritic/script markers, else 'en'.
    // Honest plumbing — fixture text is ASCII so the interesting branches
    // only fire on real multilingual data.
    "text_langid" -> ((s, dir) =>
      Tables.documents(s, dir).select(
        col("doc_id"), col("lang"),
        when(col("text").rlike("[äöüß]"), "de")
          .when(col("text").rlike("[áéíóúñ¿¡]"), "es")
          .when(col("text").rlike("[àèêëçœ]"), "fr")
          .when(col("text").rlike("[一-鿿]"), "zh")
          .otherwise("en").as("guess"),
        round((length(col("text")) -
          length(regexp_replace(col("text"), "[aeiou]", ""))).cast("double") /
          length(col("text")), 4).as("vowel_ratio"))
        .orderBy("doc_id")),

    // quality scoring: length, stopword ratio, mean word length.
    // Weights and denominators are dyadic (0.25/0.5, /64, /8) so both
    // engines compute the bit-identical composite double. The formula's
    // rationals still land mathematically ON round-4 .xxxx5 boundaries
    // (e.g. 0.83125), where Spark's exact BigDecimal HALF_UP and
    // DuckDB's epsilon-compensated double round disagree — so both
    // sides nudge by +1e-9 before rounding, deterministically breaking
    // every boundary upward (caught at sf0.001 and again at sf0.1).
    "text_quality" -> ((s, dir) => {
      val toks = split(col("text"), " ")
      val nTok = size(toks).cast("double")
      val stopRatio = size(filter(toks,
        t => t === "the" || t === "and" || t === "a" || t === "of")).cast("double") / nTok
      val avgWordLen = (length(col("text")) - (nTok - 1)) / nTok
      Tables.documents(s, dir).select(
        col("doc_id"),
        nTok.cast("long").as("n_tok"),
        round(stopRatio, 4).as("stop_ratio"),
        round(avgWordLen, 4).as("avg_word_len"),
        qualityScore(col("text")).as("quality"))
        .orderBy("doc_id")
    }),

    // quality-filter aggressiveness curve — the quality twin of
    // dedup_retention_curve: survivors (docs AND tokens) per threshold
    // τ over the grid a filter owner actually sweeps. ONE scan, 14
    // conditional aggregates (2 per τ) folding to a single row, then a
    // 7-row literal reshape — no grid fan-out at all (VERDICT r11: the
    // previous 7× crossJoin expansion scaled linearly but re-scored
    // every row per τ; the conditional-sum form reads each row once).
    // The token column is the decision-relevant one: a threshold that
    // keeps 80 % of docs can still drop 40 % of tokens if it culls the
    // long tail.
    "quality_threshold_curve" -> ((s, dir) => {
      val scored = Tables.documents(s, dir)
        .select(qualityScore(col("text")).as("q"),
          size(split(col("text"), " ")).cast("long").as("n_tok"))
      val aggs = count(lit(1)).as("nr") +:
        qualityTaus.zipWithIndex.flatMap { case (t, i) => Seq(
          sum(when(col("q") >= t, 1L).otherwise(0L)).as(s"d$i"),
          coalesce(sum(when(col("q") >= t, col("n_tok"))), lit(0L))
            .as(s"t$i")) }
      scored.agg(aggs.head, aggs.tail: _*)
        // empty corpus: the global agg still yields one row, but the
        // twin's `FROM d, g GROUP BY 1` yields zero — gate on nr so
        // both engines agree on the degenerate fixture (the slope_den
        // lesson, applied here)
        .where(col("nr") > 0)
        .select(explode(array(qualityTaus.zipWithIndex.map { case (t, i) =>
          struct(lit(t).as("tau"), col(s"d$i").as("n_docs"),
            col(s"t$i").as("n_tokens")) }: _*)).as("r"))
        .select(col("r.tau").as("tau"), col("r.n_docs").as("n_docs"),
          col("r.n_tokens").as("n_tokens"))
        .orderBy("tau")
    }),

    // training-data chunking: overlapping character windows (size 200,
    // stride 150) with per-chunk token counts — the layout step that
    // turns documents into model-sized training rows. Pure plan-side
    // arithmetic (sequence + dynamic-offset substring), so it
    // parallelizes per document with no UDF.
    "text_chunking" -> ((s, dir) =>
      Tables.documents(s, dir)
        .withColumn("n_chunks",
          greatest(ceil((length(col("text")) - 50) / 150.0), lit(1.0)).cast("long"))
        .withColumn("chunk_no", explode(
          sequence(lit(0L), col("n_chunks") - 1, lit(1L))))
        .select(col("doc_id"), col("chunk_no"),
          expr("substring(text, cast(chunk_no*150+1 as int), 200)").as("chunk"))
        .select(col("doc_id"), col("chunk_no"),
          length(col("chunk")).cast("long").as("chunk_len"),
          size(split(col("chunk"), " ")).cast("long").as("n_toks"),
          md5(col("chunk")).as("chunk_hash"))
        .orderBy("doc_id", "chunk_no")),

    // positional rolling-hash document fingerprint (modular arithmetic,
    // md5-derived token hashes — engine-portable). Each term reduces
    // mod p BEFORE the sum: tokHash(<2^32) × w(<2^20) is ~2^52 per
    // term, so an unreduced LongType sum overflows past ~2k tokens
    // while DuckDB's HUGEINT sum stays exact (ADVICE r01); the reduced
    // terms are < 2^30, giving 2^33 headroom in the accumulator.
    "text_fingerprint" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
        .withColumn("w", (col("pos") + 1) * 2654435761L % 1000003L)
        .groupBy("doc_id")
        .agg((sum(tokHashS(col("tok")) * col("w") % 1000000007L) % 1000000007L)
          .as("fingerprint"))
        .orderBy("doc_id"))
  )

  val oracleSql: Map[String, String] = Map(
    "text_tokens" ->
      """SELECT doc_id,
        |  len(string_split(text, ' ')) AS n_tokens,
        |  CAST(list_sum(list_transform(string_split(text, ' '),
        |           x -> CAST(ceil(length(x) / 4.0) AS BIGINT))) AS BIGINT) AS n_bpe,
        |  len(list_distinct(string_split(text, ' '))) AS n_uniq
        |FROM documents ORDER BY doc_id""".stripMargin,

    "text_ngrams" ->
      """WITH t AS (
        |  SELECT doc_id, generate_subscripts(string_split(text,' '),1) AS pos,
        |         unnest(string_split(text,' ')) AS tok
        |  FROM documents),
        |ng AS (
        |  SELECT doc_id, tok || ' ' || lead(tok) OVER w AS ng
        |  FROM t WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
        |  QUALIFY lead(tok) OVER w IS NOT NULL)
        |SELECT ng, COUNT(*) AS cnt FROM ng GROUP BY ng
        |ORDER BY cnt DESC, ng LIMIT 20""".stripMargin,

    "text_tfidf" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        |n AS (SELECT COUNT(*) AS n FROM documents),
        |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
        |df AS (SELECT term, COUNT(*) AS dfreq
        |       FROM (SELECT DISTINCT doc_id, term FROM toks) GROUP BY term),
        |scored AS (
        |  SELECT tf.doc_id, tf.term,
        |         tf.tf * (ln((n.n + 1.0) / (df.dfreq + 1.0)) + 1.0) AS tfidf
        |  FROM tf JOIN df USING (term) CROSS JOIN n)
        |SELECT doc_id,
        |       row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rn,
        |       term, ROUND(tfidf, 4) AS score
        |FROM scored QUALIFY rn <= 5 ORDER BY doc_id, rn""".stripMargin,

    "text_lang_stats" ->
      """WITH ds AS (
        |  SELECT lang, source, COUNT(*) AS n_docs, SUM(n_chars) AS sum_chars
        |  FROM documents GROUP BY lang, source),
        |v AS (
        |  SELECT lang, source, COUNT(DISTINCT tok) AS vocab
        |  FROM (SELECT lang, source, unnest(string_split(text, ' ')) AS tok
        |        FROM documents)
        |  GROUP BY lang, source)
        |SELECT lang, source, n_docs,
        |  ROUND(CAST(sum_chars AS DOUBLE) / n_docs, 4) AS avg_chars, vocab
        |FROM ds JOIN v USING (lang, source)
        |ORDER BY lang, source""".stripMargin,

    "text_langid" ->
      """SELECT doc_id, lang,
        |  CASE WHEN regexp_matches(text, '[äöüß]') THEN 'de'
        |       WHEN regexp_matches(text, '[áéíóúñ¿¡]') THEN 'es'
        |       WHEN regexp_matches(text, '[àèêëçœ]') THEN 'fr'
        |       WHEN regexp_matches(text, '[一-鿿]') THEN 'zh'
        |       ELSE 'en' END AS guess,
        |  ROUND(CAST(length(text) - length(regexp_replace(text, '[aeiou]', '', 'g'))
        |        AS DOUBLE) / length(text), 4) AS vowel_ratio
        |FROM documents ORDER BY doc_id""".stripMargin,

    "quality_threshold_curve" ->
      s"""WITH d AS (
         |  SELECT $qualityScoreD AS q,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
         |  FROM documents),
         |g AS (SELECT CAST(tau AS DOUBLE) AS tau
         |      FROM (VALUES $qualityTausD) t(tau))
         |SELECT tau,
         |  CAST(SUM(CASE WHEN q >= tau THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_docs,
         |  CAST(coalesce(SUM(CASE WHEN q >= tau THEN n_tok END), 0)
         |    AS BIGINT) AS n_tokens
         |FROM d, g GROUP BY 1 ORDER BY tau""".stripMargin,

    "text_quality" ->
      """WITH q AS (
        |  SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS DOUBLE) AS n_tok,
        |    CAST(len(list_filter(string_split(text, ' '),
        |         x -> x IN ('the', 'and', 'a', 'of'))) AS DOUBLE) AS n_stop,
        |    CAST(length(text) AS DOUBLE) AS n_chars
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(n_tok AS BIGINT) AS n_tok,
        |  ROUND(n_stop / n_tok, 4) AS stop_ratio,
        |  ROUND((n_chars - (n_tok - 1)) / n_tok, 4) AS avg_word_len,
        |  ROUND(CAST(0.25 AS DOUBLE) * least(n_tok / 64.0, 1.0)
        |      + CAST(0.5 AS DOUBLE) * (1.0 - n_stop / n_tok)
        |      + CAST(0.25 AS DOUBLE) * least((n_chars - (n_tok - 1)) / n_tok / 8.0, 1.0)
        |      + 0.000000001, 4) AS quality
        |FROM q ORDER BY doc_id""".stripMargin,

    "text_chunking" ->
      """WITH d AS (
        |  SELECT doc_id, text,
        |    CAST(greatest(ceil((length(text) - 50) / 150.0), 1.0) AS BIGINT) AS n_chunks
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, text,
        |    unnest(generate_series(0, n_chunks - 1, 1)) AS chunk_no
        |  FROM d),
        |x AS (
        |  SELECT doc_id, chunk_no,
        |    substring(text, CAST(chunk_no * 150 + 1 AS BIGINT), 200) AS chunk
        |  FROM c)
        |SELECT doc_id, chunk_no,
        |  CAST(length(chunk) AS BIGINT) AS chunk_len,
        |  CAST(len(string_split(chunk, ' ')) AS BIGINT) AS n_toks,
        |  md5(chunk) AS chunk_hash
        |FROM x ORDER BY doc_id, chunk_no""".stripMargin,

    "text_fingerprint" ->
      s"""WITH t AS (
         |  SELECT doc_id, generate_subscripts(string_split(text,' '),1) AS pos,
         |         unnest(string_split(text,' ')) AS tok
         |  FROM documents)
         |SELECT doc_id,
         |  CAST(SUM(($tokHashD * ((pos * 2654435761) % 1000003)) % 1000000007) % 1000000007 AS BIGINT) AS fingerprint
         |FROM t GROUP BY doc_id ORDER BY doc_id""".stripMargin
  )
}
