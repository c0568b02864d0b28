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
    // the gram join runs on 128-bit hashes, not ~50-char strings (the
    // dupWins argument — results identical barring a 2^-128 collision,
    // and the 3-SF oracle gate re-checks): the corpus side explodes to
    // tens of grams per doc, so collapsing each gram to two longs
    // before the distinct/broadcast-probe is where the bytes are
    // (measured at 100×/500 k docs: text_decontaminate 12.1 s warm;
    // with the funnel's head fold the composite dropped 24.7 → 15.4 s)
    def hashed(df: DataFrame): DataFrame = fivegrams(df)
      .select(col("doc_id"), xxhash64(lit(0), col("ng")).as("k1"),
        xxhash64(lit(1), col("ng")).as("k2"))
    val evalGrams = hashed(evalDocs).select("k1", "k2").distinct()
    val contaminated = hashed(corpus)
      .join(broadcast(evalGrams), Seq("k1", "k2"))
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
    }),

    // Unigram language-model quality scoring — the KenLM-perplexity
    // filter of a crawl pipeline, reduced to its oracle-able core: the
    // corpus's own unigram distribution is the model, and each doc is
    // scored by its mean negative log-likelihood (high avg_nll = the
    // doc is full of tokens the corpus finds improbable — gibberish or
    // off-distribution). Two shuffles: token-frequency aggregate, then
    // tokens ⋈ frequencies re-grouped per doc; the scalar corpus total
    // rides a 1-row broadcast. Per-token nll is rounded before the
    // decimal-exact mean, so accumulation order can't leak into the
    // hash gate (Stable.davg discipline).
    "text_unigram_logprob" -> ((s, dir) => {
      val toks = Tables.documents(s, dir)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      val tf = toks.groupBy("tok").agg(count(lit(1)).as("ctok"))
      val tot = toks.agg(count(lit(1)).as("ntot"))
      toks.join(tf, "tok").crossJoin(broadcast(tot))
        .select(col("doc_id"),
          round(lit(0.0) - log(col("ctok").cast("double") / col("ntot")), 6).as("nll"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_toks"),
          graft.relational.Stable.lavg6Prerounded(col("nll")).as("avg_nll"))
        .orderBy("doc_id")
    }),

    // Interpolated BIGRAM language-model scoring — the next rung of
    // the KenLM-perplexity ladder above text_unigram_logprob: each
    // transition is scored P(w₂|w₁) = 0.75·c(w₁w₂)/c(w₁) +
    // 0.25·c(w₂)/N (Jelinek-Mercer interpolation — on the self-trained
    // corpus every observed bigram has c ≥ 1, but the unigram backoff
    // is what makes the same model applicable to a DELTA corpus, the
    // dedup_incr_* pattern), per-doc mean nll over the bigram
    // positions. Bigrams are built MAP-SIDE from the token array (a
    // transform over sequence, no per-token window shuffle); the
    // count model is two token-keyed aggregates + one scoring join,
    // the same doc_id-keyed exchange discipline as the unigram key.
    // Per-transition nll rounds before the decimal-exact mean (davg).
    "text_bigram_logprob" -> ((s, dir) => {
      val base = Tables.documents(s, dir)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
      // size(toks) >= 2 guard (ADVICE r08): sequence(1, 0) is DESCENDING
      // [1, 0] for a 1-token doc, so toks[1] would be evaluated — an
      // INVALID_ARRAY_INDEX throw under ANSI mode. The filter matches
      // the oracle exactly (lead() IS NOT NULL emits zero bigram rows
      // for short docs) and the trainMerges/trigrams guard idiom.
      val bi = base.where(size(col("toks")) >= 2)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(1, size(toks) - 1), " +
          "i -> struct(toks[i-1] AS w1, toks[i] AS w2))")).as("bg"))
        .select(col("doc_id"), col("bg.w1"), col("bg.w2"))
      val toks = base.select(col("doc_id"),
        explode(col("toks")).as("tok"))
      val cb = bi.groupBy("w1", "w2").agg(count(lit(1)).as("cb"))
      val cu = toks.groupBy("tok").agg(count(lit(1)).as("cu"))
      val tot = toks.agg(count(lit(1)).as("ntot"))
      bi.join(cb, Seq("w1", "w2"))
        .join(cu.select(col("tok").as("w1"), col("cu").as("c1")), Seq("w1"))
        .join(cu.select(col("tok").as("w2"), col("cu").as("c2")), Seq("w2"))
        .crossJoin(broadcast(tot))
        .select(col("doc_id"),
          round(lit(0.0) - log(
            lit(0.75) * (col("cb").cast("double") / col("c1")) +
            lit(0.25) * (col("c2").cast("double") / col("ntot"))), 6).as("nll"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"),
          graft.relational.Stable.lavg6Prerounded(col("nll")).as("avg_nll"))
        .orderBy("doc_id")
    }),

    // Sub-document boilerplate scrub (the paragraph/line-dedup stage of
    // a crawl pipeline, expressed on the fixture's single-line docs as
    // fixed 8-token segments): a segment appearing in MORE than 3
    // distinct documents is boilerplate and is removed from every doc;
    // the doc is reassembled from its surviving segments in order.
    // Segmentation is one map-side transform over the token array (no
    // explode-then-window); reassembly sorts (seg_idx, seg_text)
    // structs inside the aggregate, so collect_list's arbitrary arrival
    // order can't leak into the output. The df count and drop-join key
    // on the segment TEXT to stay bit-identical with the oracle — at
    // the north-star scale the join key would be xxhash64(segment) (8
    // bytes through the shuffle instead of the string) with text
    // carried only for reassembly.
    "text_boilerplate_scrub" -> ((s, dir) => {
      val segs = Tables.documents(s, dir)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .select(col("doc_id"), posexplode(
          transform(
            sequence(lit(0), ceil(size(col("toks")) / 8.0).cast("int") - 1),
            i => concat_ws(" ", slice(col("toks"), i * 8 + 1, lit(8)))))
          .as(Seq("seg_idx", "seg_text")))
      val dfreq = segs.groupBy("seg_text")
        .agg(countDistinct(col("doc_id")).as("dfreq"))
      val kept = segs.join(dfreq, Seq("seg_text")).where(col("dfreq") <= 3)
      val clean = kept.groupBy("doc_id")
        .agg(count(lit(1)).as("n_kept"),
          concat_ws(" ", transform(
            array_sort(collect_list(struct(col("seg_idx"), col("seg_text")))),
            x => x.getField("seg_text"))).as("clean_text"))
      segs.groupBy("doc_id").agg(count(lit(1)).as("n_seg"))
        .join(clean, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_seg"),
          (col("n_seg") - coalesce(col("n_kept"), lit(0L))).as("n_dropped"),
          coalesce(col("clean_text"), lit("")).as("clean_text"))
        .orderBy("doc_id")
    }),

    // exact repeated-SPAN detection (the "exact substring dedup" signal
    // from the dedup literature): per doc, how many of its 10-token
    // rolling windows occur in ≥ 2 DISTINCT docs, and the longest
    // consecutive run of such windows — the span structure a span-level
    // scrubber would cut. Rolling windows are built map-side off the
    // token array; corpus document-frequency is one groupBy; runs are
    // gaps-and-islands over window start positions (pos − row_number).
    // Docs shorter than 10 tokens have no windows and no output row.
    // Scale posture: windows group by their 128-bit xxhash64 pair, so
    // the corpus-wide shuffles move 16 B keys, never the ~60 B window
    // strings (the ngramJaccardPairs lesson, A/B-measured again here —
    // BASELINE.md; results identical barring a 2^-128 collision, and
    // the string-keyed twin below exists for the A/B instrument).
    "text_dup_spans" -> ((s, dir) =>
      dupSpansReport(Tables.documents(s, dir),
        s.table(dupFlaggedTable(s, dir)))),

    // the detect→remedy pair completed (VERDICT r09 item 6, the
    // text_boilerplate_scrub precedent, Lee et al.-shaped span dedup):
    // every token covered by a ≥2-distinct-doc 10-token window is CUT
    // and the doc reassembled in order from the survivors. The flag
    // set is dupFlagged over the SAME dupWins frame the detector uses
    // (flag and cut cannot disagree); coverage expands each flagged
    // window to its 10 token positions map-side (a bounded sequence
    // explode), the cut is a doc_id+position anti join, and reassembly
    // is the boilerplate_scrub array_sort(collect_list(struct)) idiom
    // — deterministic under any arrival order. Every shuffle after the
    // 16-byte window-key census is doc_id-keyed. Docs shorter than 10
    // tokens have no windows, nothing flagged, and pass through whole.
    "text_dup_spans_scrub" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val covered = s.table(dupFlaggedTable(s, dir))
        .select(col("doc_id"),
          explode(sequence(col("pos"), col("pos") + 9)).as("tpos"))
        .distinct()
      val toks = docs
        .select(col("doc_id"), posexplode(split(col("text"), " "))
          .as(Seq("tpos", "tok")))
      val kept = toks.join(covered, Seq("doc_id", "tpos"), "left_anti")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_kept"),
          concat_ws(" ", transform(
            array_sort(collect_list(struct(col("tpos"), col("tok")))),
            x => x.getField("tok"))).as("clean_text"))
      docs.select(col("doc_id"), size(split(col("text"), " "))
          .cast("long").as("n_tokens"))
        .join(kept, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_tokens"),
          (col("n_tokens") - coalesce(col("n_kept"), lit(0L)))
            .as("n_scrubbed"),
          coalesce(col("clean_text"), lit("")).as("clean_text"))
        .orderBy("doc_id")
    }),

    // Maximal exact-substring dedup (the Lee et al. 2022 ExactSubstr
    // trainer-dedup shape — VERDICT r11 item 4): text_dup_spans fixes
    // the window at 10 tokens; the trainer wants maximal duplicated
    // runs of ANY length with their true TOKEN extent. A flagged
    // window at pos p covers tokens [p, p+9], so two flagged positions
    // belong to one span iff their coverage intervals overlap or abut
    // (next − prev ≤ 10) — NOT only when the positions are consecutive
    // (the r12 ADVICE finding: flagged {0..2} and {5,6} cover the
    // contiguous token run [0,15] and must be ONE span, not two).
    // Islands therefore break on gap > 10 (lag + running sum), and
    // each span [minPos, maxPos+9] is a maximal contiguous run of cut
    // tokens: the spans are pairwise disjoint, non-abutting, and their
    // union is EXACTLY the token set text_dup_spans_scrub cuts —
    // span_tokens sums to n_scrubbed by construction (pinned in
    // LlmSpec). trainer_cut marks spans the ExactSubstr cut rule
    // (≥ 50 tokens) would remove. One doc_id-keyed window over the
    // bucketed artifact (flagged positions ≪ corpus), nothing
    // corpus-sized.
    "text_exact_substr" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("doc_id").orderBy("pos")
      s.table(dupFlaggedTable(s, dir))
        .withColumn("brk",
          when(col("pos") - lag("pos", 1).over(w) > 10, 1).otherwise(0))
        .withColumn("grp", sum(col("brk")).over(w))
        .groupBy("doc_id", "grp")
        .agg(min(col("pos")).cast("long").as("span_start"),
          (max(col("pos")) + 9).cast("long").as("span_end"))
        .select(col("doc_id"), col("span_start"), col("span_end"),
          (col("span_end") - col("span_start") + 1).as("span_tokens"),
          (col("span_end") - col("span_start") + 1 >= exactSubstrMinTokens)
            .as("trainer_cut"))
        .orderBy("doc_id", "span_start")
    })
  )

  /** ExactSubstr cut threshold (tokens): Lee et al. 2022 dedup
    * training corpora at 50-token duplicated substrings. */
  private[llm] val exactSubstrMinTokens = 50

  /** The keyed 10-token rolling windows of `docs` — (doc_id, pos, k1,
    * k2); `hashed` selects the 128-bit hashed keys (the shipped form)
    * or the literal-string keys (the definitional twin, kept for the
    * same-JVM A/B instrument). Shared by the detector and the
    * scrubber so flag and cut can never disagree on a window. */
  /** Frame-to-frame exact-substring scrub (the curate-v4 stage,
    * VERDICT r13 item 3): flag every 10-token window appearing in ≥ 2
    * distinct docs OF THIS FRAME (not the corpus artifact — v4's input
    * is already quality/exact/paragraph-scrubbed, so the census must
    * run on the stage input), cut every covered token position, and
    * reassemble. Docs that lose every token drop from the output; docs
    * shorter than 10 tokens have no windows and pass through whole.
    * Same dupWins/dupFlagged machinery as the text_dup_spans family so
    * the window convention cannot fork. */
  private[llm] def substrScrub(docs: DataFrame): DataFrame = {
    val covered = dupFlagged(dupWins(docs, hashed = true))
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + 9)).as("tpos"))
      .distinct()
    docs
      .select(col("doc_id"), posexplode(split(col("text"), " "))
        .as(Seq("tpos", "tok")))
      .join(covered, Seq("doc_id", "tpos"), "left_anti")
      .groupBy("doc_id")
      .agg(concat_ws(" ", transform(
        array_sort(collect_list(struct(col("tpos"), col("tok")))),
        x => x.getField("tok"))).as("text"))
  }

  private def dupWins(docs: DataFrame, hashed: Boolean): DataFrame = {
    val raw = docs
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), posexplode(
        filter(
          transform(col("toks"), (_, i) =>
            concat_ws(" ", slice(col("toks"), i + lit(1), lit(10)))),
          (_, i) => i <= size(col("toks")) - 10)).as(Seq("pos", "ws")))
    if (hashed) raw.select(col("doc_id"), col("pos"),
      xxhash64(lit(0), col("ws")).as("k1"), xxhash64(lit(1), col("ws")).as("k2"))
    else raw.select(col("doc_id"), col("pos"), col("ws").as("k1"), lit(0L).as("k2"))
  }

  /** The ≥2-distinct-doc window positions of `wins` — the flag set
    * both text_dup_spans (census) and text_dup_spans_scrub (remedy)
    * operate on. */
  private def dupFlagged(wins: DataFrame): DataFrame = {
    val keys = Seq("k1", "k2")
    val dup = wins.select((col("doc_id") +: keys.map(col)): _*).distinct()
      .groupBy(keys.map(col): _*).agg(count(lit(1)).as("dfreq"))
      .where(col("dfreq") >= 2).select(keys.map(col): _*)
    wins.join(dup, keys, "left_semi")
  }

  /** The flagged window positions, persisted fingerprint-keyed (the
    * editPairsTable discipline, round 10): the corpus-wide window
    * census — the only corpus-keyed shuffle in the family — runs once
    * per (dir, documents fingerprint); the detector and the scrubber
    * are artifact reads plus doc_id-keyed work. doc_id-bucketed: every
    * consumer groups or joins on the bucketing key. */
  private def dupFlaggedTable(s: SparkSession, dir: String): String = {
    val pfx = s"dup_spans_${Tables.pathKey(dir)}_"
    val t = s"$pfx${Tables.pathKey(Tables.fingerprint(dir, "documents"))}"
    if (!s.catalog.tableExists(t)) {
      Tables.dropStaleTables(s, pfx)
      dupFlagged(dupWins(Tables.documents(s, dir), hashed = true))
        .select("doc_id", "pos")
        .write.mode("overwrite")
        .bucketBy(16, "doc_id").sortBy("doc_id", "pos")
        .format("parquet").saveAsTable(t)
    }
    t
  }

  /** text_dup_spans runs-and-census report over a flagged-positions
    * frame. n_windows is MAP-SIDE arithmetic (a doc of n ≥ 10 tokens
    * has exactly n − 9 windows; shorter docs have none and no output
    * row — the original census semantics, without re-mining). */
  private def dupSpansReport(docs: DataFrame, flagged: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val runs = flagged
      .withColumn("grp", col("pos") - row_number().over(
        Window.partitionBy("doc_id").orderBy("pos")))
      .groupBy("doc_id", "grp").agg(count(lit(1)).as("run"))
      .groupBy("doc_id").agg(sum(col("run")).as("n_dup_windows"),
        max(col("run")).as("max_dup_run"))
    docs
      .select(col("doc_id"),
        (size(split(col("text"), " ")) - 9).cast("long").as("n_windows"))
      .where(col("n_windows") >= 1)
      .join(runs, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_windows"),
        coalesce(col("n_dup_windows"), lit(0L)).as("n_dup_windows"),
        coalesce(col("max_dup_run"), lit(0L)).as("max_dup_run"))
      .orderBy("doc_id")
  }

  /** Shared body for text_dup_spans (see dupWins for `hashed`) — the
    * definitional inline form, kept for the string-keyed A/B twin;
    * the shipped key serves the same report off dupFlaggedTable. */
  private[graft] def dupSpans(docs: DataFrame, hashed: Boolean): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wins = dupWins(docs, hashed)
    val flagged = dupFlagged(wins)
    val runs = flagged
      .withColumn("grp", col("pos") - row_number().over(
        Window.partitionBy("doc_id").orderBy("pos")))
      .groupBy("doc_id", "grp").agg(count(lit(1)).as("run"))
      .groupBy("doc_id").agg(sum(col("run")).as("n_dup_windows"),
        max(col("run")).as("max_dup_run"))
    wins.groupBy("doc_id").agg(count(lit(1)).as("n_windows"))
      .join(runs, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_windows"),
        coalesce(col("n_dup_windows"), lit(0L)).as("n_dup_windows"),
        coalesce(col("max_dup_run"), lit(0L)).as("max_dup_run"))
      .orderBy("doc_id")
  }

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
        |ORDER BY doc_id""".stripMargin,

    "text_unigram_logprob" ->
      """WITH t AS (SELECT doc_id, unnest(string_split(text,' ')) AS tok FROM documents),
        |tf AS (SELECT tok, count(*) AS ctok FROM t GROUP BY tok),
        |n AS (SELECT count(*) AS ntot FROM t),
        |sc AS (SELECT doc_id,
        |              ROUND(0.0 - ln(CAST(ctok AS DOUBLE) / ntot), 6) AS nll
        |       FROM t JOIN tf USING (tok) CROSS JOIN n)
        |SELECT doc_id, COUNT(*) AS n_toks,
        |       ROUND(CAST(SUM(CAST(nll AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*), 4)
        |         AS avg_nll
        |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "text_bigram_logprob" ->
      """WITH t AS (SELECT doc_id, generate_subscripts(string_split(text,' '),1) AS pos,
        |                  unnest(string_split(text,' ')) AS tok FROM documents),
        |b AS (SELECT doc_id, tok AS w1,
        |             lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
        |      FROM t),
        |bi AS (SELECT doc_id, w1, w2 FROM b WHERE w2 IS NOT NULL),
        |cb AS (SELECT w1, w2, count(*) AS cb FROM bi GROUP BY 1, 2),
        |cu AS (SELECT tok, count(*) AS cu FROM t GROUP BY 1),
        |n AS (SELECT count(*) AS ntot FROM t),
        |sc AS (SELECT doc_id,
        |              ROUND(0.0 - ln(
        |                0.75 * (CAST(cb AS DOUBLE) / c1.cu) +
        |                0.25 * (CAST(c2.cu AS DOUBLE) / ntot)), 6) AS nll
        |       FROM bi JOIN cb USING (w1, w2)
        |       JOIN cu c1 ON c1.tok = bi.w1
        |       JOIN cu c2 ON c2.tok = bi.w2
        |       CROSS JOIN n)
        |SELECT doc_id, COUNT(*) AS n_bigrams,
        |       ROUND(CAST(SUM(CAST(nll AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*), 4)
        |         AS avg_nll
        |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "text_boilerplate_scrub" ->
      """WITH t AS (
        |  SELECT doc_id, generate_subscripts(string_split(text,' '),1) AS pos,
        |         unnest(string_split(text,' ')) AS tok FROM documents),
        |segs AS (
        |  SELECT doc_id, (pos-1)//8 AS seg_idx,
        |         string_agg(tok, ' ' ORDER BY pos) AS seg_text
        |  FROM t GROUP BY doc_id, (pos-1)//8),
        |df AS (SELECT seg_text, count(DISTINCT doc_id) AS dfreq
        |       FROM segs GROUP BY seg_text),
        |kept AS (SELECT s.* FROM segs s JOIN df USING (seg_text)
        |         WHERE dfreq <= 3),
        |agg AS (SELECT doc_id, count(*) AS n_kept,
        |               string_agg(seg_text, ' ' ORDER BY seg_idx) AS clean_text
        |        FROM kept GROUP BY doc_id),
        |tot AS (SELECT doc_id, count(*) AS n_seg FROM segs GROUP BY doc_id)
        |SELECT t.doc_id, t.n_seg,
        |       t.n_seg - COALESCE(a.n_kept, 0) AS n_dropped,
        |       COALESCE(a.clean_text, '') AS clean_text
        |FROM tot t LEFT JOIN agg a USING (doc_id)
        |ORDER BY t.doc_id""".stripMargin,

    "text_dup_spans" -> {
      val leads = (1 to 9).map(k => s"lead(tok,$k) OVER win").mkString(" || ' ' || ")
      s"""WITH t AS (
         |  SELECT doc_id, generate_subscripts(string_split(text,' '),1) AS p,
         |         unnest(string_split(text,' ')) AS tok FROM documents),
         |w AS (
         |  SELECT doc_id, p, tok || ' ' || $leads AS ws
         |  FROM t WINDOW win AS (PARTITION BY doc_id ORDER BY p)
         |  QUALIFY lead(tok,9) OVER win IS NOT NULL),
         |d AS (SELECT ws FROM w GROUP BY ws HAVING count(DISTINCT doc_id) >= 2),
         |f AS (SELECT w.doc_id, w.p FROM w JOIN d USING (ws)),
         |runs AS (SELECT doc_id,
         |               p - row_number() OVER (PARTITION BY doc_id ORDER BY p) AS grp
         |         FROM f),
         |r2 AS (SELECT doc_id, grp, count(*) AS run FROM runs GROUP BY 1, 2),
         |agg AS (SELECT doc_id, CAST(SUM(run) AS BIGINT) AS n_dup_windows,
         |               CAST(MAX(run) AS BIGINT) AS max_dup_run
         |        FROM r2 GROUP BY doc_id),
         |nw AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_windows
         |       FROM w GROUP BY doc_id)
         |SELECT nw.doc_id, nw.n_windows,
         |       COALESCE(a.n_dup_windows, 0) AS n_dup_windows,
         |       COALESCE(a.max_dup_run, 0) AS max_dup_run
         |FROM nw LEFT JOIN agg a USING (doc_id)
         |ORDER BY nw.doc_id""".stripMargin
    },

    // same window-CTE head as text_dup_spans; DuckDB positions are
    // 1-based (generate_subscripts) so f shifts to the Spark 0-based
    // convention before the gaps-and-islands merge
    "text_exact_substr" -> {
      val leads = (1 to 9).map(k => s"lead(tok,$k) OVER win").mkString(" || ' ' || ")
      s"""WITH t AS (
         |  SELECT doc_id, generate_subscripts(string_split(text,' '),1) AS p,
         |         unnest(string_split(text,' ')) AS tok FROM documents),
         |w AS (
         |  SELECT doc_id, p, tok || ' ' || $leads AS ws
         |  FROM t WINDOW win AS (PARTITION BY doc_id ORDER BY p)
         |  QUALIFY lead(tok,9) OVER win IS NOT NULL),
         |d AS (SELECT ws FROM w GROUP BY ws HAVING count(DISTINCT doc_id) >= 2),
         |f AS (SELECT w.doc_id, w.p - 1 AS pos FROM w JOIN d USING (ws)),
         |lagd AS (SELECT doc_id, pos,
         |           CASE WHEN pos - lag(pos)
         |               OVER (PARTITION BY doc_id ORDER BY pos) > 10
         |             THEN 1 ELSE 0 END AS brk
         |         FROM f),
         |runs AS (SELECT doc_id, pos,
         |           SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS grp
         |         FROM lagd)
         |SELECT doc_id, CAST(MIN(pos) AS BIGINT) AS span_start,
         |  CAST(MAX(pos) + 9 AS BIGINT) AS span_end,
         |  CAST(MAX(pos) - MIN(pos) + 10 AS BIGINT) AS span_tokens,
         |  (MAX(pos) - MIN(pos) + 10) >= $exactSubstrMinTokens AS trainer_cut
         |FROM runs GROUP BY doc_id, grp
         |ORDER BY doc_id, span_start""".stripMargin
    },

    "text_dup_spans_scrub" -> {
      val leads = (1 to 9).map(k => s"lead(tok,$k) OVER win").mkString(" || ' ' || ")
      s"""WITH t AS (
         |  SELECT doc_id, generate_subscripts(string_split(text,' '),1) AS p,
         |         unnest(string_split(text,' ')) AS tok FROM documents),
         |w AS (
         |  SELECT doc_id, p, tok || ' ' || $leads AS ws
         |  FROM t WINDOW win AS (PARTITION BY doc_id ORDER BY p)
         |  QUALIFY lead(tok,9) OVER win IS NOT NULL),
         |d AS (SELECT ws FROM w GROUP BY ws HAVING count(DISTINCT doc_id) >= 2),
         |f AS (SELECT w.doc_id, w.p FROM w JOIN d USING (ws)),
         |cov AS (SELECT DISTINCT doc_id, p + i AS tp
         |        FROM f, UNNEST(range(0, 10)) AS r(i)),
         |kept AS (SELECT t.doc_id, t.p, t.tok
         |         FROM t LEFT JOIN cov
         |           ON t.doc_id = cov.doc_id AND t.p = cov.tp
         |         WHERE cov.tp IS NULL),
         |agg AS (SELECT doc_id, count(*) AS n_kept,
         |               string_agg(tok, ' ' ORDER BY p) AS clean_text
         |        FROM kept GROUP BY doc_id),
         |tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens
         |        FROM t GROUP BY doc_id)
         |SELECT tot.doc_id, tot.n_tokens,
         |       CAST(tot.n_tokens - COALESCE(agg.n_kept, 0) AS BIGINT)
         |         AS n_scrubbed,
         |       COALESCE(agg.clean_text, '') AS clean_text
         |FROM tot LEFT JOIN agg USING (doc_id)
         |ORDER BY tot.doc_id""".stripMargin
    }
  )
}
