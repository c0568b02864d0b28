package graft.llm

import graft.{QueryPack, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** The 0.75 quality gate — THE definition; every consumer (the
    * curate chain, the funnel census) composes this frame-to-frame
    * helper so the threshold can never fork (ADVICE r11). */
  private[llm] def qualityGate(docs: DataFrame): DataFrame =
    docs.withColumn("quality", Text.qualityScore(col("text")))
      .where(col("quality") >= 0.75)

  /** sha-256 exact dedup, keep-min-doc_id — one hash shuffle; shared
    * for the same reason as [[qualityGate]]. */
  private[llm] def exactDedupKeepMin(docs: DataFrame): DataFrame =
    docs.withColumn("rn", row_number().over(
        Window.partitionBy(sha2(col("text"), 256)).orderBy(col("doc_id"))))
      .where(col("rn") === 1).drop("rn")

  /** Quality gate + exact dedup — the shared curate head's cheap map +
    * one-hash-shuffle prefix, used by v1, the pair miner, and the
    * representative chain. */
  private def curateExact(s: SparkSession, dir: String): DataFrame =
    exactDedupKeepMin(qualityGate(Tables.documents(s, dir)))

  /** Near-dup pairs over the curated-exact survivor set, persisted once
    * per (sfDir, documents fingerprint) — the pair-mining stage is the
    * expensive half of the curate head (trigram postings join), and
    * BOTH the v1 pair-drop and the v2 component solver consume exactly
    * this table, so it is the natural materialized handoff (the
    * Cluster.pairsTable discipline, applied to the curated input). */
  private def curatePairsTable(s: SparkSession, dir: String): String = {
    val pfx = s"curate_pairs_${Tables.pathKey(dir)}_"
    val t = s"$pfx${Tables.pathKey(Tables.fingerprint(dir, "documents"))}"
    if (!s.catalog.tableExists(t)) {
      Tables.dropStaleTables(s, pfx)
      Dedup.ngramJaccardPairs(curateExact(s, dir).select("doc_id", "text"), 0.5)
        .select(col("id_a"), col("id_b"))
        .write.mode("overwrite").format("parquet").saveAsTable(t)
    }
    t
  }

  /** The cluster-safe curation chain (quality gate → exact dedup →
    * near-dup components → one representative per cluster) — ONE
    * definition shared by pipeline_curate_v2 and the
    * pipeline_pretrain_corpus head, so the 0.75 gate, the τ = 0.5
    * pair threshold, and the representative convention can never
    * fork. Returns the representative docs with cluster_id, quality,
    * n_chars, and text still attached; callers project. */
  private def curatedReps(s: SparkSession, dir: String): DataFrame = {
    val exact = curateExact(s, dir)
    val pairs = s.table(curatePairsTable(s, dir))
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
    val labels = Cluster.components(edges)
    exact
      .join(labels.select(col("node").as("doc_id"), col("lbl")), Seq("doc_id"), "left")
      .withColumn("cluster_id", coalesce(col("lbl"), col("doc_id")))
      .withColumn("rn", row_number().over(
        Window.partitionBy("cluster_id").orderBy(col("n_chars").desc, col("doc_id"))))
      .where(col("rn") === 1)
  }

  /** The curated corpus, MATERIALIZED (VERDICT r06 What's-wrong 2): in
    * a production pipeline the curated representative set is the
    * product every downstream job (packing, splitting, serving) reads
    * — not a view each of them recomputes. Persisted once per (sfDir,
    * documents fingerprint), bucketed on doc_id so downstream
    * doc-keyed work starts co-located; regenerated fixtures invalidate
    * via the fingerprint key. */
  private[llm] def curatedRepsTable(s: SparkSession, dir: String): String = {
    val pfx = s"curate_reps_${Tables.pathKey(dir)}_"
    val t = s"$pfx${Tables.pathKey(Tables.fingerprint(dir, "documents"))}"
    if (!s.catalog.tableExists(t)) {
      Tables.dropStaleTables(s, pfx)
      curatedReps(s, dir)
        .select(col("doc_id"), col("cluster_id"), col("lang"), col("source"),
          col("quality"), col("n_chars"), col("text"))
        .write.mode("overwrite")
        .bucketBy(16, "doc_id").sortBy("doc_id")
        .format("parquet").saveAsTable(t)
    }
    t
  }

  /** The eval-holdout predicate — ONE definition shared by the funnel
    * census and the v4 trainer chain (both exclude held-out eval docs
    * before anything else touches them). */
  private[llm] def isEvalDoc: Column =
    col("doc_id") % 97 === 0 && col("doc_id") < 100000L

  /** Slim per-doc stats artifact (VERDICT r13 item 6): ONE pass over
    * the raw corpus computes everything the census heads need — token
    * count, quality score, content sha, the holdout flag — persisted
    * fingerprint-keyed so the funnel, the v4 head, and the threshold
    * curve never re-scan text for numbers a slim scan answers. At 100×
    * this retires the repeated full-text quality+sha passes that made
    * pipeline_funnel_report the worst posture row (23.3 s). */
  private[llm] def docStatsTable(s: SparkSession, dir: String): String = {
    val pfx = s"curate_stats_${Tables.pathKey(dir)}_"
    val t = s"$pfx${Tables.pathKey(Tables.fingerprint(dir, "documents"))}"
    if (!s.catalog.tableExists(t)) {
      Tables.dropStaleTables(s, pfx)
      Tables.documents(s, dir)
        .select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("n_tok"),
          Text.qualityScore(col("text")).as("quality"),
          sha2(col("text"), 256).as("sha"),
          isEvalDoc.as("is_eval"))
        .write.mode("overwrite").format("parquet").saveAsTable(t)
    }
    t
  }

  /** The TRAINER-GRADE v4 chain (VERDICT r13 item 3): eval holdout →
    * quality gate → exact dedup → paragraph-grain scrub
    * (Dedup.paragraphScrub — the dedup_paragraph keep-rule) →
    * exact-substring scrub (Text3.substrScrub — the
    * text_dup_spans_scrub cut re-censused on the stage input) →
    * near-dup components over the SCRUBBED text → one representative
    * per cluster. Until now the trainer-dedup grains existed only as
    * standalone keys; the composed product is what a 100 TB run
    * actually ships — and composition changes the answers: near-dup
    * mining over scrubbed text sees the documents AFTER their shared
    * boilerplate is cut, so two docs that only looked similar through
    * repeated paragraphs fall below τ while genuinely-parallel prose
    * stays above it.
    *
    * Each stage output is MATERIALIZED fingerprint-keyed (the
    * production shape — RefinedWeb-style pipelines persist every stage
    * handoff, and the funnel census reads these artifacts instead of
    * re-running the chain): `p` = paragraph-scrubbed text, `s` =
    * substring-scrubbed text, and the rep set. The head reuses the
    * [[docStatsTable]] ids (quality + sha winners) so only the
    * surviving docs' text is ever re-read. Representative = most
    * SURVIVING tokens (tie: min doc_id) — the n_chars convention
    * re-based on post-scrub length, mirrored in the oracle. */
  private def curateV4Stage(s: SparkSession, dir: String,
      stage: String): String = {
    val pfx = s"curate_v4${stage}_${Tables.pathKey(dir)}_"
    val t = s"$pfx${Tables.pathKey(Tables.fingerprint(dir, "documents"))}"
    if (!s.catalog.tableExists(t)) {
      Tables.dropStaleTables(s, pfx)
      stage match {
        case "p" =>
          val stats = s.table(docStatsTable(s, dir))
          val keepIds = stats.where(!col("is_eval") && col("quality") >= 0.75)
            .withColumn("rn", row_number().over(
              Window.partitionBy("sha").orderBy(col("doc_id"))))
            .where(col("rn") === 1).select("doc_id")
          val exactDocs = Tables.documents(s, dir)
            .join(keepIds, Seq("doc_id"), "left_semi")
            .select("doc_id", "text")
          Dedup.paragraphScrub(exactDocs)
            .write.mode("overwrite").format("parquet").saveAsTable(t)
        case "s" =>
          Text3.substrScrub(s.table(curateV4Stage(s, dir, "p")))
            .write.mode("overwrite").format("parquet").saveAsTable(t)
        case "" =>
          val scrubbed = s.table(curateV4Stage(s, dir, "s"))
          val pairs = Dedup.ngramJaccardPairs(scrubbed, 0.5)
          val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
            .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
          val labels = Cluster.components(edges)
          scrubbed
            .withColumn("n_tok", size(split(col("text"), " ")).cast("long"))
            .join(Tables.documents(s, dir).select("doc_id", "lang", "source"),
              Seq("doc_id"))
            .join(s.table(docStatsTable(s, dir)).select("doc_id", "quality"),
              Seq("doc_id"))
            .join(labels.select(col("node").as("doc_id"), col("lbl")),
              Seq("doc_id"), "left")
            .withColumn("cluster_id", coalesce(col("lbl"), col("doc_id")))
            .withColumn("rn", row_number().over(
              Window.partitionBy("cluster_id")
                .orderBy(col("n_tok").desc, col("doc_id"))))
            .where(col("rn") === 1)
            .select("doc_id", "cluster_id", "lang", "source", "quality", "n_tok")
            .write.mode("overwrite").format("parquet").saveAsTable(t)
      }
    }
    t
  }

  private def curateV4Table(s: SparkSession, dir: String): String =
    curateV4Stage(s, dir, "")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipeline_curate_v4" -> ((s, dir) =>
      s.table(curateV4Table(s, dir)).orderBy("doc_id")),

    // The curation FUNNEL REPORT — the one-page census a corpus owner
    // reads after every run: docs AND tokens surviving each stage of
    // the v4 trainer chain (eval holdout → quality gate → exact dedup
    // → paragraph scrub → substring scrub → near-dup reps → benchmark
    // decontamination of the shipped corpus). Round 14: the census now
    // reads the chain's MATERIALIZED stage artifacts (docStatsTable +
    // the curateV4Stage handoffs) instead of re-running the chain —
    // the production shape (a 100 TB pipeline persists every stage
    // output; the census is a read), and the item-6 remedy for the
    // 23.3 s 100× posture row: stages 0–3 are one slim-artifact pass
    // (no text), stages 4–6 are artifact scans, and only the final
    // decontamination stage computes over text — the REP corpus, the
    // smallest frame in the chain. Stage membership still composes the
    // verified operators because the artifacts are BUILT from them
    // (paragraphScrub / substrScrub / the component solver); the
    // LlmSpec funnel test pins stage agreement cross-key. The token
    // column is the budget-relevant one — a stage that drops 3 % of
    // docs can cost 3× that in tokens if it culls the long tail.
    "pipeline_funnel_report" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val stats = s.table(docStatsTable(s, dir))
      def cnt(flag: Column) = sum(when(flag, 1L).otherwise(0L))
      def tok(flag: Column) = coalesce(sum(when(flag, col("n_tok"))), lit(0L))
      val flagged = stats.select(col("doc_id"), col("n_tok"), col("sha"),
        col("is_eval"), (!col("is_eval") && col("quality") >= 0.75).as("q_ok"))
      val head = flagged.agg(
        count(lit(1)).as("d0"), coalesce(sum(col("n_tok")), lit(0L)).as("t0"),
        cnt(!col("is_eval")).as("d1"), tok(!col("is_eval")).as("t1"),
        cnt(col("q_ok")).as("d2"), tok(col("q_ok")).as("t2"))
        .localCheckpoint() // 1 row, read three times (exchange reuse
                           // does NOT fire across the union branches)
      // stage-3 census: min doc_id per sha among quality-passing
      // non-eval docs — identical membership to the v4 head's keepIds
      // (min/min_by partial aggregate, NOT a row_number window whose
      // hot sha would pin one reducer)
      val census = flagged.where(col("q_ok"))
        .groupBy(col("sha"))
        .agg(count(lit(1)).as("n"), min_by(col("n_tok"), col("doc_id")).as("ktok"))
      val pClean = s.table(curateV4Stage(s, dir, "p"))
      val sClean = s.table(curateV4Stage(s, dir, "s"))
      val reps = s.table(curateV4Stage(s, dir, ""))
      // final stage: decontaminate the corpus the run would SHIP — the
      // reps' scrubbed text vs the held-out eval docs
      val repText = sClean.join(reps.select("doc_id"), Seq("doc_id"), "left_semi")
        .withColumn("n_tok", size(split(col("text"), " ")).cast("long"))
      val dec = Text3.decontaminate(repText, docs.where(isEvalDoc))
      def stageAt(idx: Int, name: String): DataFrame =
        head.select(lit(idx.toLong).as("stage_idx"), lit(name).as("stage"),
          col(s"d$idx").as("n_docs"), col(s"t$idx").as("n_tokens"))
      def fold(df: DataFrame, idx: Int, name: String): DataFrame =
        df.agg(count(lit(1)).as("n_docs"),
            coalesce(sum(col("n_tok")), lit(0L)).as("n_tokens"))
          .select(lit(idx.toLong).as("stage_idx"), lit(name).as("stage"),
            col("n_docs"), col("n_tokens"))
      def foldText(df: DataFrame, idx: Int, name: String): DataFrame =
        fold(df.select(size(split(col("text"), " ")).cast("long")
          .as("n_tok")), idx, name)
      stageAt(0, "raw")
        .unionByName(stageAt(1, "eval_holdout"))
        .unionByName(stageAt(2, "quality_gate"))
        .unionByName(fold(census.select(col("ktok").as("n_tok")), 3,
          "exact_dedup"))
        .unionByName(foldText(pClean, 4, "paragraph_scrub"))
        .unionByName(foldText(sClean, 5, "substr_scrub"))
        .unionByName(fold(reps, 6, "neardup_reps"))
        .unionByName(fold(dec, 7, "decontaminated"))
        .orderBy("stage_idx")
    }),

    "pipeline_curate" -> ((s, dir) => {
      // quality gate + exact dedup (shared head), then drop the higher
      // doc_id of each trigram-Jaccard pair from the PERSISTED pair
      // table — v1 and v2 consume the same materialized mining stage
      val exact = curateExact(s, dir)
      val drops = s.table(curatePairsTable(s, dir))
        .select(col("id_b").as("doc_id")).distinct()
      exact.join(drops, Seq("doc_id"), "left_anti")
        .select(col("doc_id"), col("lang"), col("source"), col("quality"))
        .orderBy("doc_id")
    }),

    // v2 (VERDICT r05 item 3): CLUSTER-SAFE curation. v1 drops the
    // higher doc of every near-dup PAIR, which is not transitive-safe —
    // in a chain A~B~C (A!~C) it keeps only A even though B/C may be
    // the better representatives, and with different pair orderings it
    // can drop every member of a cluster except an arbitrary endpoint.
    // v2 resolves the pair graph into connected components
    // (Cluster.components — the same solver dedup_clusters verifies)
    // and keeps ONE representative per near-dup cluster: the longest
    // doc, ties to min doc_id (the dedup_cluster_rep convention). Same
    // shuffle-bounded staging — quality is map-only, exact dedup one
    // hash shuffle, pair mining df-pruned postings over the shrunken
    // survivor set, and the component solver runs on (id, id) label
    // pairs that are tiny next to the corpus.
    "pipeline_curate_v2" -> ((s, dir) =>
      s.table(curatedRepsTable(s, dir))
        .select(col("doc_id"), col("cluster_id"), col("lang"), col("source"),
          col("quality"))
        .orderBy("doc_id")),

    // The COMPLETE pre-training corpus job, end to end: quality gate →
    // exact dedup → cluster-safe near-dup resolution (the curate_v2
    // chain) → temperature-scaled language rebalancing (the
    // sample_temperature rule, rates derived from the SURVIVOR
    // distribution) → 2048-token sequence packing → per-shard
    // manifest. This is the single query a corpus owner runs to turn a
    // raw crawl into training shards; every stage is one of the
    // individually-verified keys, composed, and each stage shrinks or
    // bounds the data for the next (map-only filter, one hash shuffle,
    // df-pruned postings, label pairs, 5-row broadcast rates, one
    // hot-shard window). Output grain = (lang, source, seq_id) shard
    // summaries — manifest-sized, not corpus-sized.
    "pipeline_pretrain_corpus" -> ((s, dir) => {
      import graft.relational.Extras8
      val rep = s.table(curatedRepsTable(s, dir))
        .select(col("doc_id"), col("lang"), col("source"),
          size(split(col("text"), " ")).cast("long").as("n_tok"))
      val samp = rep.join(broadcast(Extras8.temperatureRates(rep)), Seq("lang"))
        .where(Extras8.mdUniform(col("doc_id")) < col("rate"))
      val wseq = Window.partitionBy("lang", "source").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      samp.withColumn("cum_before", coalesce(sum(col("n_tok")).over(wseq), lit(0L)))
        .withColumn("seq_id", expr("cum_before div 2048"))
        .groupBy("lang", "source", "seq_id")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"),
          min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
        .orderBy("lang", "source", "seq_id")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "pipeline_funnel_report" ->
      s"""WITH RECURSIVE d AS (
         |  SELECT doc_id, text,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
         |    (doc_id % 97 = 0 AND doc_id < 100000) AS is_eval,
         |    ${Text.qualityScoreD} AS q
         |  FROM documents),
         |s2 AS (SELECT * FROM d WHERE NOT is_eval AND q >= 0.75),
         |kept AS (SELECT * FROM (
         |    SELECT *, row_number() OVER (PARTITION BY sha256(text)
         |      ORDER BY doc_id) AS rn FROM s2) WHERE rn = 1),
         |pt AS (SELECT doc_id, string_split(text, ' ') AS toks FROM kept),
         |pp AS (SELECT doc_id, CAST(i AS BIGINT) AS para_id,
         |        array_to_string(list_slice(toks, i * ${Dedup.paraTokens} + 1,
         |          i * ${Dedup.paraTokens} + ${Dedup.paraTokens}), ' ') AS ptxt
         |      FROM pt, UNNEST(range(0,
         |        (len(toks) + ${Dedup.paraTokens - 1}) // ${Dedup.paraTokens})) AS r(i)),
         |pw AS (SELECT doc_id, para_id, ptxt, row_number() OVER (
         |         PARTITION BY ptxt ORDER BY doc_id, para_id) AS rn2 FROM pp),
         |pc AS (SELECT doc_id, string_agg(ptxt, ' ' ORDER BY para_id) AS text
         |       FROM pw WHERE rn2 = 1 GROUP BY doc_id),
         |st AS (SELECT doc_id, string_split(text, ' ') AS toks FROM pc),
         |win AS (SELECT doc_id, CAST(i AS BIGINT) AS pos,
         |         array_to_string(toks[CAST(i+1 AS INT):CAST(i+10 AS INT)], ' ') AS ws
         |        FROM st, UNNEST(range(0, len(toks) - 9)) AS r(i)),
         |flagws AS (SELECT ws FROM (
         |  SELECT ws, count(DISTINCT doc_id) AS df FROM win GROUP BY ws)
         |  WHERE df >= 2),
         |cov AS (SELECT DISTINCT w.doc_id, w.pos + j AS tpos
         |        FROM win w JOIN flagws USING (ws),
         |          UNNEST(range(0, 10)) AS rr(j)),
         |tk AS (SELECT doc_id,
         |         CAST(generate_subscripts(toks, 1) - 1 AS BIGINT) AS tpos,
         |         unnest(toks) AS tok FROM st),
         |sc AS (SELECT tk.doc_id, string_agg(tok, ' ' ORDER BY tk.tpos) AS text
         |       FROM tk LEFT JOIN cov
         |         ON cov.doc_id = tk.doc_id AND cov.tpos = tk.tpos
         |       WHERE cov.doc_id IS NULL GROUP BY tk.doc_id),
         |t2 AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
         |              generate_subscripts(string_split(text, ' '), 1) AS pos
         |       FROM sc),
         |tg AS (SELECT DISTINCT doc_id,
         |         tok || ' ' || lead(tok) OVER w2 || ' ' || lead(tok, 2) OVER w2 AS ng
         |       FROM t2 WINDOW w2 AS (PARTITION BY doc_id ORDER BY pos)
         |       QUALIFY lead(tok, 2) OVER w2 IS NOT NULL),
         |pruned AS (SELECT tg.doc_id, tg.ng FROM tg
         |           JOIN (SELECT ng, count(*) AS dfreq FROM tg GROUP BY ng) dd USING (ng)
         |           WHERE dfreq <= 20),
         |sizes AS (SELECT doc_id, count(*) AS n FROM pruned GROUP BY doc_id),
         |pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
         |          FROM pruned a JOIN pruned b ON a.ng = b.ng AND a.doc_id < b.doc_id
         |          GROUP BY 1, 2),
         |jp AS (SELECT id_a, id_b FROM pairs
         |       JOIN sizes sa ON sa.doc_id = id_a
         |       JOIN sizes sb ON sb.doc_id = id_b
         |       WHERE CAST(shared AS DOUBLE) / (sa.n + sb.n - shared) >= 0.5),
         |edges AS (SELECT id_a AS a, id_b AS b FROM jp
         |          UNION SELECT id_b, id_a FROM jp),
         |reach(a, b) AS (
         |  SELECT a, b FROM edges
         |  UNION
         |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
         |lbl AS (
         |  SELECT sc.doc_id,
         |         CAST(COALESCE(LEAST(MIN(r.b), sc.doc_id), sc.doc_id) AS BIGINT) AS cluster_id
         |  FROM sc LEFT JOIN reach r ON r.a = sc.doc_id
         |  GROUP BY sc.doc_id),
         |nt AS (SELECT doc_id,
         |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok FROM sc),
         |reps AS (SELECT l.doc_id, nt.n_tok
         |         FROM lbl l JOIN nt ON nt.doc_id = l.doc_id
         |         QUALIFY row_number() OVER (PARTITION BY l.cluster_id
         |                                    ORDER BY nt.n_tok DESC, l.doc_id) = 1),
         |rsc AS (SELECT sc.doc_id, sc.text, rp.n_tok
         |        FROM sc JOIN reps rp ON rp.doc_id = sc.doc_id),
         |kg AS (
         |  SELECT k.doc_id,
         |    array_to_string(toks[CAST(i AS INT):CAST(i+4 AS INT)], ' ') AS ng
         |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM rsc) k,
         |    UNNEST(range(1, len(k.toks) - 3)) AS r(i)),
         |eg AS (
         |  SELECT DISTINCT
         |    array_to_string(toks[CAST(i AS INT):CAST(i+4 AS INT)], ' ') AS ng
         |  FROM (SELECT string_split(text, ' ') AS toks FROM d WHERE is_eval) e,
         |    UNNEST(range(1, len(e.toks) - 3)) AS r(i)),
         |contaminated AS (SELECT DISTINCT kg.doc_id FROM kg JOIN eg USING (ng)),
         |dec AS (SELECT * FROM rsc
         |        WHERE doc_id NOT IN (SELECT doc_id FROM contaminated))
         |SELECT * FROM (
         |  SELECT CAST(0 AS BIGINT) AS stage_idx, 'raw' AS stage,
         |    CAST(COUNT(*) AS BIGINT) AS n_docs,
         |    CAST(coalesce(SUM(n_tok), 0) AS BIGINT) AS n_tokens FROM d
         |  UNION ALL
         |  SELECT 1, 'eval_holdout', CAST(COUNT(*) AS BIGINT),
         |    CAST(coalesce(SUM(n_tok), 0) AS BIGINT) FROM d WHERE NOT is_eval
         |  UNION ALL
         |  SELECT 2, 'quality_gate', CAST(COUNT(*) AS BIGINT),
         |    CAST(coalesce(SUM(n_tok), 0) AS BIGINT) FROM s2
         |  UNION ALL
         |  SELECT 3, 'exact_dedup', CAST(COUNT(*) AS BIGINT),
         |    CAST(coalesce(SUM(n_tok), 0) AS BIGINT) FROM kept
         |  UNION ALL
         |  SELECT 4, 'paragraph_scrub', CAST(COUNT(*) AS BIGINT),
         |    CAST(coalesce(SUM(len(string_split(text, ' '))), 0) AS BIGINT) FROM pc
         |  UNION ALL
         |  SELECT 5, 'substr_scrub', CAST(COUNT(*) AS BIGINT),
         |    CAST(coalesce(SUM(len(string_split(text, ' '))), 0) AS BIGINT) FROM sc
         |  UNION ALL
         |  SELECT 6, 'neardup_reps', CAST(COUNT(*) AS BIGINT),
         |    CAST(coalesce(SUM(n_tok), 0) AS BIGINT) FROM reps
         |  UNION ALL
         |  SELECT 7, 'decontaminated', CAST(COUNT(*) AS BIGINT),
         |    CAST(coalesce(SUM(n_tok), 0) AS BIGINT) FROM dec)
         |ORDER BY stage_idx""".stripMargin,

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
         |ORDER BY ex.doc_id""".stripMargin,

    // the recursive-CTE twin of the Spark component solver, with the
    // quality/exact-dedup head (extends Cluster's transitive-closure
    // oracle — VERDICT r05 item 3)
    "pipeline_curate_v2" ->
      s"""WITH RECURSIVE q AS (
         |  SELECT doc_id, lang, source, text, n_chars, ${Text.qualityScoreD} AS quality
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
         |jp AS (SELECT id_a, id_b FROM pairs
         |       JOIN sizes sa ON sa.doc_id = id_a
         |       JOIN sizes sb ON sb.doc_id = id_b
         |       WHERE CAST(shared AS DOUBLE) / (sa.n + sb.n - shared) >= 0.5),
         |edges AS (SELECT id_a AS a, id_b AS b FROM jp
         |          UNION SELECT id_b, id_a FROM jp),
         |reach(a, b) AS (
         |  SELECT a, b FROM edges
         |  UNION
         |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
         |lbl AS (
         |  SELECT ex.doc_id,
         |         CAST(COALESCE(LEAST(MIN(r.b), ex.doc_id), ex.doc_id) AS BIGINT) AS cluster_id
         |  FROM ex LEFT JOIN reach r ON r.a = ex.doc_id
         |  GROUP BY ex.doc_id)
         |SELECT l.doc_id, l.cluster_id, e.lang, e.source, e.quality
         |FROM lbl l JOIN ex e ON e.doc_id = l.doc_id
         |QUALIFY row_number() OVER (PARTITION BY l.cluster_id
         |                           ORDER BY e.n_chars DESC, l.doc_id) = 1
         |ORDER BY l.doc_id""".stripMargin,

    // the v4 trainer chain: eval holdout + the curate_v2 quality/exact
    // prefix, then the dedup_paragraph keep-rule, the dup-window cut
    // re-censused on the scrubbed frame, trigram mining + recursive
    // closure over the SCRUBBED text, rep = most surviving tokens
    // (tie min doc_id)
    "pipeline_curate_v4" ->
      s"""WITH RECURSIVE q AS (
         |  SELECT doc_id, lang, source, text, ${Text.qualityScoreD} AS quality
         |  FROM documents),
         |f AS (SELECT * FROM q WHERE quality >= 0.75
         |      AND NOT (doc_id % 97 = 0 AND doc_id < 100000)),
         |ex AS (SELECT * FROM f
         |       QUALIFY row_number() OVER (PARTITION BY sha256(text) ORDER BY doc_id) = 1),
         |pt AS (SELECT doc_id, string_split(text, ' ') AS toks FROM ex),
         |pp AS (SELECT doc_id, CAST(i AS BIGINT) AS para_id,
         |        array_to_string(list_slice(toks, i * ${Dedup.paraTokens} + 1,
         |          i * ${Dedup.paraTokens} + ${Dedup.paraTokens}), ' ') AS ptxt
         |      FROM pt, UNNEST(range(0,
         |        (len(toks) + ${Dedup.paraTokens - 1}) // ${Dedup.paraTokens})) AS r(i)),
         |pw AS (SELECT doc_id, para_id, ptxt, row_number() OVER (
         |         PARTITION BY ptxt ORDER BY doc_id, para_id) AS rn FROM pp),
         |pc AS (SELECT doc_id, string_agg(ptxt, ' ' ORDER BY para_id) AS text
         |       FROM pw WHERE rn = 1 GROUP BY doc_id),
         |st AS (SELECT doc_id, string_split(text, ' ') AS toks FROM pc),
         |win AS (SELECT doc_id, CAST(i AS BIGINT) AS pos,
         |         array_to_string(toks[CAST(i+1 AS INT):CAST(i+10 AS INT)], ' ') AS ws
         |        FROM st, UNNEST(range(0, len(toks) - 9)) AS r(i)),
         |flagws AS (SELECT ws FROM (
         |  SELECT ws, count(DISTINCT doc_id) AS df FROM win GROUP BY ws)
         |  WHERE df >= 2),
         |cov AS (SELECT DISTINCT w.doc_id, w.pos + j AS tpos
         |        FROM win w JOIN flagws USING (ws),
         |          UNNEST(range(0, 10)) AS rr(j)),
         |tk AS (SELECT doc_id,
         |         CAST(generate_subscripts(toks, 1) - 1 AS BIGINT) AS tpos,
         |         unnest(toks) AS tok FROM st),
         |sc AS (SELECT tk.doc_id, string_agg(tok, ' ' ORDER BY tk.tpos) AS text
         |       FROM tk LEFT JOIN cov
         |         ON cov.doc_id = tk.doc_id AND cov.tpos = tk.tpos
         |       WHERE cov.doc_id IS NULL GROUP BY tk.doc_id),
         |t2 AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
         |              generate_subscripts(string_split(text, ' '), 1) AS pos
         |       FROM sc),
         |tg AS (SELECT DISTINCT doc_id,
         |         tok || ' ' || lead(tok) OVER w2 || ' ' || lead(tok, 2) OVER w2 AS ng
         |       FROM t2 WINDOW w2 AS (PARTITION BY doc_id ORDER BY pos)
         |       QUALIFY lead(tok, 2) OVER w2 IS NOT NULL),
         |pruned AS (SELECT tg.doc_id, tg.ng FROM tg
         |           JOIN (SELECT ng, count(*) AS dfreq FROM tg GROUP BY ng) d USING (ng)
         |           WHERE dfreq <= 20),
         |sizes AS (SELECT doc_id, count(*) AS n FROM pruned GROUP BY doc_id),
         |pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
         |          FROM pruned a JOIN pruned b ON a.ng = b.ng AND a.doc_id < b.doc_id
         |          GROUP BY 1, 2),
         |jp AS (SELECT id_a, id_b FROM pairs
         |       JOIN sizes sa ON sa.doc_id = id_a
         |       JOIN sizes sb ON sb.doc_id = id_b
         |       WHERE CAST(shared AS DOUBLE) / (sa.n + sb.n - shared) >= 0.5),
         |edges AS (SELECT id_a AS a, id_b AS b FROM jp
         |          UNION SELECT id_b, id_a FROM jp),
         |reach(a, b) AS (
         |  SELECT a, b FROM edges
         |  UNION
         |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
         |lbl AS (
         |  SELECT sc.doc_id,
         |         CAST(COALESCE(LEAST(MIN(r.b), sc.doc_id), sc.doc_id) AS BIGINT) AS cluster_id
         |  FROM sc LEFT JOIN reach r ON r.a = sc.doc_id
         |  GROUP BY sc.doc_id),
         |nt AS (SELECT doc_id,
         |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok FROM sc)
         |SELECT l.doc_id, l.cluster_id, e.lang, e.source, e.quality, nt.n_tok
         |FROM lbl l JOIN ex e ON e.doc_id = l.doc_id
         |           JOIN nt ON nt.doc_id = l.doc_id
         |QUALIFY row_number() OVER (PARTITION BY l.cluster_id
         |                           ORDER BY nt.n_tok DESC, l.doc_id) = 1
         |ORDER BY l.doc_id""".stripMargin,

    // curate_v2's chain, extended with survivor-distribution temperature
    // rates (sample_temperature's rule), the md5-uniform accept, the
    // pack_sequences window, and the shard-manifest rollup
    "pipeline_pretrain_corpus" ->
      s"""WITH RECURSIVE q AS (
         |  SELECT doc_id, lang, source, text, n_chars, ${Text.qualityScoreD} AS quality
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
         |jp AS (SELECT id_a, id_b FROM pairs
         |       JOIN sizes sa ON sa.doc_id = id_a
         |       JOIN sizes sb ON sb.doc_id = id_b
         |       WHERE CAST(shared AS DOUBLE) / (sa.n + sb.n - shared) >= 0.5),
         |edges AS (SELECT id_a AS a, id_b AS b FROM jp
         |          UNION SELECT id_b, id_a FROM jp),
         |reach(a, b) AS (
         |  SELECT a, b FROM edges
         |  UNION
         |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
         |lbl AS (
         |  SELECT ex.doc_id,
         |         CAST(COALESCE(LEAST(MIN(r.b), ex.doc_id), ex.doc_id) AS BIGINT) AS cluster_id
         |  FROM ex LEFT JOIN reach r ON r.a = ex.doc_id
         |  GROUP BY ex.doc_id),
         |surv AS (
         |  SELECT l.doc_id, e.lang, e.source,
         |         CAST(len(string_split(e.text, ' ')) AS BIGINT) AS n_tok
         |  FROM lbl l JOIN ex e ON e.doc_id = l.doc_id
         |  QUALIFY row_number() OVER (PARTITION BY l.cluster_id
         |                             ORDER BY e.n_chars DESC, l.doc_id) = 1),
         |st AS (SELECT lang, count(*) AS n FROM surv GROUP BY 1),
         |tot AS (SELECT SUM(n) AS nn FROM st),
         |pwt AS (SELECT lang, CAST(n AS DOUBLE) / nn AS p,
         |          ROUND(pow(CAST(n AS DOUBLE) / nn, 0.3), 12) AS pw
         |        FROM st CROSS JOIN tot),
         |z AS (SELECT CAST(SUM(CAST(pw AS DECIMAL(28,12))) AS DOUBLE) AS z FROM pwt),
         |rates AS (SELECT lang, ROUND(LEAST(1.0, 0.8 * (pw / z) / p), 6) AS rate
         |          FROM pwt CROSS JOIN z),
         |samp AS (SELECT surv.doc_id, surv.lang, surv.source, surv.n_tok
         |         FROM surv JOIN rates USING (lang)
         |         WHERE ${graft.relational.Extras8.mdUniformSql("surv.doc_id")} < rate),
         |c AS (SELECT doc_id, lang, source, n_tok,
         |        CAST(COALESCE(SUM(n_tok) OVER (PARTITION BY lang, source ORDER BY doc_id
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
         |          AS cum_before
         |      FROM samp)
         |SELECT lang, source, cum_before // 2048 AS seq_id,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
         |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
         |FROM c GROUP BY 1, 2, 3
         |ORDER BY 1, 2, 3""".stripMargin
  )
}
