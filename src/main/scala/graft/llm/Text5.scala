package graft.llm

import graft.{QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Round-8 additions to the training-data pipeline surface — the four
  * corpus-construction primitives a curation team reaches for right
  * after dedup/quality filtering:
  *
  *  - `text_source_caps` — per-source document caps (the RefinedWeb /
  *    C4 "host cap": no single domain may contribute more than K docs,
  *    keep the best-K by quality). One shuffle keyed by source; within
  *    a source the rank window is host-sized. A pathological megahost
  *    makes a hot partition — the two-phase (group, value-bucket) rank
  *    template (Extras11.giniRanked) applies unchanged there; at the
  *    fixture's host sizes the plain window is the measured-right plan.
  *
  *  - `sample_neyman` — Neyman-optimal stratified allocation: the
  *    sample size each stratum DESERVES (n_h ∝ N_h·σ_h, minimizing the
  *    estimator variance at fixed total budget) rather than the fixed
  *    per-stratum rates `sample_stratified` assumes given. The σ term
  *    is computed in pure integer arithmetic (2-dp fixed-point quality,
  *    N_h²σ_h² = (N_h·Σq² − (Σq)²) div (N_h−1) — engine-exact, and
  *    Long-safe to ~10 M rows/stratum at q ≤ 100; the decimal(38)
  *    widening is mechanical beyond that), then one IEEE sqrt of an
  *    integer — correctly rounded on both engines, so the allocation is
  *    reproducible bit-for-bit. The draw within each stratum is the
  *    portable-hash order (tokHashS), so membership is a pure function
  *    of (doc_id, lang, day-0 stats) — auditable like sample_hash.
  *    Scale: stats are one doc-keyed agg to 5 rows; the rank window is
  *    stratum-partitioned.
  *
  *  - `pipeline_shard_sized` — token-budget sharding: lay the corpus
  *    out in deterministic hash order and cut it into shards of
  *    ≈BUDGET tokens (a doc belongs to the shard where its token run
  *    STARTS — the greedy contiguous packing every pretraining loader
  *    uses to get same-sized files). The global running token count is
  *    computed with the two-phase prefix sum (per-bucket window + 64
  *    broadcast bucket offsets — the giniRanked template), NOT a
  *    single-partition global window: parallelism is 64 × within-bucket
  *    instead of 1, and the result is provably identical because bucket
  *    id is the hash's high bits, so bucket order refines hash order.
  *    The oracle is the naive single-window cumsum — same rows.
  *
  *  - `text_bpe_encode` — the APPLY side of byte-pair encoding: split a
  *    token into characters, then apply a fixed merge table in priority
  *    order (each merge = repeated leftmost non-overlapping passes to
  *    fixpoint; 4 passes bound any fixture-length token). The merge
  *    table is the model artifact — in production it is the learned
  *    vocabulary, loaded the same way (classifierWeights precedent) —
  *    and the cascade is built ONCE as a SQL string shared by the Spark
  *    key and the DuckDB oracle, so the two engines run the
  *    byte-identical formula. Everything is codegen'd string built-ins
  *    over the distinct-token vocabulary (Heaps-law bounded, not
  *    corpus-sized); re-joining encodes the full corpus map-side.
  *
  *  - `text_bpe_train` — the TRAIN side: learn the merge table from the
  *    corpus itself (the classic BPE trainer: N rounds of "count all
  *    adjacent symbol pairs weighted by token frequency, merge the most
  *    frequent"). The argmax choice at round i depends on rounds
  *    0..i−1, so the loop is inherently sequential — the distributed
  *    shape is the one every large-scale tokenizer trainer uses:
  *    corpus → (token, freq) vocabulary is ONE shuffle whose output is
  *    Heaps-law bounded (millions of rows at 100 TB, not billions);
  *    each round is then one codegen'd job over the persisted vocab
  *    (re-segment via the learned-so-far replace cascade, explode
  *    adjacent pairs, hash-agg SUM(freq), argmax) plus a 1-ROW driver
  *    fetch — the bounded-driver-artifact shape (PQ-codebook / centroid
  *    precedent), N rows total across the loop. Re-segmenting from the
  *    persisted vocab each round (rather than chaining DataFrames)
  *    keeps the lineage flat — round i is O(vocab·len·i) codegen'd
  *    string work, never a recursive plan. Argmax tie-break is total
  *    (count DESC, left, right), so the learned table is geometry- and
  *    engine-independent. No SQL twin exists (the per-round argmax is
  *    an iterative fixpoint) → oracleExempt; the LlmSpec gate replays
  *    an independent symbol-vector reference trainer over the same
  *    vocabulary and asserts the merge tables match EXACTLY,
  *    merge-for-merge, counts included.
  */
object Text5 extends QueryPack {

  private val SOURCE_CAP = 15
  private val NEYMAN_TOTAL = 200L
  private val SHARD_TOKENS = 4096L
  private[graft] val BPE_TRAIN_ROUNDS = 12

  /** BPE merge table (priority order). Later rules consume earlier
    * rules' outputs ("sc an" fires only after "s c" and "a n"), so the
    * cascade exercises true multi-level merging. */
  private[graft] val bpeMerges: Seq[(String, String)] = Seq(
    "t" -> "h", "e" -> "r", "a" -> "n", "o" -> "w",
    "s" -> "c", "th" -> "e", "sc" -> "an", "an" -> "d")

  /** The merge cascade over an expression yielding ' c h a r s ' —
    * one definition for both engines (replace() is ANSI on both). */
  private def bpeChain(base: String): String =
    bpeMerges.flatMap(m => Seq.fill(4)(m)).foldLeft(base) {
      case (acc, (l, r)) => s"replace($acc, ' $l $r ', ' $l$r ')"
    }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_source_caps" -> ((s, dir) => {
      val q = Tables.documents(s, dir).select(col("doc_id"), col("source"),
        Text.qualityScore(col("text")).as("quality"))
      val w = Window.partitionBy(col("source"))
        .orderBy(col("quality").desc, col("doc_id"))
      q.withColumn("rn", row_number().over(w))
        .where(col("rn") <= SOURCE_CAP)
        .select(col("doc_id"), col("source"), col("quality"), col("rn"))
        .orderBy("doc_id")
    }),

    "sample_neyman" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).select(col("doc_id"), col("lang"),
        floor(Text.qualityScore(col("text")) * 100 + 0.5).as("q2"))
      val st = docs.groupBy("lang").agg(
        count(lit(1)).as("n_h"), sum(col("q2")).as("s1"),
        sum(col("q2") * col("q2")).as("s2"))
      val alloc = st
        .withColumn("w_h",
          floor(sqrt(expr("(n_h * s2 - s1 * s1) div greatest(n_h - 1, 1)")
            .cast("double"))))
        .withColumn("quota",
          expr(s"($NEYMAN_TOTAL * w_h) div (sum(w_h) over ())"))
        .select(col("lang"), col("quota"))
      val wl = Window.partitionBy(col("lang"))
        .orderBy(Text.tokHashS(col("doc_id").cast("string")), col("doc_id"))
      docs.join(broadcast(alloc), Seq("lang"))
        .withColumn("rn", row_number().over(wl))
        .where(col("rn") <= col("quota"))
        .select(col("doc_id"), col("lang"), col("quota"), col("rn"))
        .orderBy("doc_id")
    }),

    "pipeline_shard_sized" -> ((s, dir) => {
      val nb = 64L
      val docs = Tables.documents(s, dir).select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tok"),
        Text.tokHashS(col("doc_id").cast("string")).as("h"))
        .withColumn("bkt", expr(s"h div ${(1L << 32) / nb}"))
      val wIn = Window.partitionBy(col("bkt")).orderBy(col("h"), col("doc_id"))
      val inner = docs.withColumn("cum_in", sum(col("n_tok")).over(wIn))
      // ≤64 bucket totals; their running total is a 64-row window, then
      // broadcast back — no corpus-global single-partition stage.
      val offs = docs.groupBy("bkt").agg(sum(col("n_tok")).as("tot"))
        .withColumn("off", coalesce(sum(col("tot")).over(
          Window.orderBy(col("bkt"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select(col("bkt"), col("off"))
      inner.join(broadcast(offs), Seq("bkt"))
        .withColumn("shard", expr(s"(off + cum_in - n_tok) div $SHARD_TOKENS"))
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("tok_total"))
        .orderBy("shard")
    }),

    "text_bpe_train" -> ((s, dir) => {
      import s.implicits._
      // ONE corpus-sized shuffle; everything after runs over this
      // Heaps-bounded table (production: a fingerprint-keyed artifact).
      val vocab = Tables.documents(s, dir)
        .select(explode(split(col("text"), " ")).as("tok"))
        .where(length(col("tok")) > 0)
        .groupBy("tok").agg(count(lit(1)).as("freq"))
        .persist()
      try {
        val learned = scala.collection.mutable.ArrayBuffer
          .empty[(Int, String, String, Long)]
        for (i <- 1 to BPE_TRAIN_ROUNDS) {
          // re-segment from scratch with the learned-so-far cascade
          // (6 passes/rule: fixpoint for any fixture-length run) —
          // flat lineage, codegen'd end to end.
          val chain = learned.iterator.map(m => (m._2, m._3)).toSeq
            .flatMap(m => Seq.fill(6)(m))
            .foldLeft("' ' || regexp_replace(tok, '(.)', '$1 ')") {
              case (acc, (l, r)) => s"replace($acc, ' $l $r ', ' $l$r ')"
            }
          val top = vocab
            .select(col("freq"), split(expr(s"trim($chain)"), " ").as("a"))
            .where(size(col("a")) >= 2)
            .select(col("freq"), explode(expr(
              """transform(sequence(1, size(a) - 1),
                |  i -> struct(element_at(a, i) AS l,
                |              element_at(a, i + 1) AS r))""".stripMargin))
              .as("p"))
            .groupBy(col("p.l").as("l"), col("p.r").as("r"))
            .agg(sum(col("freq")).as("cnt"))
            .orderBy(col("cnt").desc, col("l"), col("r"))
            .limit(1)
            .collect() // 1-row bounded driver artifact per round
          if (top.nonEmpty)
            learned += ((i, top(0).getString(0), top(0).getString(1),
              top(0).getLong(2)))
        }
        learned.toSeq
          .toDF("rank", "left_sym", "right_sym", "pair_count")
          .withColumn("merged", concat(col("left_sym"), col("right_sym")))
          .select("rank", "left_sym", "right_sym", "merged", "pair_count")
          .orderBy("rank")
      } finally vocab.unpersist()
    }),

    "text_bpe_encode" -> ((s, dir) => {
      Tables.documents(s, dir).createOrReplaceTempView("documents")
      // Spark regexp_replace is global and uses $1 groups; the DuckDB
      // twin spells the same char split with \1 + the 'g' flag.
      val chain = bpeChain("' ' || regexp_replace(tok, '(.)', '$1 ')")
      s.sql(
        s"""SELECT tok, bpe,
           |       cast(size(split(bpe, ' ')) AS bigint) AS n_units
           |FROM (SELECT tok, trim($chain) AS bpe
           |      FROM (SELECT DISTINCT explode(split(text, ' ')) AS tok
           |            FROM documents))
           |ORDER BY tok""".stripMargin)
    })
  )

  val oracleSql: Map[String, String] = Map(
    "text_source_caps" ->
      s"""WITH q AS (SELECT doc_id, source, ${Text.qualityScoreD} AS quality
         |           FROM documents),
         |r AS (SELECT doc_id, source, quality,
         |             ROW_NUMBER() OVER (PARTITION BY source
         |                                ORDER BY quality DESC, doc_id) AS rn
         |      FROM q)
         |SELECT doc_id, source, quality, rn FROM r
         |WHERE rn <= $SOURCE_CAP ORDER BY doc_id""".stripMargin,

    "sample_neyman" ->
      s"""WITH d AS (SELECT doc_id, lang,
         |             CAST(floor(${Text.qualityScoreD} * 100 + 0.5) AS BIGINT) AS q2
         |           FROM documents),
         |st AS (SELECT lang, COUNT(*) AS n_h, SUM(q2) AS s1, SUM(q2*q2) AS s2
         |       FROM d GROUP BY lang),
         |a AS (SELECT lang,
         |        CAST(floor(sqrt(CAST((n_h * s2 - s1 * s1)
         |             // greatest(n_h - 1, 1) AS DOUBLE))) AS BIGINT) AS w_h
         |      FROM st),
         |al AS (SELECT lang,
         |         ($NEYMAN_TOTAL * w_h)
         |           // (SELECT CAST(SUM(w_h) AS BIGINT) FROM a) AS quota
         |       FROM a),
         |r AS (SELECT d.doc_id, d.lang, al.quota,
         |        ROW_NUMBER() OVER (PARTITION BY d.lang
         |          ORDER BY ${Text.tokHashDOn("CAST(d.doc_id AS VARCHAR)")}, d.doc_id) AS rn
         |      FROM d JOIN al USING (lang))
         |SELECT doc_id, lang, quota, rn FROM r WHERE rn <= quota
         |ORDER BY doc_id""".stripMargin,

    "pipeline_shard_sized" ->
      s"""WITH d AS (SELECT doc_id,
         |             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
         |             ${Text.tokHashDOn("CAST(doc_id AS VARCHAR)")} AS h
         |           FROM documents),
         |c AS (SELECT doc_id, n_tok,
         |        CAST(SUM(n_tok) OVER (ORDER BY h, doc_id
         |                              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
         |      FROM d)
         |SELECT (cum - n_tok) // $SHARD_TOKENS AS shard,
         |       COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS tok_total
         |FROM c GROUP BY 1 ORDER BY shard""".stripMargin,

    "text_bpe_encode" -> {
      val chainD = bpeChain("' ' || regexp_replace(tok, '(.)', '\\1 ', 'g')")
      s"""WITH v AS (SELECT DISTINCT unnest(string_split(text, ' ')) AS tok
         |           FROM documents),
         |e AS (SELECT tok, trim($chainD) AS bpe FROM v)
         |SELECT tok, bpe, CAST(len(string_split(bpe, ' ')) AS BIGINT) AS n_units
         |FROM e ORDER BY tok""".stripMargin
    }
  )
}
