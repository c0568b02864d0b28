package graft.llm

import graft.{QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Second text-pipeline pack (round 3): PII scrubbing, Gopher-style
  * repetition quality filters, and training-sequence packing — the
  * curation steps between "documents" and "token stream" in an LLM data
  * pipeline. All built-in codegen expressions; the only shuffles are the
  * per-doc token aggregation (gopher) and the per-shard window (pack).
  */
object Text2 extends QueryPack {

  // --- PII scrubbing -------------------------------------------------
  // Fixture text contains no PII by construction, so the key first
  // plants deterministic synthetic PII (email/phone/IPv4 derived from
  // doc_id — same construction in the oracle), then runs the real
  // redaction pipeline: count + regexp-replace with typed placeholders.
  // The regexes are RE2-safe (work unchanged in Java regex and DuckDB).
  private val emailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  private val phoneRe = "\\+?[0-9]{1,2}-[0-9]{3}-[0-9]{4}"
  private val ipRe = "([0-9]{1,3}\\.){3}[0-9]{1,3}"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_pii_scrub" -> ((s, dir) => {
      val dirty = concat(
        substring(col("text"), 1, 40),
        lit(" contact user"), col("doc_id").cast("string"), lit("@example.com or "),
        lit("+1-555-"), lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
        lit(" from 10.0."), (col("doc_id") % 256).cast("string"),
        lit("."), ((col("doc_id") * 7) % 256).cast("string"))
      // email first (its local part would otherwise survive inside the
      // host match), then phone, then IP — placeholders contain no
      // digits, so later patterns can't re-match replaced spans
      val scrubbed = regexp_replace(
        regexp_replace(
          regexp_replace(dirty, emailRe, "<EMAIL>"),
          phoneRe, "<PHONE>"),
        ipRe, "<IP>")
      Tables.documents(s, dir).select(
        col("doc_id"),
        regexp_count(dirty, lit(emailRe)).cast("long").as("n_emails"),
        regexp_count(dirty, lit(phoneRe)).cast("long").as("n_phones"),
        regexp_count(dirty, lit(ipRe)).cast("long").as("n_ips"),
        md5(scrubbed).as("scrub_hash"))
        .orderBy("doc_id")
    }),

    // Gopher-style repetition/quality signals per doc: duplicate-token
    // fraction, duplicate-bigram fraction, most-frequent-token share,
    // mean word length, and the composite keep flag. Token/bigram
    // dedup is MAP-SIDE (array_distinct over the token array); only the
    // top-token share needs a per-doc aggregation shuffle.
    "text_gopher_quality" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val toks = split(col("text"), " ")
      val bigrams = filter(
        transform(toks, (t, i) => concat_ws(" ", t, try_element_at(toks, i + 2))),
        (_, i) => i < size(toks) - 1)
      val base = docs.select(
        col("doc_id"),
        size(toks).cast("double").as("n_tok"),
        size(array_distinct(toks)).cast("double").as("n_uniq"),
        size(bigrams).cast("double").as("n_big"),
        size(array_distinct(bigrams)).cast("double").as("u_big"),
        length(col("text")).cast("double").as("n_chars"))
      val top = docs
        .select(col("doc_id"), explode(toks).as("tok"))
        .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
        .groupBy("doc_id").agg(max(col("c")).cast("double").as("top_c"))
      // +1e-9 before round: these rationals can land on .xxxx5
      // boundaries where Spark's exact HALF_UP and DuckDB's
      // epsilon-compensated round disagree (SURVEY §7.5)
      val fracDup = lit(1.0) - col("n_uniq") / col("n_tok")
      val fracDupBig = lit(1.0) - col("u_big") / col("n_big")
      val topShare = col("top_c") / col("n_tok")
      val meanWl = (col("n_chars") - (col("n_tok") - 1)) / col("n_tok")
      base.join(top, Seq("doc_id"))
        .select(
          col("doc_id"),
          round(fracDup + 1e-9, 4).as("frac_dup_tok"),
          // <2-token doc has no bigrams: 0/0 would be NaN here while the
          // oracle's inner join dropped the row (ADVICE r03) — define
          // frac_dup_bigram = 0.0 and LEFT JOIN + COALESCE in the oracle
          when(col("n_big") === 0, lit(0.0))
            .otherwise(round(fracDupBig + 1e-9, 4)).as("frac_dup_bigram"),
          round(topShare + 1e-9, 4).as("top_tok_share"),
          round(meanWl + 1e-9, 4).as("mean_word_len"),
          (fracDup <= 0.75 && topShare <= 0.1 &&
            meanWl >= 3.0 && meanWl <= 10.0).as("keep"))
        .orderBy("doc_id")
    }),

    // Training-sequence packing: stream docs (ordered by doc_id) into
    // fixed 2048-token sequences per (lang, source) shard — the layout
    // step that turns a curated corpus into trainer-shaped rows. One
    // window per shard; at 100 TB the shard key IS the distribution key
    // (add hash buckets to the partitionBy for hot shards), so no
    // global ordering is ever needed.
    "text_pack_sequences" -> ((s, dir) => {
      val w = Window.partitionBy(col("lang"), col("source")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"), col("source"),
          size(split(col("text"), " ")).cast("long").as("n_tok"))
        .withColumn("cum_before", coalesce(sum(col("n_tok")).over(w), lit(0L)))
        .select(col("doc_id"), col("lang"), col("source"), col("n_tok"),
          expr("cum_before div 2048").as("seq_id"),
          (col("cum_before") % 2048).as("seq_offset"))
        .orderBy("doc_id")
    }),

    // Packing-efficiency census (round 13, completing the packing
    // family: sequences → bucketed → bpe → report): per (lang, source)
    // shard, the sequences the 2048-slot packer produces, the padding
    // wasted in each shard's final partial sequence, and the fill
    // ratio — the number a trainer owner reads before switching
    // packing granularity (whitespace vs BPE ids) or shard keying.
    // Derived in closed form from the SAME n_tok definition the packer
    // uses (docs pack contiguously, so a shard of T tokens fills
    // exactly ⌈T/2048⌉ sequences): one ≤|lang×source|-group census
    // with map-side partials, no window.
    "text_pack_report" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(col("lang"), col("source"),
          size(split(col("text"), " ")).cast("long").as("n_tok"))
        .groupBy("lang", "source")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
        .withColumn("n_seqs", expr("(n_tokens + 2047) div 2048"))
        .withColumn("pad_waste", col("n_seqs") * 2048 - col("n_tokens"))
        .withColumn("fill_ratio",
          round(col("n_tokens").cast("double") / (col("n_seqs") * 2048), 6))
        .orderBy("lang", "source")),

    // Hot-shard variant (VERDICT r03 item 8): a skewed shard (one lang
    // dominating the corpus) makes the per-shard window a single-task
    // straggler; adding a deterministic hash bucket to the partition key
    // caps any window's row count at shard/8 while keeping the packing
    // semantics sequential WITHIN each (shard, bucket) — trainer
    // sequences never mix buckets, so the output contract (fixed 2048
    // slots per seq_id) is unchanged, just keyed one level finer. The
    // bucket is doc_id % 8 (engine-portable; a murmur hash would do the
    // same job but has no DuckDB twin).
    "text_pack_bucketed" -> ((s, dir) => {
      val w = Window
        .partitionBy(col("lang"), col("source"), col("bucket"))
        .orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"), col("source"),
          (col("doc_id") % 8).as("bucket"),
          size(split(col("text"), " ")).cast("long").as("n_tok"))
        .withColumn("cum_before", coalesce(sum(col("n_tok")).over(w), lit(0L)))
        .select(col("doc_id"), col("lang"), col("source"), col("bucket"),
          col("n_tok"),
          expr("cum_before div 2048").as("seq_id"),
          (col("cum_before") % 2048).as("seq_offset"))
        .orderBy("doc_id")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "text_pii_scrub" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    substring(text, 1, 40) || ' contact user' || CAST(doc_id AS VARCHAR)
        |      || '@example.com or +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
        |      || ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR)
        |      || '.' || CAST((doc_id * 7) % 256 AS VARCHAR) AS dirty
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(dirty, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(dirty, '\+?[0-9]{1,2}-[0-9]{3}-[0-9]{4}')) AS BIGINT) AS n_phones,
        |  CAST(len(regexp_extract_all(dirty, '([0-9]{1,3}\.){3}[0-9]{1,3}')) AS BIGINT) AS n_ips,
        |  md5(regexp_replace(regexp_replace(regexp_replace(dirty,
        |        '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
        |        '\+?[0-9]{1,2}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g'),
        |        '([0-9]{1,3}\.){3}[0-9]{1,3}', '<IP>', 'g')) AS scrub_hash
        |FROM d ORDER BY doc_id""".stripMargin,

    "text_gopher_quality" ->
      """WITH t AS (
        |  SELECT doc_id, generate_subscripts(string_split(text,' '),1) AS pos,
        |         unnest(string_split(text,' ')) AS tok
        |  FROM documents),
        |bg AS (
        |  SELECT doc_id, tok || ' ' || lead(tok) OVER w AS bg
        |  FROM t WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
        |  QUALIFY lead(tok) OVER w IS NOT NULL),
        |bs AS (SELECT doc_id, CAST(COUNT(*) AS DOUBLE) AS n_big,
        |              CAST(COUNT(DISTINCT bg) AS DOUBLE) AS u_big
        |       FROM bg GROUP BY doc_id),
        |tc AS (SELECT doc_id, tok, COUNT(*) AS c FROM t GROUP BY 1, 2),
        |ts AS (SELECT doc_id, CAST(MAX(c) AS DOUBLE) AS top_c,
        |              CAST(SUM(c) AS DOUBLE) AS n_tok,
        |              CAST(COUNT(*) AS DOUBLE) AS n_uniq
        |       FROM tc GROUP BY doc_id),
        |d AS (SELECT doc_id, CAST(length(text) AS DOUBLE) AS n_chars FROM documents)
        |SELECT d.doc_id,
        |  ROUND(1.0 - n_uniq / n_tok + 0.000000001, 4) AS frac_dup_tok,
        |  COALESCE(ROUND(1.0 - u_big / n_big + 0.000000001, 4), 0.0) AS frac_dup_bigram,
        |  ROUND(top_c / n_tok + 0.000000001, 4) AS top_tok_share,
        |  ROUND((n_chars - (n_tok - 1)) / n_tok + 0.000000001, 4) AS mean_word_len,
        |  ((1.0 - n_uniq / n_tok) <= 0.75 AND (top_c / n_tok) <= 0.1
        |    AND (n_chars - (n_tok - 1)) / n_tok >= 3.0
        |    AND (n_chars - (n_tok - 1)) / n_tok <= 10.0) AS keep
        |FROM d JOIN ts ON ts.doc_id = d.doc_id
        |       LEFT JOIN bs ON bs.doc_id = d.doc_id
        |ORDER BY d.doc_id""".stripMargin,

    "text_pack_sequences" ->
      """WITH d AS (
        |  SELECT doc_id, lang, source,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, lang, source, n_tok,
        |    CAST(COALESCE(SUM(n_tok) OVER (PARTITION BY lang, source ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
        |  FROM d)
        |SELECT doc_id, lang, source, n_tok,
        |  cum_before // 2048 AS seq_id,
        |  cum_before % 2048 AS seq_offset
        |FROM c ORDER BY doc_id""".stripMargin,

    "text_pack_report" ->
      """WITH d AS (
        |  SELECT lang, source,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        |  FROM documents),
        |g AS (
        |  SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |         CAST(SUM(n_tok) AS BIGINT) AS n_tokens
        |  FROM d GROUP BY lang, source),
        |r AS (
        |  SELECT *, (n_tokens + 2047) // 2048 AS n_seqs FROM g)
        |SELECT lang, source, n_docs, n_tokens, n_seqs,
        |  n_seqs * 2048 - n_tokens AS pad_waste,
        |  round(CAST(n_tokens AS DOUBLE) / (n_seqs * 2048), 6) AS fill_ratio
        |FROM r ORDER BY lang, source""".stripMargin,

    "text_pack_bucketed" ->
      """WITH d AS (
        |  SELECT doc_id, lang, source, doc_id % 8 AS bucket,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, lang, source, bucket, n_tok,
        |    CAST(COALESCE(SUM(n_tok) OVER (PARTITION BY lang, source, bucket
        |      ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
        |  FROM d)
        |SELECT doc_id, lang, source, bucket, n_tok,
        |  cum_before // 2048 AS seq_id,
        |  cum_before % 2048 AS seq_offset
        |FROM c ORDER BY doc_id""".stripMargin
  )
}
