package graft.streaming

import graft.{QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming operators, judged through their batch twins (SURVEY.md
  * §2.10): the same Pipeline transform is executed in batch mode here
  * (DuckDB-oracle-checkable) and in streaming mode in StreamSpec, which
  * asserts stream(AvailableNow) == batch on identical input. Watermark
  * semantics (late-data drop) have no batch twin — covered only by the
  * MemoryStream test.
  */
object Streams extends QueryPack {

  /** The redelivery loop's final-disposition ledger, persisted
    * fingerprint-keyed (round 10 — the editPairsTable discipline):
    * THREE keys consume the same loop output (stream_redelivery, the
    * DLQ age-out's dead-letter slice, the backoff ladder's clock
    * shift), and at a broker this table IS the subscription's
    * acknowledgment/DLQ ledger — written once by the dispatch loop,
    * read by every report, never recomputed per query. The loop
    * definition stays Pipeline.redeliver (the StreamSpec stream ==
    * batch gates compare against it directly). */
  private def redeliverTable(s: SparkSession, dir: String): String = {
    val pfx = s"redeliver_${Tables.pathKey(dir)}_"
    val t = s"$pfx${Tables.pathKey(Tables.fingerprint(dir, "events"))}"
    if (!s.catalog.tableExists(t)) {
      Tables.dropStaleTables(s, pfx)
      Pipeline.redeliver(Tables.events(s, dir))
        .write.mode("overwrite").format("parquet").saveAsTable(t)
    }
    t
  }

  /** Write-once topics layout: the events corpus laid out as a topic
    * directory tree (`topic=topic_<event_type>/…`, partitioned
    * parquet) — the offline stand-in for a namespace's topic list. A
    * topic-pattern subscription then becomes PARTITION PRUNING on the
    * regex over the topic column: the non-matching topics' files are
    * never opened, exactly as a broker's pattern consumer never
    * subscribes them. Built once per (dir, events fingerprint). */
  private[streaming] def topicsLayout(s: SparkSession, dir: String): String = {
    val pfx = s"graft_topics_${Tables.pathKey(dir)}_"
    val path =
      s"/tmp/$pfx${Tables.pathKey(Tables.fingerprint(dir, "events"))}"
    if (!java.nio.file.Files.isDirectory(java.nio.file.Paths.get(path))) {
      Tables.dropStalePaths(pfx)
      Tables.events(s, dir)
        .withColumn("topic", concat(lit("topic_"), col("event_type")))
        .write.mode("overwrite").partitionBy("topic").parquet(path)
    }
    path
  }

  /** The fixture topic-pattern (Pulsar `consumerPattern`): matches
    * topic_click and topic_view, excludes the other three topics. */
  private[graft] val topicPattern = "^topic_(click|view)$"

  /** Subscription message-TTL (`ttlDurationDefaultInSeconds` = 7 days
    * of event time): unacked messages older than now − TTL are
    * auto-acked and the cursor jumps past them. */
  private[streaming] val msgTtl = "INTERVAL 7 DAYS"

  /** The fixture subscription-cursor table (shared by obs_sub_backlog
    * and stream_msg_expiry — the detect→remedy discipline: the expiry
    * key must move exactly the cursors the backlog report reads).
    * Cursors are fixed fractions of the max position: fast (0.9),
    * lagging (0.5), paused (acked nothing → before-first −1), and
    * caught-up (at max — backlog 0). 1-row max, 4-row local relation;
    * always broadcast-sized. */
  private[streaming] def subCursors(ev: DataFrame): DataFrame = {
    val s = ev.sparkSession
    import s.implicits._
    val mx = ev.agg(max(col("event_id")).as("m"))
    Seq(("sub_fast", 0.9), ("sub_slow", 0.5), ("sub_paused", 0.0),
        ("sub_caughtup", 1.0))
      .toDF("subscription", "f")
      .crossJoin(broadcast(mx))
      .select(col("subscription"),
        when(col("f") === 0.0, lit(-1L))
          .otherwise(floor(col("m") * col("f")).cast("long"))
          .as("ack_pos"))
  }

  /** Per-subscription backlog aggregate over a cursor table: one corpus
    * scan through a broadcast inequality join (each message tests the
    * ≤4 cursors map-side — no corpus-keyed shuffle), grouped to one row
    * per subscription WITH backlog. Subscriptions with zero backlog
    * produce no group here — the report key restores them via the
    * right-outer join onto the cursor table. */
  private[streaming] def backlogReport(ev: DataFrame, cur: DataFrame): DataFrame =
    ev.join(broadcast(cur), col("event_id") > col("ack_pos"))
      .groupBy("subscription", "ack_pos")
      .agg(count(lit(1)).as("backlog"),
        date_format(min_by(col("ts"), col("event_id")),
          "yyyy-MM-dd HH:mm:ss").as("oldest_ts_s"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_tumbling" -> ((s, dir) =>
      Pipeline.tumbling(Tables.events(s, dir)).orderBy("ws", "event_type")),

    "stream_sliding" -> ((s, dir) =>
      Pipeline.sliding(Tables.events(s, dir)).orderBy("ws")),

    "stream_session" -> ((s, dir) =>
      Pipeline.sessions(Tables.events(s, dir)).orderBy("user_id", "session_start")),

    "stream_dedup" -> ((s, dir) =>
      Pipeline.firstPerKey(Tables.events(s, dir)).orderBy("user_id", "event_type")),

    // broker topic compaction: latest message per key (see
    // Pipeline.compactLatest); stream==batch in StreamSpec
    "stream_topic_compaction" -> ((s, dir) =>
      Pipeline.compactLatest(Tables.events(s, dir)).orderBy("user_id", "event_type")),

    "stream_static_join" -> ((s, dir) =>
      Pipeline.enrich(Tables.events(s, dir), Tables.customer(s, dir))
        .orderBy("event_id")),

    "stream_filter_pipeline" -> ((s, dir) =>
      Pipeline.filterPipeline(Tables.events(s, dir), Tables.customer(s, dir))
        .orderBy("ws", "event_type")),

    // stream-stream interval join, judged via its batch form; the
    // watermarked two-stream execution is verified in StreamSpec
    "stream_stream_join" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      Pipeline.purchaseClickJoin(
        ev.where(col("event_type") === "purchase"),
        ev.where(col("event_type") === "click"))
        .orderBy("p_id", "c_id")
    }),

    // stream-stream LEFT OUTER interval join (attribution shape):
    // judged via the batch twin restricted to the closed-form final
    // watermark — a terminated stream emits a null row for an
    // unmatched purchase only once the watermark passed its match
    // window (min(max per-side event time) − 2 h). The watermarked
    // two-stream execution, including a crafted-late-row null-emission
    // case, is verified in StreamSpec.
    "stream_stream_outer" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      Pipeline.purchaseClickOuterBatch(
        ev.where(col("event_type") === "purchase"),
        ev.where(col("event_type") === "click"))
        // null c_id rows sort FIRST on both engines (Spark asc default)
        .orderBy(col("p_id"), col("c_id").asc_nulls_first)
    }),

    // FULL outer interval join: both sides emit watermark-gated nulls
    // (unmatched purchases AND unmatched clicks) — the recompute-free
    // attribution ledger. Same closed-form final-watermark batch twin,
    // applied per side; the streaming execution is verified in
    // StreamSpec.
    "stream_stream_outer_full" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      Pipeline.purchaseClickFullOuterBatch(
        ev.where(col("event_type") === "purchase"),
        ev.where(col("event_type") === "click"))
        .orderBy(col("p_id").asc_nulls_first, col("c_id").asc_nulls_first)
    }),

    // Per-user running profile through the Spark 4 transformWithState
    // API (state v2: named ValueState on RocksDB) — judged via this
    // batch form; StreamSpec drives the REAL StatefulProcessor
    // (StateV2.profileStream) through a multi-batch run and a
    // truncated-commit restart and asserts final state == this twin.
    // The profile is order-independent (count + max) by design, so
    // micro-batch boundaries cannot show through. TTL and timers are
    // covered by the SIBLINGS, not this key: stream_session_timeout
    // exercises event-time timers (registerTimer /
    // handleExpiredTimer), and StreamSpec's TTL test exercises
    // TTLConfig expiry on this same processor shape.
    "stream_state_profile" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"), max(col("value")).as("max_value"))
        .orderBy("user_id")),

    // Session timeout via transformWithState event-time TIMERS
    // (VERDICT r08 item 3): per-user session state; a key idle past
    // the gap is EVICTED by its timer when the watermark passes
    // last_event + gap — the canonical session-timeout /
    // state-eviction shape. Judged via the gaps-and-islands closed
    // form gated on the final watermark (Pipeline.sessionTimeoutBatch,
    // fully oracle-checked); StreamSpec drives StateV2.sessionStream
    // (the real SessionProcessor with registerTimer /
    // handleExpiredTimer on RocksDB) multi-batch and asserts
    // stream == this twin, including a crafted idle key that only a
    // firing timer can emit.
    "stream_session_timeout" -> ((s, dir) =>
      Pipeline.sessionTimeoutBatch(Tables.events(s, dir))
        .orderBy("user_id", "sess_start")),

    // multi-source fan-in: two filtered streams unioned into one
    // windowed aggregate, judged via the batch form; the two-file-stream
    // execution is verified in StreamSpec
    "stream_union" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      Pipeline.unionCounts(
        ev.where(col("event_type") === "purchase"),
        ev.where(col("event_type") === "click"))
        .orderBy("ws", "event_type")
    }),

    // bloom-gated enrichment, judged via the batch form (the oracle is
    // the PLAIN join — the probe must never change results); the
    // streaming execution is verified in StreamSpec
    "stream_bloom_enrich" -> ((s, dir) => {
      val dim = Tables.customer(s, dir)
        .where(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"), col("c_mktsegment"))
      val bf = graft.functions.BloomMightContain.buildFor(dim, "c_custkey")
      Pipeline.bloomEnrich(Tables.events(s, dir), dim, bf)
        .orderBy("ws", "c_mktsegment")
    }),

    // Subscription backlog report (round 10 — the `pulsar-admin topics
    // stats` surface): per subscription, the ack position (cursor),
    // the backlog (messages at positions past it), and the OLDEST
    // unacked message's publish time (min position past the cursor —
    // min_by, not min ts: backlog age is a position property, the
    // metric alerting keys on). Fixture cursors = fixed fractions of
    // the max position (a fast, a lagging, a paused, and a CAUGHT-UP
    // subscription — the paused one has acked NOTHING, so its cursor is
    // the before-first position −1 and its backlog is the WHOLE topic,
    // message 0 included; the caught-up one sits AT the max position,
    // so it must still appear with backlog 0 and a null oldest —
    // `pulsar-admin topics stats` reports msgBacklog: 0, it doesn't
    // drop the row (ADVICE r10: the inner inequality join silently
    // lost it)). Shape: a 1-row max, a 4-row broadcast cursor table,
    // ONE corpus scan through a broadcast inequality join (each
    // message tests 4 cursors map-side, no corpus-keyed shuffle), a
    // 4-group aggregate, then the ≤4-row aggregate broadcast back onto
    // the cursor table (right outer) so every subscription reports —
    // flat at any SF.
    "obs_sub_backlog" -> ((s, dir) => {
      val agg = Streams.backlogReport(Tables.events(s, dir),
        Streams.subCursors(Tables.events(s, dir)))
      broadcast(agg)
        .join(Streams.subCursors(Tables.events(s, dir)),
          Seq("subscription", "ack_pos"), "right_outer")
        .select(col("subscription"), col("ack_pos"),
          coalesce(col("backlog"), lit(0L)).as("backlog"), col("oldest_ts_s"))
        .orderBy("subscription")
    }),

    // Pulsar cursor seek/replay (VERDICT r09 item 3): both seek forms —
    // seek(timestamp) resolves the cursor to the earliest publish
    // position at-or-after the target then replays by position
    // (MessageSource.seekCursorByTime/seekReplay), seek(messageId) is
    // a literal position floor whose predicate pushes into the scan.
    // The streaming form — a replay source with the cursor applied,
    // plus a truncated-checkpoint re-replay proving idempotent
    // delivery — is verified in StreamSpec.
    "source_seek_replay" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      def proj(mode: String, df: DataFrame) = df.select(
        lit(mode).as("mode"), col("event_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_s"),
        col("event_type"))
      proj("by_time", MessageSource.seekReplay(ev,
          MessageSource.seekCursorByTime(ev, MessageSource.seekTs)))
        .unionByName(proj("by_id",
          ev.where(col("event_id") >= MessageSource.seekMsgId)))
        .orderBy("mode", "event_id")
    }),

    // Producer effectively-once dedup (VERDICT r10 item 2 — the PIP-6
    // broker guarantee): the broker keeps one high-watermark sequence
    // id per producer and drops any arrival at or below it (resends,
    // late-lower-seq). Fixture: producer = user_id mod 8, seq = the
    // per-producer publish rank with every 5th message retransmitting
    // rank − 2 (Pipeline.producerSeqFixture). Output = the PERSISTED
    // messages. Shape: one shuffle on producer + a per-producer sorted
    // scan (two windows share the partitioning) — the broker's own
    // per-producer sequential check; the streaming form holds the
    // watermark in a ValueState (StateV2.producerDedupStream,
    // stream == batch + checkpoint restart in StreamSpec).
    "stream_producer_dedup" -> ((s, dir) =>
      Pipeline.producerDedupBatch(
          Pipeline.producerSeqFixture(Tables.events(s, dir)))
        .orderBy("producer_id", "seq_id")),

    // Subscription message-TTL auto-ack expiry (VERDICT r10 item 4 —
    // `ttlDurationDefaultInSeconds`): messages older than now − TTL
    // (now = corpus max ts, the drained-stream clock) are auto-acked,
    // so each cursor jumps to max(ack_pos, expiry position) where the
    // expiry position is the NEWEST position published at-or-before
    // the cutoff (the broker's findNewestMatching — positional, like
    // seek-by-time: everything at earlier positions is acked with it).
    // Composes with obs_sub_backlog BY CONSTRUCTION: the same
    // subCursors fixture moves and the same backlogReport definition
    // re-reads the moved cursors (detect→remedy discipline — the
    // backlog/oldest columns here ARE the post-expiry backlog report).
    // Shape: 1-row cutoff + 1-row expiry position (pushed ts filter),
    // two broadcast inequality passes over the corpus, ≤4-row joins.
    "stream_msg_expiry" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val cutoff = ev.agg((date_trunc("second", max(col("ts")))
        - expr(Streams.msgTtl)).as("cutoff"))
      val xp = ev.select(col("event_id"),
          date_trunc("second", col("ts")).as("tss"))
        .crossJoin(broadcast(cutoff))
        .where(col("tss") <= col("cutoff"))
        .agg(coalesce(max(col("event_id")), lit(-1L)).as("expiry_pos"))
      // ≤4 rows, localCheckpoint-pinned: three consumers read it (the
      // expiry count, the post-expiry backlog report, the final join) —
      // without the pin each re-derives the max/cutoff/expiry corpus
      // aggregates (observed 3× in the unpinned plan)
      val moved = Streams.subCursors(ev).crossJoin(broadcast(xp))
        .select(col("subscription"), col("ack_pos"),
          greatest(col("ack_pos"), col("expiry_pos")).as("new_ack_pos"))
        .localCheckpoint()
      val nexp = ev.join(broadcast(moved),
          col("event_id") > col("ack_pos") &&
            col("event_id") <= col("new_ack_pos"))
        .groupBy("subscription").agg(count(lit(1)).as("n_expired"))
      val after = Streams.backlogReport(ev,
        moved.select(col("subscription"), col("new_ack_pos").as("ack_pos")))
        .select(col("subscription"), col("backlog"), col("oldest_ts_s"))
      moved
        .join(broadcast(nexp), Seq("subscription"), "left")
        .join(broadcast(after), Seq("subscription"), "left")
        .select(col("subscription"), col("ack_pos"), col("new_ack_pos"),
          coalesce(col("n_expired"), lit(0L)).as("n_expired"),
          coalesce(col("backlog"), lit(0L)).as("backlog"),
          col("oldest_ts_s"))
        .orderBy("subscription")
    }),

    // Topic-pattern subscription (VERDICT r10 item 5 — Pulsar's regex
    // `consumerPattern` with dynamic topic discovery): the namespace's
    // topics are a partitioned directory layout (topicsLayout) and the
    // regex subscription is a PARTITION-PRUNED scan — non-matching
    // topics' files are never opened, exactly as the pattern consumer
    // never subscribes them; the per-topic provenance column is the
    // partition column itself. Output: per-topic hourly counts. The
    // streaming form — a file stream over the same layout, where a
    // topic directory appearing BETWEEN batches is discovered and
    // consumed exactly once — is verified in StreamSpec.
    "source_topic_pattern" -> ((s, dir) =>
      s.read.parquet(Streams.topicsLayout(s, dir))
        .where(col("topic").rlike(Streams.topicPattern))
        .withColumn("ts_sec", date_trunc("second", col("ts")))
        .groupBy(col("topic"), window(col("ts_sec"), "1 hour").as("w"))
        .agg(count(lit(1)).as("n"))
        .select(col("topic"), unix_timestamp(col("w.start")).as("ws"),
          col("n"))
        .orderBy("topic", "ws")),

    // PIP-105 redelivery: final disposition + attempt count per message
    // after the RESCHEDULE/redeliver loop (delivery-count-aware routing,
    // dead-letter after maxDeliveries). Judged via the batch twin
    // (closed-form oracle below); the actual file-source re-enqueue
    // loop is verified stream==batch in StreamSpec.
    "stream_redelivery" -> ((s, dir) =>
      s.table(redeliverTable(s, dir)).orderBy("event_id")),

    // Exponential nack backoff (VERDICT r09 item 4): the redelivery
    // ladder with a deliver-at shift of base·2^(attempt−1) per nack —
    // final disposition, attempts, and the final attempt's visible
    // clock, gated on the final watermark (a ladder still climbing
    // past the corpus clock has emitted nothing). Judged via the batch
    // closed form; the accumulating re-enqueue loop is verified
    // stream==batch on a crafted multi-batch corpus in StreamSpec.
    "stream_redelivery_backoff" -> ((s, dir) =>
      Pipeline.redeliverBackoffFrom(s.table(redeliverTable(s, dir)),
          Tables.events(s, dir))
        .orderBy("event_id")),

    // DLQ TTL age-out (VERDICT r05 item 7): dead letters retained for a
    // 5-day event-time TTL, then evicted — per-hour eviction records
    // (window start + count). Judged via the batch twin's final-
    // watermark closed form; the streaming form (the watermark IS the
    // TTL clock, append-mode windows emit on expiry) is verified
    // stream==batch in StreamSpec.
    "stream_dlq_ageout" -> ((s, dir) =>
      Pipeline.dlqAgeOutBatch(
        Pipeline.deadLettersFrom(s.table(redeliverTable(s, dir)),
          Tables.events(s, dir))).orderBy("ws")),

    // CDC latest-change view: newest change record per key INCLUDING
    // delete tombstones — the downstream-connector face of the
    // changelog (sink_cdc_apply is the applied-state twin). Judged via
    // the batch twin; the keyed-state streaming form
    // (flatMapGroupsWithState, one record of state per key) is
    // verified stream==batch across multiple micro-batches in
    // StreamSpec.
    "stream_cdc_apply" -> ((s, dir) =>
      Pipeline.cdcLatestBatch(Tables.events(s, dir)).orderBy("user_id")),

    // windowed top-k (top-3 users per 10-min window): the incremental
    // windowed count is the streaming state; the rank is post-
    // processing of that aggregate (chained streaming aggregations are
    // unsupported, and the production pattern — rank in foreachBatch /
    // over the sink table — doesn't want one). StreamSpec executes
    // exactly that split and asserts it equals this batch twin.
    "stream_window_topk" -> ((s, dir) =>
      Pipeline.topkOfCounts(Pipeline.windowUserCounts(Tables.events(s, dir)))
        .orderBy("ws", "rn")),

    // Pulsar delayed delivery (deliverAfter): a message is invisible
    // until its deliver-at time — 'error' backs off 15 min, 'signup'
    // 5 min, the rest deliver immediately. Judged via the batch twin
    // (windowed counts on the VISIBLE clock); the streaming form —
    // the watermark runs on deliver_at, so windows emit when the
    // delivery clock passes — is verified stream==batch in StreamSpec.
    "stream_delayed_delivery" -> ((s, dir) =>
      Pipeline.delayedCounts(Tables.events(s, dir)).orderBy("ws", "event_type")),

    // batch analog of the 10-minute watermark rule: an event is "late"
    // (dropped) if its event time is more than 10 minutes behind the
    // max event time already seen in arrival order (event_id). The
    // true state-store semantics (window finalization) are covered by
    // the MemoryStream test in StreamSpec.
    //
    // The running max is a global prefix scan, computed the distributed
    // way (round 1 used one unpartitioned Window — a single-task
    // scale-killer, VERDICT r01 item 7): (1) running max WITHIN each
    // event_id chunk (partitioned window), (2) prefix max OVER the
    // per-chunk maxima — the only ordered-unpartitioned step, but on
    // n/4096 summary rows, not the data — (3) broadcast-join the prior-
    // chunk max back and combine. Same semantics, no full-data global
    // window.
    "stream_watermark" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val chunked = Tables.events(s, dir)
        .withColumn("t", unix_timestamp(date_trunc("second", col("ts"))))
        .withColumn("chunk", floor(col("event_id") / 4096))
      val wIn = Window.partitionBy(col("chunk")).orderBy(col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wPrior = Window.orderBy(col("chunk"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val priorMax = chunked.groupBy("chunk").agg(max(col("t")).as("cmax"))
        .withColumn("prior", max(col("cmax")).over(wPrior))
        .select("chunk", "prior")
      chunked
        .withColumn("inmax", max(col("t")).over(wIn))
        .join(broadcast(priorMax), Seq("chunk"))
        // greatest() skips NULL (first chunk has no prior)
        .withColumn("runmax", greatest(col("inmax"), col("prior")))
        .where(col("t") >= col("runmax") - 600)
        .select(col("event_id"), col("user_id"), col("event_type"), col("t"))
        .orderBy("event_id")
    })
  )

  private val epochSec = "CAST(floor(epoch(date_trunc('second', ts))) AS BIGINT)"

  val oracleSql: Map[String, String] = Map(
    "stream_state_profile" ->
      """SELECT user_id, COUNT(*) AS n_events, MAX(value) AS max_value
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "stream_session_timeout" ->
      s"""WITH ev AS (
         |  SELECT user_id, event_id, $epochSec AS ts_s FROM events),
         |flg AS (
         |  SELECT user_id, event_id, ts_s,
         |    CASE WHEN lag(ts_s) OVER w IS NULL
         |           OR ts_s - lag(ts_s) OVER w > 600 THEN 1 ELSE 0 END AS is_new
         |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts_s, event_id)),
         |sess AS (
         |  SELECT user_id, ts_s,
         |    SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts_s, event_id
         |                      ROWS UNBOUNDED PRECEDING) AS sess_id
         |  FROM flg),
         |agg AS (
         |  SELECT user_id, sess_id,
         |    MIN(ts_s) AS sess_start, MAX(ts_s) AS sess_end,
         |    COUNT(*) AS n_events
         |  FROM sess GROUP BY user_id, sess_id),
         |mx AS (SELECT MAX(ts_s) AS max_s FROM ev),
         |lst AS (
         |  SELECT *, sess_id = MAX(sess_id) OVER (PARTITION BY user_id) AS is_last
         |  FROM agg)
         |SELECT user_id, sess_start, sess_end, n_events
         |FROM lst, mx
         |WHERE NOT is_last OR sess_end + 1200 <= max_s
         |ORDER BY user_id, sess_start""".stripMargin,

    "stream_cdc_apply" ->
      """WITH e AS (SELECT user_id, event_id,
        |  CAST(floor(epoch(date_trunc('second', ts))) AS BIGINT) AS last_t,
        |  ROUND(value, 2) AS last_value,
        |  CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op FROM events),
        |r AS (SELECT *, row_number() OVER
        |  (PARTITION BY user_id ORDER BY last_t DESC, event_id DESC) AS rn FROM e)
        |SELECT user_id, op, last_value, last_t
        |FROM r WHERE rn = 1 ORDER BY user_id""".stripMargin,

    "stream_tumbling" ->
      s"""SELECT ($epochSec // 300) * 300 AS ws, event_type, COUNT(*) AS n,
         |  CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS sum_value
         |FROM events GROUP BY 1, 2 ORDER BY ws, event_type""".stripMargin,

    "stream_sliding" ->
      s"""WITH b AS (
         |  SELECT ($epochSec // 300) * 300 AS ws FROM events
         |  UNION ALL
         |  SELECT ($epochSec // 300) * 300 - 300 AS ws FROM events)
         |SELECT ws, COUNT(*) AS n FROM b GROUP BY ws ORDER BY ws""".stripMargin,

    "stream_session" ->
      s"""WITH e AS (SELECT user_id, value, $epochSec AS t FROM events),
         |x AS (
         |  SELECT user_id, value, t,
         |    -- strictly greater: Spark session windows MERGE when they
         |    -- exactly meet (next.ts == prev.ts + gap), verified at sf0.1
         |    CASE WHEN lag(t) OVER w IS NULL
         |           OR t - lag(t) OVER w > 1800 THEN 1 ELSE 0 END AS new_s
         |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t)),
         |y AS (
         |  SELECT user_id, value, t,
         |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY t
         |                     ROWS UNBOUNDED PRECEDING) AS sid
         |  FROM x)
         |SELECT user_id, MIN(t) AS session_start, COUNT(*) AS n,
         |  CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS sum_value
         |FROM y GROUP BY user_id, sid ORDER BY user_id, session_start""".stripMargin,

    "stream_dedup" ->
      """SELECT user_id, event_type, event_id,
        |  strftime(date_trunc('second', ts), '%Y-%m-%d %H:%M:%S') AS ts_s
        |FROM events
        |QUALIFY row_number() OVER (PARTITION BY user_id, event_type
        |  ORDER BY date_trunc('second', ts), event_id) = 1
        |ORDER BY user_id, event_type""".stripMargin,

    "stream_topic_compaction" ->
      """SELECT user_id, event_type, event_id, value,
        |  strftime(date_trunc('second', ts), '%Y-%m-%d %H:%M:%S') AS ts_s
        |FROM events
        |QUALIFY row_number() OVER (PARTITION BY user_id, event_type
        |  ORDER BY date_trunc('second', ts) DESC, event_id DESC) = 1
        |ORDER BY user_id, event_type""".stripMargin,

    "stream_static_join" ->
      """SELECT event_id, user_id, event_type, c_name, c_mktsegment
        |FROM events JOIN customer ON user_id = c_custkey
        |ORDER BY event_id""".stripMargin,

    "stream_stream_join" ->
      s"""WITH p AS (SELECT event_id AS p_id, user_id, $epochSec AS p_t
         |           FROM events WHERE event_type = 'purchase'),
         |     c AS (SELECT event_id AS c_id, user_id, $epochSec AS c_t
         |           FROM events WHERE event_type = 'click')
         |SELECT p_id, c_id, p.user_id, p_t, c_t
         |FROM p JOIN c ON p.user_id = c.user_id
         |  AND c_t >= p_t - 1800 AND c_t <= p_t
         |ORDER BY p_id, c_id""".stripMargin,

    "stream_stream_outer" ->
      s"""WITH p AS (SELECT event_id AS p_id, user_id, $epochSec AS p_t
         |           FROM events WHERE event_type = 'purchase'),
         |     c AS (SELECT event_id AS c_id, user_id, $epochSec AS c_t
         |           FROM events WHERE event_type = 'click'),
         |     wm AS (SELECT least((SELECT max(p_t) FROM p),
         |                         (SELECT max(c_t) FROM c)) - 7200 AS w)
         |SELECT p_id, c_id, p.user_id, p_t, c_t
         |FROM p LEFT JOIN c ON p.user_id = c.user_id
         |  AND c_t >= p_t - 1800 AND c_t <= p_t
         |WHERE c_id IS NOT NULL OR p_t < (SELECT w FROM wm)
         |ORDER BY p_id, c_id NULLS FIRST""".stripMargin,

    "stream_stream_outer_full" ->
      s"""WITH p AS (SELECT event_id AS p_id, user_id, $epochSec AS p_t
         |           FROM events WHERE event_type = 'purchase'),
         |     c AS (SELECT event_id AS c_id, user_id, $epochSec AS c_t
         |           FROM events WHERE event_type = 'click'),
         |     wm AS (SELECT least((SELECT max(p_t) FROM p),
         |                         (SELECT max(c_t) FROM c)) - 7200 AS w)
         |SELECT p_id, c_id, coalesce(p.user_id, c.user_id) AS user_id,
         |       p_t, c_t
         |FROM p FULL JOIN c ON p.user_id = c.user_id
         |  AND c_t >= p_t - 1800 AND c_t <= p_t
         |WHERE (p_id IS NOT NULL AND c_id IS NOT NULL)
         |   OR (c_id IS NULL AND p_t < (SELECT w FROM wm))
         |   OR (p_id IS NULL AND c_t + 1800 < (SELECT w FROM wm))
         |ORDER BY p_id NULLS FIRST, c_id NULLS FIRST""".stripMargin,

    "stream_union" ->
      s"""SELECT ($epochSec // 600) * 600 AS ws, event_type, COUNT(*) AS n
         |FROM events WHERE event_type IN ('purchase', 'click')
         |GROUP BY 1, 2 ORDER BY ws, event_type""".stripMargin,

    "stream_window_topk" ->
      s"""WITH c AS (
         |  SELECT ($epochSec // 600) * 600 AS ws, user_id, COUNT(*) AS n
         |  FROM events GROUP BY 1, 2)
         |SELECT ws, rn, user_id, n FROM (
         |  SELECT ws, user_id, n,
         |         row_number() OVER (PARTITION BY ws
         |                            ORDER BY n DESC, user_id) AS rn
         |  FROM c)
         |WHERE rn <= 3 ORDER BY ws, rn""".stripMargin,

    // visible-clock = publish second + the per-type backoff; truncation
    // to seconds commutes with adding whole-minute backoffs, so the
    // window arithmetic matches Spark's window(deliver_at) exactly
    "obs_sub_backlog" ->
      """WITH mx AS (SELECT MAX(event_id) AS m FROM events),
        |subs AS (SELECT * FROM (VALUES ('sub_fast', 0.9), ('sub_slow', 0.5),
        |                               ('sub_paused', 0.0),
        |                               ('sub_caughtup', 1.0)) s(subscription, f)),
        |c AS (SELECT subscription,
        |        CASE WHEN f = 0.0 THEN CAST(-1 AS BIGINT)
        |             ELSE CAST(floor(m * f) AS BIGINT) END AS ack_pos
        |      FROM subs, mx),
        |a AS (SELECT c.subscription, c.ack_pos, COUNT(*) AS backlog,
        |        strftime(date_trunc('second', min_by(e.ts, e.event_id)),
        |                 '%Y-%m-%d %H:%M:%S') AS oldest_ts_s
        |      FROM events e JOIN c ON e.event_id > c.ack_pos
        |      GROUP BY c.subscription, c.ack_pos)
        |SELECT c.subscription, c.ack_pos,
        |  CAST(coalesce(a.backlog, 0) AS BIGINT) AS backlog, a.oldest_ts_s
        |FROM c LEFT JOIN a USING (subscription, ack_pos)
        |ORDER BY c.subscription""".stripMargin,

    // the same two windows, closed-form: accept iff seq exceeds the
    // running max over all PRIOR arrivals in publish order
    "stream_producer_dedup" ->
      """WITH p AS (
        |  SELECT event_id, CAST(user_id % 8 AS BIGINT) AS producer_id,
        |    row_number() OVER (PARTITION BY user_id % 8
        |                       ORDER BY event_id) AS r
        |  FROM events),
        |s AS (
        |  SELECT event_id, producer_id,
        |    CAST(CASE WHEN r % 5 = 0 THEN r - 2 ELSE r END AS BIGINT)
        |      AS seq_id
        |  FROM p),
        |w AS (
        |  SELECT *, max(seq_id) OVER (PARTITION BY producer_id
        |    ORDER BY event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS hw
        |  FROM s)
        |SELECT producer_id, seq_id, event_id FROM w
        |WHERE hw IS NULL OR seq_id > hw
        |ORDER BY producer_id, seq_id""".stripMargin,

    // cursor jump: greatest(ack_pos, newest position published at or
    // before max(ts) − TTL); n_expired is positional — every position
    // in (old, new] is acked with the jump
    "stream_msg_expiry" ->
      """WITH mx AS (SELECT MAX(event_id) AS m,
        |              date_trunc('second', MAX(ts)) - INTERVAL 7 DAY
        |                AS cutoff
        |            FROM events),
        |subs AS (SELECT * FROM (VALUES ('sub_fast', 0.9), ('sub_slow', 0.5),
        |                               ('sub_paused', 0.0),
        |                               ('sub_caughtup', 1.0)) s(subscription, f)),
        |c AS (SELECT subscription,
        |        CASE WHEN f = 0.0 THEN CAST(-1 AS BIGINT)
        |             ELSE CAST(floor(m * f) AS BIGINT) END AS ack_pos
        |      FROM subs, mx),
        |xp AS (SELECT coalesce(MAX(e.event_id), -1) AS expiry_pos
        |       FROM events e, mx
        |       WHERE date_trunc('second', e.ts) <= mx.cutoff),
        |mv AS (SELECT subscription, ack_pos,
        |         greatest(ack_pos, expiry_pos) AS new_ack_pos
        |       FROM c, xp),
        |ne AS (SELECT mv.subscription, COUNT(*) AS n_expired
        |       FROM events e JOIN mv ON e.event_id > mv.ack_pos
        |                            AND e.event_id <= mv.new_ack_pos
        |       GROUP BY 1),
        |a AS (SELECT mv.subscription, COUNT(*) AS backlog,
        |        strftime(date_trunc('second', min_by(e.ts, e.event_id)),
        |                 '%Y-%m-%d %H:%M:%S') AS oldest_ts_s
        |      FROM events e JOIN mv ON e.event_id > mv.new_ack_pos
        |      GROUP BY 1)
        |SELECT mv.subscription, mv.ack_pos, mv.new_ack_pos,
        |  CAST(coalesce(ne.n_expired, 0) AS BIGINT) AS n_expired,
        |  CAST(coalesce(a.backlog, 0) AS BIGINT) AS backlog, a.oldest_ts_s
        |FROM mv LEFT JOIN ne USING (subscription)
        |        LEFT JOIN a USING (subscription)
        |ORDER BY mv.subscription""".stripMargin,

    "source_topic_pattern" ->
      s"""SELECT 'topic_' || event_type AS topic,
         |  ($epochSec // 3600) * 3600 AS ws, COUNT(*) AS n
         |FROM events WHERE event_type IN ('click', 'view')
         |GROUP BY 1, 2 ORDER BY topic, ws""".stripMargin,

    "source_seek_replay" ->
      """WITH c AS (SELECT MIN(event_id) AS cur FROM events
        |           WHERE ts >= TIMESTAMP '2024-01-20 00:00:00')
        |SELECT 'by_time' AS mode, event_id,
        |  strftime(date_trunc('second', ts), '%Y-%m-%d %H:%M:%S') AS ts_s,
        |  event_type
        |FROM events, c WHERE event_id >= c.cur
        |UNION ALL
        |SELECT 'by_id' AS mode, event_id,
        |  strftime(date_trunc('second', ts), '%Y-%m-%d %H:%M:%S') AS ts_s,
        |  event_type
        |FROM events WHERE event_id >= 500
        |ORDER BY mode, event_id""".stripMargin,

    "stream_delayed_delivery" ->
      s"""SELECT (($epochSec
         |  + CASE WHEN event_type = 'error' THEN 900
         |         WHEN event_type = 'signup' THEN 300
         |         ELSE 0 END) // 300) * 300 AS ws,
         |  event_type, COUNT(*) AS n
         |FROM events GROUP BY 1, 2 ORDER BY ws, event_type""".stripMargin,

    "stream_bloom_enrich" ->
      s"""SELECT ($epochSec // 600) * 600 AS ws, c_mktsegment, COUNT(*) AS n
         |FROM events JOIN customer ON user_id = c_custkey
         |WHERE c_mktsegment = 'BUILDING'
         |GROUP BY 1, 2 ORDER BY ws, c_mktsegment""".stripMargin,

    // closed form of the redelivery loop: an accepted message delivers
    // on attempt 1; an 'error' message recovers at attempt
    // event_id%4 + 1 when that is within the max-delivery budget, else
    // dead-letters after maxDeliveries (=3) attempts
    "stream_redelivery" ->
      """WITH e AS (SELECT event_id, event_type, value,
        |                  CAST(props->>'$.k' AS DOUBLE) AS k FROM events)
        |SELECT event_id,
        |  CASE WHEN event_type IN ('purchase','signup') AND k >= 50
        |            AND value BETWEEN 10 AND 400 THEN 'ACCEPT'
        |       WHEN event_type = 'error' AND event_id % 4 < 3 THEN 'ACCEPT'
        |       WHEN event_type = 'error' THEN 'DEAD_LETTER'
        |       ELSE 'REJECT' END AS disposition,
        |  CAST(CASE WHEN event_type IN ('purchase','signup') AND k >= 50
        |                 AND value BETWEEN 10 AND 400 THEN 1
        |            WHEN event_type = 'error' AND event_id % 4 < 3
        |              THEN event_id % 4 + 1
        |            WHEN event_type = 'error' THEN 3
        |            ELSE 1 END AS BIGINT) AS attempts
        |FROM e ORDER BY event_id""".stripMargin,

    // the redelivery closed form + the geometric ladder shift
    // 60·(2^(attempts−1) − 1), gated on the corpus max second
    "stream_redelivery_backoff" ->
      s"""WITH e AS (SELECT event_id, event_type, value,
         |                  CAST(props->>'$$.k' AS DOUBLE) AS k,
         |                  $epochSec AS t FROM events),
         |r AS (SELECT event_id, t,
         |  CASE WHEN event_type IN ('purchase','signup') AND k >= 50
         |            AND value BETWEEN 10 AND 400 THEN 'ACCEPT'
         |       WHEN event_type = 'error' AND event_id % 4 < 3 THEN 'ACCEPT'
         |       WHEN event_type = 'error' THEN 'DEAD_LETTER'
         |       ELSE 'REJECT' END AS disposition,
         |  CAST(CASE WHEN event_type IN ('purchase','signup') AND k >= 50
         |                 AND value BETWEEN 10 AND 400 THEN 1
         |            WHEN event_type = 'error' AND event_id % 4 < 3
         |              THEN event_id % 4 + 1
         |            WHEN event_type = 'error' THEN 3
         |            ELSE 1 END AS BIGINT) AS attempts
         |  FROM e),
         |mx AS (SELECT MAX(t) AS m FROM e)
         |SELECT event_id, disposition, attempts,
         |  t + 60 * ((1 << (attempts - 1)) - 1) AS delivered_at
         |FROM r, mx
         |WHERE t + 60 * ((1 << (attempts - 1)) - 1) <= m
         |ORDER BY event_id""".stripMargin,

    "stream_dlq_ageout" ->
      s"""WITH dl AS (
         |  SELECT event_id, $epochSec AS t FROM events
         |  WHERE event_type = 'error' AND event_id % 4 = 3),
         |w AS (SELECT (t // 3600) * 3600 AS ws, COUNT(*) AS n_expired
         |      FROM dl GROUP BY 1),
         |mx AS (SELECT MAX(t) AS m FROM dl)
         |SELECT ws, n_expired FROM w, mx
         |WHERE ws + 3600 <= m - 432000
         |ORDER BY ws""".stripMargin,

    "stream_watermark" ->
      s"""WITH e AS (SELECT event_id, user_id, event_type, $epochSec AS t FROM events)
         |SELECT event_id, user_id, event_type, t FROM (
         |  SELECT *, max(t) OVER (ORDER BY event_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS runmax
         |  FROM e)
         |WHERE t >= runmax - 600
         |ORDER BY event_id""".stripMargin,

    "stream_filter_pipeline" ->
      s"""WITH acc AS (
         |  SELECT * FROM events
         |  WHERE event_type IN ('purchase', 'signup')
         |    AND CAST(props->>'$$.k' AS DOUBLE) >= 50
         |    AND value BETWEEN 10 AND 400),
         |j AS (SELECT acc.* FROM acc JOIN customer ON user_id = c_custkey)
         |SELECT ($epochSec // 300) * 300 AS ws, event_type, COUNT(*) AS n,
         |  CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS sum_value
         |FROM j GROUP BY 1, 2 ORDER BY ws, event_type""".stripMargin
  )
}
