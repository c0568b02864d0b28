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
    // _SUCCESS, not isDirectory — the repo-wide write-once convention
    // (Similarity/Quantize): a crash mid-write leaves the directory but
    // not the marker, so the layout rebuilds instead of reading a
    // partial topic tree
    if (!java.nio.file.Files.exists(
        java.nio.file.Paths.get(path, "_SUCCESS"))) {
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

  /** Topic retention (`defaultRetentionTimeInMinutes` = 14 days of
    * event time): acked messages stay replayable this long; only a
    * ledger prefix both acked-by-all AND past retention is trimmed. */
  private[streaming] val retention = "INTERVAL 14 DAYS"

  /** Geo-replication lag (minutes): a replica becomes visible in the
    * remote region this long after its origin publish. */
  private[streaming] val replLagMin = 2

  /** The subscription-cursor fixture: (name, backlog fraction of the
    * max position) — fast (0.9), lagging (0.5), paused (acked nothing
    * → before-first −1), caught-up (at max, backlog 0). THE
    * definition — [[subCursors]] builds the Spark frame from it and
    * this pack + Broker interpolate it into every DuckDB twin's
    * VALUES list, so a fixture change can never compile clean yet
    * fail only at the correctness gate (ADVICE r11). Order matters:
    * the ack-holes/cumulative-ack keys derive their per-sub pmod-7
    * residue k from the INDEX. */
  private[graft] val subFractions: Seq[(String, Double)] =
    Seq(("sub_fast", 0.9), ("sub_slow", 0.5), ("sub_paused", 0.0),
        ("sub_caughtup", 1.0))

  // DuckDB VALUES fragments for the oracle twins (here AND in Broker —
  // one definition, private[graft]), derived from the SAME subFractions
  // fixture the query side reads (ADVICE r11: hardcoded copies compile
  // clean and fail only at the hash gate)
  private[graft] val subsValsD: String =
    subFractions.map { case (n, f) => s"('$n', $f)" }.mkString(", ")
  private[graft] val subsKValsD: String =
    subFractions.zipWithIndex
      .map { case ((n, f), k) => s"('$n', $f, $k)" }.mkString(", ")

  /** The per-subscription pmod-7 ack residue k = the subscription's
    * INDEX in subFractions — the ONE definition both the ack-holes and
    * cumulative-ack Spark sides and (via [[subsKValsD]]) their DuckDB
    * twins derive from, so a fixture reorder or a 5th subscription can
    * never fork the residue assignment silently. */
  private[graft] def subKExpr: org.apache.spark.sql.Column =
    subFractions.map(_._1).zipWithIndex
      .foldLeft(lit(-1L)) { case (acc, (n, k)) =>
        when(col("subscription") === n, k.toLong).otherwise(acc) }

  private[streaming] def subCursors(ev: DataFrame): DataFrame = {
    val s = ev.sparkSession
    import s.implicits._
    val mx = ev.agg(max(col("event_id")).as("m"))
    subFractions
      .toDF("subscription", "f")
      .crossJoin(broadcast(mx))
      .select(col("subscription"),
        when(col("f") === 0.0, lit(-1L))
          .otherwise(floor(col("m") * col("f")).cast("long"))
          .as("ack_pos"))
  }

  /** The TTL-moved cursor table (shared by stream_msg_expiry and
    * obs_retention_trim): each cursor jumps to max(ack_pos, the newest
    * position published at-or-before now − TTL) — the broker's
    * findNewestMatching, positional like seek-by-time. ≤4 rows,
    * localCheckpoint-pinned: several consumers read it, and without the
    * pin each re-derives the max/cutoff/expiry corpus aggregates
    * (observed 3× in the unpinned stream_msg_expiry plan). */
  private[graft] def movedCursors(ev: DataFrame): DataFrame = {
    val cutoff = ev.agg((date_trunc("second", max(col("ts")))
      - expr(msgTtl)).as("cutoff"))
    val xp = ev.select(col("event_id"),
        date_trunc("second", col("ts")).as("tss"))
      .crossJoin(broadcast(cutoff))
      .where(col("tss") <= col("cutoff"))
      .agg(coalesce(max(col("event_id")), lit(-1L)).as("expiry_pos"))
    subCursors(ev).crossJoin(broadcast(xp))
      .select(col("subscription"), col("ack_pos"),
        greatest(col("ack_pos"), col("expiry_pos")).as("new_ack_pos"))
      .localCheckpoint()
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
      val moved = Streams.movedCursors(ev)
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
      graft.Tables.cachedParquet(s, Streams.topicsLayout(s, dir))
        .where(col("topic").rlike(Streams.topicPattern))
        .withColumn("ts_sec", date_trunc("second", col("ts")))
        .groupBy(col("topic"), window(col("ts_sec"), "1 hour").as("w"))
        .agg(count(lit(1)).as("n"))
        .select(col("topic"), unix_timestamp(col("w.start")).as("ws"),
          col("n"))
        .orderBy("topic", "ws")),

    // Partitioned topics (round 11 wave 3): a Pulsar topic is P
    // partition sub-topics and the PRODUCER routes each message —
    // keyed messages by key hash (one key → one partition, so
    // per-key order survives; the engine's portable md5 slot stands in
    // for JavaStringHash/Murmur3, the algorithm being a pluggable
    // detail of the routing contract), keyless messages round-robin
    // for throughput (fixture: 'error' events are keyless). Census per
    // (partition, route mode): count, distinct keys, position span —
    // the striping and the key co-location are both visible. Map-only
    // routing (no join, no shuffle before the census aggregate).
    "source_partitioned_topic" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val parts = 4
      val keyed = col("event_type") =!= "error"
      val part = when(keyed,
        pmod(graft.llm.Text.tokHashS(col("user_id").cast("string")),
          lit(parts)))
        .otherwise(pmod(col("event_id"), lit(parts)))
      ev.select(concat(lit("topic-partition-"), part).as("partition"),
          when(keyed, "key_hash").otherwise("round_robin").as("route_mode"),
          col("event_id"),
          when(keyed, col("user_id")).as("key"))
        .groupBy("partition", "route_mode")
        .agg(count(lit(1)).as("n"), countDistinct(col("key")).as("n_keys"),
          min("event_id").as("min_pos"), max("event_id").as("max_pos"))
        .orderBy("partition", "route_mode")
    }),

    // Individual-acknowledgment cursor state (round 11 wave 2 — the
    // managed-ledger individuallyDeletedMessages surface): consumers
    // ack out of order, so above the cumulative base each subscription
    // holds SCATTERED acks (fixture: position mod 7 == the sub's index)
    // — markDeletePosition can only advance to just before the FIRST
    // unacked position, and everything acked above it is an "ack hole"
    // the ledger must track (the individually-deleted-ranges bloat a
    // stuck subscription causes — sub_paused shows ~n/7 holes over a
    // pinned cursor). Shape: two broadcast inequality passes (find the
    // first unacked, then census the holes), ≤4-row joins — flat.
    "obs_ack_holes" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val mx = ev.agg(max(col("event_id")).as("m"))
      val cur = Streams.subCursors(ev).crossJoin(broadcast(mx))
        .withColumn("k", subKExpr) // residue = fixture INDEX, like the twin
        .localCheckpoint()
      val acked = pmod(col("event_id"), lit(7)) === col("k")
      // first unacked position above the cumulative base → markDelete;
      // a fully-acked ledger (caught-up) keeps markDelete at the tail
      val md = ev.join(broadcast(cur), col("event_id") > col("ack_pos"))
        .groupBy("subscription")
        .agg((min(when(!acked, col("event_id"))) - 1).as("md0"))
      // ≤4 rows, pinned: the hole census and the final report both
      // read it — unpinned, each re-runs the first-unacked corpus pass
      val withMd = cur.join(broadcast(md), Seq("subscription"), "left")
        .select(col("subscription"), col("ack_pos"), col("k"),
          coalesce(col("md0"), greatest(col("ack_pos"), col("m")))
            .as("mark_delete"))
        .localCheckpoint()
      val census = ev.join(broadcast(withMd),
          col("event_id") > col("mark_delete"))
        .groupBy("subscription")
        .agg(sum(when(acked, 1L).otherwise(0L)).as("n_holes"),
          sum(when(!acked, 1L).otherwise(0L)).as("n_unacked"))
      withMd.select(col("subscription"), col("ack_pos"), col("mark_delete"))
        .join(broadcast(census), Seq("subscription"), "left")
        .select(col("subscription"), col("ack_pos"), col("mark_delete"),
          coalesce(col("n_holes"), lit(0L)).as("n_holes"),
          coalesce(col("n_unacked"), lit(0L)).as("n_unacked"))
        .orderBy("subscription")
    }),

    // Retention / ledger trim (round 11 wave 2): the broker deletes a
    // ledger prefix only when EVERY subscription's markDelete has
    // passed it AND the messages are older than the retention window
    // (14 d) — so one stuck subscription pins the whole ledger
    // (before_ttl: sub_paused at −1 → trim −1, nothing reclaimable, the
    // classic storage gotcha), and the message-TTL expiry move
    // (stream_msg_expiry's SAME movedCursors) is what unblocks it
    // (after_ttl: trim = the expiry position, the ≤ max−14 d prefix
    // reclaims). Reclaimable bytes use the engine's one payload
    // convention (Filters.chunkPayload). Output: one row per scenario.
    "obs_retention_trim" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val retCutoff = ev.agg((date_trunc("second", max(col("ts")))
        - expr(Streams.retention)).as("rcut"))
      val trims = Streams.subCursors(ev)
        .agg(min(col("ack_pos")).as("trim_pos"))
        .select(lit("before_ttl").as("scenario"), col("trim_pos"))
        .unionByName(Streams.movedCursors(ev)
          .agg(min(col("new_ack_pos")).as("trim_pos"))
          .select(lit("after_ttl").as("scenario"), col("trim_pos")))
      val stats = ev
        .select(col("event_id"), date_trunc("second", col("ts")).as("tss"),
          octet_length(graft.relational.Filters.chunkPayload).as("bytes"))
        .crossJoin(broadcast(retCutoff))
        .where(col("tss") <= col("rcut"))
        .join(broadcast(trims), col("event_id") <= col("trim_pos"))
        .groupBy("scenario")
        .agg(count(lit(1)).as("n_deletable"),
          sum(col("bytes")).cast("long").as("reclaim_bytes"))
      trims.join(broadcast(stats), Seq("scenario"), "left")
        .select(col("scenario"), col("trim_pos"),
          coalesce(col("n_deletable"), lit(0L)).as("n_deletable"),
          coalesce(col("reclaim_bytes"), lit(0L)).as("reclaim_bytes"))
        .orderBy("scenario")
    }),

    // Schema evolution / AUTO_CONSUME (round 11 wave 2): a topic whose
    // payload schema evolved — v1 messages carry {et, v}, v2 adds a
    // `tier` field (fixture: version = event_id parity, tier from the
    // properties bag). The reader decodes EVERY payload with the
    // LATEST schema (from_json is permissive: missing fields resolve
    // NULL — Avro/JSON backward compat), normalizing v1 rows with a
    // default. The oracle computes the census closed-form, so the
    // Spark side's build→decode round trip through the evolved schema
    // is exactly checked. Map-side only — no join, one census shuffle.
    "source_schema_evolution" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val k = get_json_object(col("props"), "$.k").cast("long")
      val payload = when(pmod(col("event_id"), lit(2)) === 0,
        to_json(struct(col("event_type").as("et"),
          round(col("value"), 2).as("v"))))
        .otherwise(to_json(struct(col("event_type").as("et"),
          round(col("value"), 2).as("v"),
          when(k >= 50, "gold").otherwise("basic").as("tier"))))
      val parsed = ev.select(
          when(pmod(col("event_id"), lit(2)) === 0, "v1").otherwise("v2")
            .as("schema_version"),
          from_json(payload, org.apache.spark.sql.types.StructType.fromDDL(
            "et STRING, v DOUBLE, tier STRING")).as("p"))
      parsed.select(col("schema_version"),
          coalesce(col("p.tier"), lit("pre_tier")).as("tier"),
          col("p.et").as("et"), col("p.v").as("v"))
        .groupBy("schema_version", "tier", "et")
        .agg(count(lit(1)).as("n"),
          sum(col("v").cast("decimal(28,2)")).cast("double").as("sum_v"))
        .orderBy("schema_version", "tier", "et")
    }),

    // Geo-replication + replicated-subscription dedup (round 11 wave
    // 2): two clusters each host the topic; replication copies every
    // message to the other region with a 2-minute replication lag, so
    // an aggregated (multi-cluster) consumer sees each message TWICE —
    // once from its origin, once as a replica — and must dedup by
    // message id keeping the earliest-visible copy (the origin, lag >
    // 0). Output: per-origin-region hourly counts of the deduped view
    // — which the oracle derives directly from the original corpus,
    // so the union→dedup mesh must collapse exactly. Shape: map-side
    // region tagging, one union, one event_id-keyed dedup window, one
    // census aggregate.
    "source_geo_replicated" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val ev = Tables.events(s, dir)
        .select(col("event_id"), col("ts"), col("user_id"))
        .withColumn("origin_region",
          when(pmod(col("user_id"), lit(2)) === 0, "us-east")
            .otherwise("eu-west"))
      def clusterView(home: String) = ev.select(col("event_id"),
        col("origin_region"),
        when(col("origin_region") === home, col("ts"))
          .otherwise(col("ts") + expr(s"INTERVAL ${Streams.replLagMin} MINUTES"))
          .as("visible_ts"),
        when(col("origin_region") === home, "origin").otherwise("replica")
          .as("served_from"))
      val merged = clusterView("us-east").unionByName(clusterView("eu-west"))
      val w = Window.partitionBy("event_id").orderBy("visible_ts")
      merged.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
        .withColumn("ts_sec", date_trunc("second", col("visible_ts")))
        .groupBy(col("origin_region"),
          window(col("ts_sec"), "1 hour").as("w"))
        .agg(count(lit(1)).as("n"))
        .select(col("origin_region"),
          unix_timestamp(col("w.start")).as("ws"), col("n"))
        .orderBy("origin_region", "ws")
    }),

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
      s"""WITH mx AS (SELECT MAX(event_id) AS m FROM events),
        |subs AS (SELECT * FROM (VALUES $subsValsD) s(subscription, f)),
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

    "source_partitioned_topic" ->
      s"""WITH r AS (
         |  SELECT CASE WHEN event_type <> 'error'
         |           THEN 'topic-partition-' || CAST(
         |             ${graft.llm.Text.tokHashDOn("CAST(user_id AS VARCHAR)")}
         |               % 4 AS VARCHAR)
         |           ELSE 'topic-partition-' || CAST(event_id % 4 AS VARCHAR)
         |         END AS partition,
         |         CASE WHEN event_type <> 'error' THEN 'key_hash'
         |              ELSE 'round_robin' END AS route_mode,
         |         event_id,
         |         CASE WHEN event_type <> 'error' THEN user_id END AS key
         |  FROM events)
         |SELECT partition, route_mode, COUNT(*) AS n,
         |  COUNT(DISTINCT key) AS n_keys,
         |  MIN(event_id) AS min_pos, MAX(event_id) AS max_pos
         |FROM r GROUP BY 1, 2 ORDER BY partition, route_mode""".stripMargin,

    // markDelete = first unacked − 1; holes = acked positions above it
    "obs_ack_holes" ->
      s"""WITH mx AS (SELECT MAX(event_id) AS m FROM events),
        |subs AS (SELECT * FROM (VALUES $subsKValsD) s(subscription, f, k)),
        |c AS (SELECT subscription,
        |        CASE WHEN f = 0.0 THEN CAST(-1 AS BIGINT)
        |             ELSE CAST(floor(m * f) AS BIGINT) END AS ack_pos, k, m
        |      FROM subs, mx),
        |md AS (SELECT c.subscription,
        |         MIN(CASE WHEN e.event_id % 7 <> c.k THEN e.event_id END) - 1
        |           AS md0
        |       FROM events e JOIN c ON e.event_id > c.ack_pos GROUP BY 1),
        |w AS (SELECT c.subscription, c.ack_pos, c.k,
        |        coalesce(md.md0, greatest(c.ack_pos, c.m)) AS mark_delete
        |      FROM c LEFT JOIN md USING (subscription)),
        |h AS (SELECT w.subscription,
        |        CAST(SUM(CASE WHEN e.event_id % 7 = w.k THEN 1 ELSE 0 END)
        |             AS BIGINT) AS n_holes,
        |        CAST(SUM(CASE WHEN e.event_id % 7 <> w.k THEN 1 ELSE 0 END)
        |             AS BIGINT) AS n_unacked
        |      FROM events e JOIN w ON e.event_id > w.mark_delete GROUP BY 1)
        |SELECT w.subscription, w.ack_pos, w.mark_delete,
        |  coalesce(h.n_holes, 0) AS n_holes,
        |  coalesce(h.n_unacked, 0) AS n_unacked
        |FROM w LEFT JOIN h USING (subscription)
        |ORDER BY w.subscription""".stripMargin,

    // trim = min markDelete over subs; deletable = that prefix past the
    // 14-day retention; after_ttl uses the expiry-moved cursors
    "obs_retention_trim" ->
      s"""WITH mx AS (SELECT MAX(event_id) AS m,
        |              date_trunc('second', MAX(ts)) - INTERVAL 14 DAY AS rcut,
        |              date_trunc('second', MAX(ts)) - INTERVAL 7 DAY AS cutoff
        |            FROM events),
        |subs AS (SELECT * FROM (VALUES $subsValsD) s(subscription, f)),
        |c AS (SELECT subscription,
        |        CASE WHEN f = 0.0 THEN CAST(-1 AS BIGINT)
        |             ELSE CAST(floor(m * f) AS BIGINT) END AS ack_pos
        |      FROM subs, mx),
        |xp AS (SELECT coalesce(MAX(e.event_id), -1) AS expiry_pos
        |       FROM events e, mx WHERE date_trunc('second', e.ts) <= mx.cutoff),
        |t AS (SELECT 'before_ttl' AS scenario, MIN(ack_pos) AS trim_pos FROM c
        |      UNION ALL
        |      SELECT 'after_ttl', MIN(greatest(ack_pos, expiry_pos))
        |      FROM c, xp),
        |st AS (SELECT t.scenario, COUNT(*) AS n_deletable,
        |         -- strlen = BYTE length (DuckDB's octet_length only
        |         -- takes BLOB); payloads are ASCII so it equals
        |         -- Spark's octet_length
        |         CAST(SUM(strlen(e.event_type || ':'
        |           || CAST(e.user_id AS VARCHAR) || ':' || e.props))
        |           AS BIGINT) AS reclaim_bytes
        |       FROM events e CROSS JOIN mx
        |         JOIN t ON e.event_id <= t.trim_pos
        |       WHERE date_trunc('second', e.ts) <= mx.rcut
        |       GROUP BY 1)
        |SELECT t.scenario, t.trim_pos,
        |  coalesce(st.n_deletable, 0) AS n_deletable,
        |  coalesce(st.reclaim_bytes, 0) AS reclaim_bytes
        |FROM t LEFT JOIN st USING (scenario)
        |ORDER BY t.scenario""".stripMargin,

    // the census closed-form — the Spark side must round-trip the
    // payload through the evolved schema and land on the same numbers
    "source_schema_evolution" ->
      """SELECT CASE WHEN event_id % 2 = 0 THEN 'v1' ELSE 'v2' END
        |    AS schema_version,
        |  CASE WHEN event_id % 2 = 0 THEN 'pre_tier'
        |       WHEN CAST(props->>'$.k' AS BIGINT) >= 50 THEN 'gold'
        |       ELSE 'basic' END AS tier,
        |  event_type AS et, COUNT(*) AS n,
        |  CAST(SUM(CAST(ROUND(value, 2) AS DECIMAL(28,2))) AS DOUBLE) AS sum_v
        |FROM events GROUP BY 1, 2, 3
        |ORDER BY schema_version, tier, et""".stripMargin,

    // the deduped aggregated view must equal the original corpus —
    // origin copies win (replicas arrive replLag later)
    "source_geo_replicated" ->
      s"""SELECT CASE WHEN user_id % 2 = 0 THEN 'us-east' ELSE 'eu-west' END
         |    AS origin_region,
         |  ($epochSec // 3600) * 3600 AS ws, COUNT(*) AS n
         |FROM events GROUP BY 1, 2
         |ORDER BY origin_region, ws""".stripMargin,

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
      s"""WITH mx AS (SELECT MAX(event_id) AS m,
        |              date_trunc('second', MAX(ts)) - INTERVAL 7 DAY
        |                AS cutoff
        |            FROM events),
        |subs AS (SELECT * FROM (VALUES $subsValsD) s(subscription, f)),
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
