package graft.streaming

import graft.{QueryPack, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-11 wave 4 — the broker RESOURCE-MANAGEMENT surface. Waves 1-3
  * closed the message-lifecycle semantics (dedup, chunking, TTL,
  * transactions, subscription types); this pack covers how a broker
  * manages the resources those semantics consume: batch-index ack
  * bitmaps (PIP-54), backlog quotas, dispatch rate limiting, tiered
  * storage offload, namespace bundle load-balancing, and
  * priority-level dispatch. Every key is a closed-form batch twin
  * (3-gate DuckDB oracle) built from the same fixture conventions the
  * earlier waves pinned: dense 0-based positions (`event_id`),
  * `subCursors` fractions, the `chunkPayload` byte convention, the
  * portable md5 slot hash.
  */
object Broker extends QueryPack {

  /** PIP-54 ack predicate: content-derived, ~2/3 of messages acked, so
    * entries land in all three states (full ≈ (2/3)^4, partial,
    * untouched ≈ (1/3)^4) at every SF. */
  private def msgAcked: Column = pmod(col("user_id"), lit(3)) =!= 0

  /** Tiered-storage ledger width (messages per ledger). 128 keeps ≥4
    * ledgers off-bookie even at sf0.001 (1 000 msgs → 8 ledgers). */
  private[graft] val ledgerWidth = 128

  /** Newest ledgers kept on bookies; older ones are offloaded. */
  private[graft] val keepLedgers = 4

  /** Per-subscription dispatch rates (msgs/sec) for the throttle key. */
  private[streaming] val dispatchRates =
    Seq(("sub_fast", 100L), ("sub_slow", 500L),
        ("sub_paused", 1000L), ("sub_caughtup", 50L))

  /** Namespace bundle count (hash space 2^16 split evenly). */
  private[streaming] val bundleCount = 4
  private[streaming] val hashSpace = 65536L

  /** Backlog quota = corpus size div this (the 25 % convention). */
  private[streaming] val quotaDenom = 4

  /** Broker-wide publish rate limit (msgs/sec) for the publish
    * throttle key (`publishThrottlingRateInMsg`). 200 keeps ≥5 publish
    * slots even at sf0.001 (1 000 msgs). */
  private[graft] val publishRateMsgs = 200

  /** Consumer receiver queue capacity (`receiverQueueSize`; Pulsar
    * defaults to 1000, configured down to 500 here): sub_paused
    * replays the whole corpus (backlog = n), and the sf0.001 fixture
    * is exactly 1000 messages — at Q = 1000 nothing would gate, at
    * 500 the permit-gated regime is exercised at every SF. */
  private[graft] val receiverQueueSize = 500

  // DuckDB VALUES fragments interpolated into the twins below — the
  // (subscription, f[, k]) fragments are Streams' single definitions
  // (ADVICE r11: hardcoded copies compile clean and fail only at the
  // hash gate); only the rate-joined variant lives here because
  // dispatchRates does.
  private val subsValsD: String = Streams.subsValsD
  private val subsKValsD: String = Streams.subsKValsD
  private val subsRateValsD: String = {
    val r = dispatchRates.toMap
    Streams.subFractions.map { case (n, f) => s"('$n', $f, ${r(n)})" }
      .mkString(", ")
  }

  /** The ≤4-row (subscription, ack_pos, rate) cursor table — the shared
    * head of the dispatch-throttle and consumer-flow keys (one
    * definition; both gates read the same fixture join). Pinned: the
    * gate pass and the zero-backlog restore both read it. */
  private def ratedCursors(s: SparkSession, ev: DataFrame): DataFrame = {
    val rates = {
      import s.implicits._
      dispatchRates.toDF("subscription", "rate")
    }
    Streams.subCursors(ev)
      .join(broadcast(rates), Seq("subscription"))
      .localCheckpoint()
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // PIP-54 batch-index-level acknowledgment: entries pack 4 messages
    // (the packEntries convention, entry_id = event_id div 4); the
    // consumer acks INDIVIDUAL indices inside an entry. markDelete can
    // only advance over FULLY-acked entries; the census quantifies the
    // PIP-54 win — without batch-index acks a partially-acked entry is
    // redelivered WHOLE on reconnect (acked indices included), with
    // them only the unacked indices come back. One entry-keyed shuffle
    // (map-side partial count/sum), then 1-row aggregates over the
    // n/4-row entry frame.
    "stream_batch_index_ack" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val k = graft.relational.Filters.entryBatchK
      val entries = ev
        .groupBy(expr(s"event_id div $k").as("entry_id"))
        .agg(count(lit(1)).as("n_msgs"),
          sum(when(msgAcked, 1L).otherwise(0L)).as("n_acked"))
        .localCheckpoint() // n/4 rows, read by two aggregates below
      val full = col("n_acked") === col("n_msgs")
      // first not-fully-acked entry − 1; a fully-acked ledger keeps
      // markDelete at the tail (same convention as obs_ack_holes)
      val md = entries.agg(
        coalesce(min(when(!full, col("entry_id"))) - 1,
          max(col("entry_id"))).as("mark_delete_entry"))
      entries.crossJoin(broadcast(md))
        .agg(
          count(lit(1)).as("n_entries"),
          sum(when(full, 1L).otherwise(0L)).as("full_entries"),
          sum(when(!full && col("n_acked") > 0, 1L).otherwise(0L))
            .as("partial_entries"),
          sum(when(col("n_acked") === 0, 1L).otherwise(0L))
            .as("untouched_entries"),
          first(col("mark_delete_entry")).as("mark_delete_entry"),
          // with PIP-54: only unacked indices above markDelete redeliver
          sum(when(col("entry_id") > col("mark_delete_entry"),
            col("n_msgs") - col("n_acked")).otherwise(0L))
            .as("redeliver_pip54"),
          // without: every not-fully-acked entry redelivers whole
          sum(when(col("entry_id") > col("mark_delete_entry") && !full,
            col("n_msgs")).otherwise(0L))
            .as("redeliver_entry_level"))
        .orderBy("mark_delete_entry")
    }),

    // Backlog quota enforcement (`backlogQuotaDefaultLimitBytes`'s
    // message-count sibling): quota = 25 % of the corpus; each
    // subscription carries its configured policy. producer_request_hold
    // and producer_exception act on the PRODUCER (no cursor movement);
    // consumer_backlog_eviction moves the cursor forward so the backlog
    // shrinks to exactly the quota. Reuses the subCursors fixture and
    // the backlogReport aggregate (detect→remedy: the eviction is
    // derived from the same backlog the report would show).
    "obs_backlog_quota" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val mx = ev.agg(max(col("event_id")).as("m"),
        expr(s"count(1) div $quotaDenom").as("quota"))
      val policy = when(col("subscription") === "sub_slow",
          "producer_exception")
        .when(col("subscription") === "sub_paused",
          "consumer_backlog_eviction")
        .otherwise("producer_request_hold")
      val cur = Streams.subCursors(ev).crossJoin(broadcast(mx))
        .withColumn("policy", policy)
        .localCheckpoint() // 4 rows; the backlog pass and report read it
      val bl = ev.join(broadcast(cur), col("event_id") > col("ack_pos"))
        .groupBy("subscription").agg(count(lit(1)).as("backlog"))
      val exceeded = col("backlog") > col("quota")
      cur.join(broadcast(bl), Seq("subscription"), "left")
        .withColumn("backlog", coalesce(col("backlog"), lit(0L)))
        .select(col("subscription"), col("policy"), col("ack_pos"),
          col("backlog"), col("quota"),
          when(!exceeded, "within_quota").otherwise(col("policy"))
            .as("action"),
          when(exceeded && col("policy") === "consumer_backlog_eviction",
            col("m") - col("quota")).otherwise(col("ack_pos"))
            .as("new_ack_pos"))
        .withColumn("n_evicted", col("new_ack_pos") - col("ack_pos"))
        .orderBy("subscription")
    }),

    // Dispatch rate limiting (`dispatchThrottlingRatePerSubscription`):
    // each subscription drains its backlog at R msgs/sec in position
    // order. Positions are DENSE (event_id unique 0-based), so the
    // delivery slot is pure arithmetic — slot = (pos − ack_pos − 1)
    // div R — no window function, no per-sub ranking shuffle: one
    // broadcast inequality pass, map-side slot assignment, 4-group agg.
    // slot_checksum = Σ slot pins every individual assignment.
    "stream_dispatch_throttle" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val cur = ratedCursors(s, ev)
      val drained = ev.join(broadcast(cur), col("event_id") > col("ack_pos"))
        .select(col("subscription"), col("rate"),
          expr("(event_id - ack_pos - 1) div rate").as("slot"))
        .groupBy("subscription", "rate")
        .agg(count(lit(1)).as("backlog"),
          (max(col("slot")) + 1).as("drain_seconds"),
          sum(when(col("slot") === 0, 1L).otherwise(0L)).as("msgs_slot0"),
          sum(col("slot")).as("slot_checksum"))
      // restore zero-backlog subscriptions (caught-up drains nothing)
      cur.join(broadcast(drained), Seq("subscription", "rate"), "left")
        .select(col("subscription"), col("rate"),
          coalesce(col("backlog"), lit(0L)).as("backlog"),
          coalesce(col("drain_seconds"), lit(0L)).as("drain_seconds"),
          coalesce(col("msgs_slot0"), lit(0L)).as("msgs_slot0"),
          coalesce(col("slot_checksum"), lit(0L)).as("slot_checksum"))
        .orderBy("subscription")
    }),

    // Producer-side publish rate limiting (PublishRateLimiter /
    // `publishThrottlingRateInMsg` — the producer sibling of
    // stream_dispatch_throttle, closing the resource-management quad:
    // dispatch ✓, backlog quota ✓, offload ✓, publish ✓). The broker
    // admits at most R msgs per second across all producers; with
    // DENSE 0-based positions the admitted second is pure map-side
    // arithmetic — publish slot = event_id div R, no window, no
    // ranking shuffle (the dispatch-throttle slot rule on the PUBLISH
    // clock: a full-replay cursor at ack_pos −1 drains in exactly
    // these slots, the cross-key invariant StreamSpec pins). The
    // census shows how broker-wide pacing distributes across topics:
    // per topic its message count, active-slot count, slot extent
    // (paced_seconds = wall time under throttle), the worst
    // single-second burst, and Σ slot pinning every assignment. One
    // (topic, slot) census with map-side partials, then a topic-grain
    // rollup — both exchanges dimension-bounded.
    "stream_publish_throttle" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val perSlot = ev.select(
          concat(lit("topic_"), col("event_type")).as("topic"),
          expr(s"event_id div $publishRateMsgs").as("slot"))
        .groupBy("topic", "slot").agg(count(lit(1)).as("n"))
      perSlot.groupBy("topic").agg(
          sum(col("n")).as("n_msgs"),
          count(lit(1)).as("n_active_slots"),
          min(col("slot")).as("first_slot"),
          max(col("slot")).as("last_slot"),
          max(col("n")).as("peak_slot_msgs"),
          sum(col("slot") * col("n")).as("slot_checksum"))
        .withColumn("paced_seconds",
          col("last_slot") - col("first_slot") + 1)
        .orderBy("topic")
    }),

    // Consumer flow control (`receiverQueueSize` permit accounting —
    // the last un-modeled dispatch mechanic, VERDICT r11 missing #4):
    // the broker may hold at most Q = receiverQueueSize messages
    // outstanding (delivered, unprocessed) per consumer; the app
    // drains at D msgs/sec (the dispatchRates fixture doing double
    // duty as the app's processing rate), returning permits as it
    // completes. On dense positions the permit gate is pure
    // arithmetic: backlog rank r = pos − ack_pos − 1 dispatches
    // immediately while r < Q (the initial permit grant) and otherwise
    // waits until the app has completed r − Q + 1 messages — dispatch
    // second = (r − Q) div D + 1. Same plan discipline as the throttle
    // keys: broadcast inequality pass, map-side gate, 4-group census;
    // flow_checksum = Σ dispatch-second pins every permit decision.
    "stream_consumer_flow" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val cur = ratedCursors(s, ev)
      val q = receiverQueueSize
      val gated = ev.join(broadcast(cur), col("event_id") > col("ack_pos"))
        .select(col("subscription"), col("rate"),
          (col("event_id") - col("ack_pos") - 1).as("r"))
        .withColumn("disp_s",
          when(col("r") < q, 0L)
            .otherwise(expr(s"(r - $q) div rate") + 1))
        .groupBy("subscription", "rate")
        .agg(count(lit(1)).as("backlog"),
          sum(when(col("disp_s") === 0, 1L).otherwise(0L))
            .as("n_immediate"),
          sum(when(col("disp_s") > 0, 1L).otherwise(0L))
            .as("n_flow_gated"),
          max(col("disp_s")).as("last_dispatch_s"),
          sum(col("disp_s")).as("flow_checksum"))
      cur.join(broadcast(gated), Seq("subscription", "rate"), "left")
        .select(col("subscription"), col("rate"),
          lit(q.toLong).as("queue_size"),
          coalesce(col("backlog"), lit(0L)).as("backlog"),
          coalesce(col("n_immediate"), lit(0L)).as("n_immediate"),
          coalesce(col("n_flow_gated"), lit(0L)).as("n_flow_gated"),
          coalesce(col("last_dispatch_s"), lit(0L)).as("last_dispatch_s"),
          coalesce(col("flow_checksum"), lit(0L)).as("flow_checksum"))
        .orderBy("subscription")
    }),

    // Tiered storage offload (`managedLedgerOffloadThreshold`): the
    // topic's ledgers (128 positions each) older than the newest 4 are
    // offloaded to long-term storage; reads UNION the two tiers
    // transparently. The census proves the split is a partition of the
    // corpus (n_msgs + pos_checksum reconcile in the spec) and sizes
    // each tier with the engine's one payload-byte convention
    // (Filters.chunkPayload). Map-side tiering off a 1-row broadcast
    // max; one 2-group census exchange.
    "source_tiered_offload" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val mx = ev.agg(max(expr(s"event_id div $ledgerWidth")).as("ml"))
      ev.crossJoin(broadcast(mx))
        .select(
          when(expr(s"event_id div $ledgerWidth") > col("ml") - keepLedgers,
            "bookkeeper").otherwise("offloaded").as("tier"),
          expr(s"event_id div $ledgerWidth").as("ledger_id"),
          col("event_id"),
          length(graft.relational.Filters.chunkPayload).as("bytes"))
        .groupBy("tier")
        .agg(countDistinct(col("ledger_id")).as("n_ledgers"),
          count(lit(1)).as("n_msgs"),
          min(col("event_id")).as("min_pos"),
          max(col("event_id")).as("max_pos"),
          sum(col("bytes")).as("bytes"),
          sum(col("event_id")).as("pos_checksum"))
        .orderBy("tier")
    }),

    // Size-based retention (`retention_size_in_mb`'s message-scale
    // analog — the time-based sibling is obs_retention_trim): when the
    // topic's stored bytes exceed the limit (50 % of total), the broker
    // deletes the OLDEST whole ledgers, but never past the ack floor
    // (min moved cursor across subscriptions — the same movedCursors
    // the TTL-expiry key produces, so the composition discipline
    // holds: a stuck subscription would pin this trim exactly as it
    // pins the time-based one until the TTL move unblocks it). A
    // ledger is trimmed iff it is fully acked AND the size BEFORE
    // trimming it still exceeds the limit. The running-size window
    // runs over the per-ledger frame (corpus/128 rows — metadata
    // scale, ledgers are GB-sized at a real broker), never the corpus.
    "obs_retention_size" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val minMd = Streams.movedCursors(ev)
        .agg(min(col("new_ack_pos")).as("min_md"))
      val ledgers = ev
        .groupBy(expr(s"event_id div $ledgerWidth").as("ledger_id"))
        .agg(sum(length(graft.relational.Filters.chunkPayload))
          .as("bytes"), max(col("event_id")).as("max_pos"))
        .localCheckpoint() // n/128 rows; totals + trim scan read it
      val tot = ledgers.agg(sum(col("bytes")).as("total"),
        count(lit(1)).as("n_ledgers"))
      val w = org.apache.spark.sql.expressions.Window
        .orderBy("ledger_id")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      ledgers.crossJoin(broadcast(minMd)).crossJoin(broadcast(tot))
        .withColumn("limit_bytes", expr("total div 2"))
        .withColumn("before", coalesce(sum(col("bytes")).over(w), lit(0L)))
        .withColumn("trimmed",
          col("max_pos") <= col("min_md") &&
          col("total") - col("before") > col("limit_bytes"))
        .groupBy("n_ledgers", "total", "limit_bytes")
        .agg(sum(when(col("trimmed"), 1L).otherwise(0L)).as("n_trimmed"),
          coalesce(sum(when(col("trimmed"), col("bytes"))), lit(0L))
            .as("bytes_reclaimed"),
          coalesce(min(when(!col("trimmed"), col("ledger_id"))), lit(-1L))
            .as("first_kept_ledger"),
          coalesce(max(when(col("trimmed"), col("max_pos"))), lit(-1L))
            .as("trim_pos"))
        .select(col("n_ledgers"), col("total").as("bytes_total"),
          col("limit_bytes"), col("n_trimmed"), col("bytes_reclaimed"),
          (col("total") - col("bytes_reclaimed")).as("bytes_remaining"),
          col("first_kept_ledger"), col("trim_pos"))
        .orderBy("n_ledgers")
    }),

    // Namespace bundle load report + hottest-bundle split: topics hash
    // into 2^16 slots split across 4 contiguous bundle ranges (the
    // keyshared/partitioned-topic portable md5 slot); the broker
    // splits the hottest bundle at its midpoint and the report shows
    // the before/after load. One 5-group corpus agg; everything after
    // runs on ≤5-row broadcast frames.
    "obs_bundle_split" -> ((s, dir) => {
      val s2 = s; import s2.implicits._
      val ev = Tables.events(s, dir)
      val width = hashSpace / bundleCount
      val tc = ev
        .select(concat(lit("topic_"), col("event_type")).as("topic"))
        .groupBy("topic").agg(count(lit(1)).as("n"))
        .withColumn("slot",
          pmod(graft.llm.Text.tokHashS(col("topic")), lit(hashSpace)))
        .localCheckpoint() // 5 rows; both phase censuses read it
      val bundles = (0 until bundleCount)
        .map(i => (i * width, (i + 1) * width)).toDF("lo", "hi")
      def census(ranges: DataFrame, phase: String): DataFrame =
        ranges.join(broadcast(tc),
            col("slot") >= col("lo") && col("slot") < col("hi"), "left")
          .groupBy("lo", "hi")
          .agg(count(col("topic")).as("n_topics"),
            coalesce(sum(col("n")), lit(0L)).as("n_msgs"))
          .select(lit(phase).as("phase"), col("lo"), col("hi"),
            col("n_topics"), col("n_msgs"))
      val before = census(bundles, "before").localCheckpoint() // 4 rows
      // hottest bundle: max load, ties to the lowest range start
      val hot = before.orderBy(col("n_msgs").desc, col("lo")).limit(1)
        .select(col("lo").as("hlo"), col("hi").as("hhi"))
      val after = bundles.crossJoin(broadcast(hot))
        .withColumn("mid", expr("(lo + hi) div 2"))
        .select(explode(when(col("lo") === col("hlo"),
            array(struct(col("lo"), col("mid").as("hi")),
              struct(col("mid").as("lo"), col("hi"))))
          .otherwise(array(struct(col("lo"), col("hi"))))).as("r"))
        .select(col("r.lo").as("lo"), col("r.hi").as("hi"))
      before.unionByName(census(after, "after"))
        .orderBy("phase", "lo")
    }),

    // ackTimeout redelivery — the redelivery path real consumers hit
    // most (no nack needed: the consumer just doesn't ack in time).
    // Fixture: processing time = user_id mod 128 + 1 seconds, halving
    // per attempt (warm caches); ackTimeout T = 8 s; 4 attempts, then
    // the dead-letter policy fires. A message acks on the first
    // attempt whose halved processing time fits inside T — pure
    // integer arithmetic (same div on both engines), so the whole
    // ladder is map-side: no loop, no join, one ≤5-group census. The
    // clock checksum pins every message's ack instant (k−1 timeouts
    // of T each + the fitting attempt's processing time).
    "stream_ack_timeout" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val t = 8L
      val attempt = when(col("delay") <= t, 1L)
        .when(expr("delay div 2") <= t, 2L)
        .when(expr("delay div 4") <= t, 3L)
        .when(expr("delay div 8") <= t, 4L)
      val procTime = when(col("k") === 1, col("delay"))
        .when(col("k") === 2, expr("delay div 2"))
        .when(col("k") === 3, expr("delay div 4"))
        .otherwise(expr("delay div 8"))
      ev.select((pmod(col("user_id"), lit(128)) + 1).as("delay"))
        .select(col("delay"), attempt.as("k"))
        .select(
          when(col("k").isNotNull, "ACKED").otherwise("TIMEOUT_DLQ")
            .as("disposition"),
          coalesce(col("k"), lit(4L)).as("attempts"),
          when(col("k").isNotNull, (col("k") - 1) * t + procTime)
            .otherwise(lit(4L * t)).as("ack_offset_s"))
        .groupBy("disposition", "attempts")
        .agg(count(lit(1)).as("n"), sum(col("ack_offset_s")).as("clock_checksum"))
        .orderBy("disposition", "attempts")
    }),

    // Individual vs cumulative acknowledgment, as ledger accounting:
    // acknowledgeCumulative can only move markDelete (the prefix
    // cursor), while individual acks above it persist as the managed
    // ledger's individuallyDeletedMessages RANGE SET — the broker's
    // real storage cost is the RANGE COUNT, not the ack count. The
    // obs_ack_holes fixture (per-sub pmod-7 scattered acks) makes the
    // range census pure arithmetic: a run starts at e iff e is acked
    // and e−1 is not — both evaluable map-side on the same row, no
    // self-join, no window. avg_run_len is the compactness the
    // range-set compression actually sees.
    "obs_cumulative_ack" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val mx = ev.agg(max(col("event_id")).as("m"))
      val cur = Streams.subCursors(ev).crossJoin(broadcast(mx))
        .withColumn("k", Streams.subKExpr) // residue = fixture INDEX
        .localCheckpoint()
      val acked = pmod(col("event_id"), lit(7)) === col("k")
      val ackedPrev = pmod(col("event_id") - 1, lit(7)) === col("k")
      val md = ev.join(broadcast(cur), col("event_id") > col("ack_pos"))
        .groupBy("subscription")
        .agg((min(when(!acked, col("event_id"))) - 1).as("md0"))
      val withMd = cur.join(broadcast(md), Seq("subscription"), "left")
        .select(col("subscription"), col("ack_pos"), col("k"),
          coalesce(col("md0"), greatest(col("ack_pos"), col("m")))
            .as("mark_delete"))
        .localCheckpoint()
      val census = ev.join(broadcast(withMd),
          col("event_id") > col("mark_delete"))
        .groupBy("subscription")
        .agg(sum(when(acked, 1L).otherwise(0L)).as("n_acked_above"),
          sum(when(acked && !ackedPrev, 1L).otherwise(0L)).as("n_ranges"))
      withMd.select(col("subscription"), col("mark_delete"))
        .join(broadcast(census), Seq("subscription"), "left")
        .select(col("subscription"), col("mark_delete"),
          coalesce(col("n_acked_above"), lit(0L)).as("n_acked_above"),
          coalesce(col("n_ranges"), lit(0L)).as("n_ranges"),
          when(coalesce(col("n_ranges"), lit(0L)) > 0,
            expr("n_acked_above div n_ranges")).otherwise(lit(0L))
            .as("avg_run_len"))
        .orderBy("subscription")
    }),

    // Capacity forecasting — "when does this topic double?": per-topic
    // daily publish counts → OLS slope (msgs/day) → days until the
    // stored count doubles at the current trend. The regression runs
    // entirely in BIGINT (slope carried as an exact num/den pair; the
    // rounded double is presentation only) so the oracle hash-matches
    // — the agg_regression lesson, taken one step further: n ≤ 31 days
    // of small integer counts need no decimal ladder at all. Two-level
    // aggregate: (topic, day) census with map-side partials, then the
    // ≤topics×31-row frame folds to one row per topic.
    "obs_quota_forecast" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val daily = ev.select(
          concat(lit("topic_"), col("event_type")).as("topic"),
          datediff(col("ts").cast("date"), lit("2024-01-01").cast("date"))
            .cast("long").as("d"))
        .groupBy("topic", "d").agg(count(lit(1)).as("y"))
      val m = daily.groupBy("topic").agg(
        count(lit(1)).as("n_days"),
        sum(col("y")).as("total"),
        sum(col("d")).as("sd"),
        sum(col("y") * col("d")).as("sdy"),
        sum(col("d") * col("d")).as("sdd"))
      m.select(col("topic"), col("n_days"), col("total"),
          (col("n_days") * col("sdy") - col("sd") * col("total"))
            .as("slope_num"),
          (col("n_days") * col("sdd") - col("sd") * col("sd"))
            .as("slope_den"))
        // slope_den = 0 ⟺ all of a topic's events land on one distinct
        // day (n_days = 1). Spark's non-ANSI x/0 is NULL while DuckDB's
        // IEEE double division is ±inf/NaN — guard BOTH engines to NULL
        // so a degenerate fixture can't split the hash gate (ADVICE r11)
        .withColumn("slope_msgs_day",
          when(col("slope_den") > 0,
            round(col("slope_num").cast("double") / col("slope_den"), 4))
            .otherwise(lit(null)))
        // doubling needs `total` more messages at slope num/den per day
        .withColumn("days_to_double",
          when(col("slope_num") > 0,
            expr("(total * slope_den + slope_num - 1) div slope_num"))
            .otherwise(lit(-1L)))
        .orderBy("topic")
    }),

    // The pulsar-admin `topics stats` rollup — the one observability
    // view a topic owner reads first: per-topic message/byte counters,
    // average message size, distinct producers (the chunkRows
    // producer convention, user_id mod 8), ledger count (the
    // 128-position convention) and the position span. One scan, one
    // 5-group census; avg is integer div so both engines agree.
    "obs_topic_stats" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      ev.select(concat(lit("topic_"), col("event_type")).as("topic"),
          col("event_id"),
          pmod(col("user_id"), lit(8)).as("producer_id"),
          expr(s"event_id div $ledgerWidth").as("ledger_id"),
          length(graft.relational.Filters.chunkPayload).cast("long")
            .as("bytes"))
        .groupBy("topic")
        .agg(count(lit(1)).as("msg_in_counter"),
          sum(col("bytes")).as("bytes_in_counter"),
          countDistinct(col("producer_id")).as("n_producers"),
          countDistinct(col("ledger_id")).as("n_ledgers"),
          min(col("event_id")).as("min_pos"),
          max(col("event_id")).as("max_pos"))
        .withColumn("avg_msg_bytes",
          expr("bytes_in_counter div msg_in_counter"))
        .orderBy("topic")
    }),

    // Priority-level dispatch (Shared subscription `priorityLevel`):
    // two priority-0 consumers (2 permits per tick each, round-robin)
    // take a tick's messages first; the priority-1 consumer (4
    // permits) gets the spill; past all permits the tick's remainder
    // waits (no_permits — redelivered next tick, not modeled: the
    // census is the broker's dispatch-rate view, not a queue sim).
    // Tick = 1 h of event time; one tick-keyed window shuffle.
    "stream_consumer_priority" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val tick = date_trunc("hour", col("ts"))
      val r = row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(tick).orderBy(col("event_id")))
      ev.select(tick.as("tick"), r.as("r"))
        .select(col("tick"),
          when(col("r") <= 4,
            when(pmod(col("r"), lit(2)) === 1, "c0").otherwise("c1"))
            .when(col("r") <= 8, "c2")
            .otherwise("no_permits").as("consumer"),
          when(col("r") <= 4, 0).when(col("r") <= 8, 1)
            .otherwise(-1).as("priority"))
        .groupBy("consumer", "priority")
        .agg(count(lit(1)).as("n_msgs"),
          countDistinct(col("tick")).as("n_ticks"))
        .orderBy("consumer")
    })
  )

  private val ackedD = "(user_id % 3) <> 0"

  val oracleSql: Map[String, String] = Map(

    "stream_batch_index_ack" ->
      s"""WITH e AS (
         |  SELECT event_id // ${graft.relational.Filters.entryBatchK} AS entry_id, COUNT(*) AS n_msgs,
         |    CAST(SUM(CASE WHEN $ackedD THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_acked
         |  FROM events GROUP BY 1),
         |md AS (
         |  SELECT coalesce(MIN(CASE WHEN n_acked <> n_msgs
         |                      THEN entry_id END) - 1,
         |                  MAX(entry_id)) AS mark_delete_entry FROM e)
         |SELECT CAST(COUNT(*) AS BIGINT) AS n_entries,
         |  CAST(SUM(CASE WHEN n_acked = n_msgs THEN 1 ELSE 0 END)
         |    AS BIGINT) AS full_entries,
         |  CAST(SUM(CASE WHEN n_acked > 0 AND n_acked <> n_msgs
         |    THEN 1 ELSE 0 END) AS BIGINT) AS partial_entries,
         |  CAST(SUM(CASE WHEN n_acked = 0 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS untouched_entries,
         |  CAST(MIN(md.mark_delete_entry) AS BIGINT) AS mark_delete_entry,
         |  CAST(SUM(CASE WHEN entry_id > md.mark_delete_entry
         |    THEN n_msgs - n_acked ELSE 0 END) AS BIGINT)
         |    AS redeliver_pip54,
         |  CAST(SUM(CASE WHEN entry_id > md.mark_delete_entry
         |    AND n_acked <> n_msgs THEN n_msgs ELSE 0 END) AS BIGINT)
         |    AS redeliver_entry_level
         |FROM e, md""".stripMargin,

    "obs_backlog_quota" ->
      s"""WITH mx AS (SELECT MAX(event_id) AS m,
         |              COUNT(*) // $quotaDenom AS quota FROM events),
         |subs AS (SELECT * FROM (VALUES $subsValsD) s(subscription, f)),
        |c AS (SELECT subscription,
        |        CASE WHEN f = 0.0 THEN CAST(-1 AS BIGINT)
        |             ELSE CAST(floor(m * f) AS BIGINT) END AS ack_pos,
        |        CASE subscription WHEN 'sub_slow' THEN 'producer_exception'
        |             WHEN 'sub_paused' THEN 'consumer_backlog_eviction'
        |             ELSE 'producer_request_hold' END AS policy,
        |        m, quota
        |      FROM subs, mx),
        |b AS (SELECT c.subscription, COUNT(*) AS backlog
        |      FROM events e JOIN c ON e.event_id > c.ack_pos
        |      GROUP BY 1)
        |SELECT c.subscription, c.policy, c.ack_pos,
        |  CAST(coalesce(b.backlog, 0) AS BIGINT) AS backlog,
        |  CAST(c.quota AS BIGINT) AS quota,
        |  CASE WHEN coalesce(b.backlog, 0) <= c.quota THEN 'within_quota'
        |       ELSE c.policy END AS action,
        |  CAST(CASE WHEN coalesce(b.backlog, 0) > c.quota
        |            AND c.policy = 'consumer_backlog_eviction'
        |       THEN c.m - c.quota ELSE c.ack_pos END AS BIGINT)
        |    AS new_ack_pos,
        |  CAST(CASE WHEN coalesce(b.backlog, 0) > c.quota
        |            AND c.policy = 'consumer_backlog_eviction'
        |       THEN c.m - c.quota - c.ack_pos ELSE 0 END AS BIGINT)
        |    AS n_evicted
        |FROM c LEFT JOIN b USING (subscription)
        |ORDER BY c.subscription""".stripMargin,

    "stream_dispatch_throttle" ->
      s"""WITH mx AS (SELECT MAX(event_id) AS m FROM events),
         |subs AS (SELECT * FROM (VALUES $subsRateValsD)
         |         s(subscription, f, rate)),
        |c AS (SELECT subscription, CAST(rate AS BIGINT) AS rate,
        |        CASE WHEN f = 0.0 THEN CAST(-1 AS BIGINT)
        |             ELSE CAST(floor(m * f) AS BIGINT) END AS ack_pos
        |      FROM subs, mx),
        |d AS (SELECT c.subscription, c.rate, COUNT(*) AS backlog,
        |        MAX((e.event_id - c.ack_pos - 1) // c.rate) + 1
        |          AS drain_seconds,
        |        SUM(CASE WHEN (e.event_id - c.ack_pos - 1) // c.rate = 0
        |            THEN 1 ELSE 0 END) AS msgs_slot0,
        |        SUM((e.event_id - c.ack_pos - 1) // c.rate)
        |          AS slot_checksum
        |      FROM events e JOIN c ON e.event_id > c.ack_pos
        |      GROUP BY 1, 2)
        |SELECT c.subscription, c.rate,
        |  CAST(coalesce(d.backlog, 0) AS BIGINT) AS backlog,
        |  CAST(coalesce(d.drain_seconds, 0) AS BIGINT) AS drain_seconds,
        |  CAST(coalesce(d.msgs_slot0, 0) AS BIGINT) AS msgs_slot0,
        |  CAST(coalesce(d.slot_checksum, 0) AS BIGINT) AS slot_checksum
        |FROM c LEFT JOIN d USING (subscription, rate)
        |ORDER BY c.subscription""".stripMargin,

    "stream_consumer_flow" ->
      s"""WITH mx AS (SELECT MAX(event_id) AS m FROM events),
         |subs AS (SELECT * FROM (VALUES $subsRateValsD)
         |         s(subscription, f, rate)),
         |c AS (SELECT subscription, CAST(rate AS BIGINT) AS rate,
         |        CASE WHEN f = 0.0 THEN CAST(-1 AS BIGINT)
         |             ELSE CAST(floor(m * f) AS BIGINT) END AS ack_pos
         |      FROM subs, mx),
         |g AS (SELECT c.subscription, c.rate,
         |        CASE WHEN e.event_id - c.ack_pos - 1 < $receiverQueueSize
         |             THEN 0
         |             ELSE (e.event_id - c.ack_pos - 1 - $receiverQueueSize)
         |                  // c.rate + 1 END AS disp_s
         |      FROM events e JOIN c ON e.event_id > c.ack_pos),
         |d AS (SELECT subscription, rate, COUNT(*) AS backlog,
         |        SUM(CASE WHEN disp_s = 0 THEN 1 ELSE 0 END) AS n_immediate,
         |        SUM(CASE WHEN disp_s > 0 THEN 1 ELSE 0 END) AS n_flow_gated,
         |        MAX(disp_s) AS last_dispatch_s,
         |        SUM(disp_s) AS flow_checksum
         |      FROM g GROUP BY 1, 2)
         |SELECT c.subscription, c.rate,
         |  CAST($receiverQueueSize AS BIGINT) AS queue_size,
         |  CAST(coalesce(d.backlog, 0) AS BIGINT) AS backlog,
         |  CAST(coalesce(d.n_immediate, 0) AS BIGINT) AS n_immediate,
         |  CAST(coalesce(d.n_flow_gated, 0) AS BIGINT) AS n_flow_gated,
         |  CAST(coalesce(d.last_dispatch_s, 0) AS BIGINT) AS last_dispatch_s,
         |  CAST(coalesce(d.flow_checksum, 0) AS BIGINT) AS flow_checksum
         |FROM c LEFT JOIN d USING (subscription, rate)
         |ORDER BY c.subscription""".stripMargin,

    "stream_publish_throttle" ->
      s"""WITH ps AS (
         |  SELECT 'topic_' || event_type AS topic,
         |    event_id // $publishRateMsgs AS slot,
         |    COUNT(*) AS n
         |  FROM events GROUP BY 1, 2)
         |SELECT topic,
         |  CAST(SUM(n) AS BIGINT) AS n_msgs,
         |  CAST(COUNT(*) AS BIGINT) AS n_active_slots,
         |  MIN(slot) AS first_slot, MAX(slot) AS last_slot,
         |  CAST(MAX(n) AS BIGINT) AS peak_slot_msgs,
         |  CAST(SUM(slot * n) AS BIGINT) AS slot_checksum,
         |  CAST(MAX(slot) - MIN(slot) + 1 AS BIGINT) AS paced_seconds
         |FROM ps GROUP BY 1 ORDER BY topic""".stripMargin,

    "obs_retention_size" ->
      s"""WITH mx AS (SELECT MAX(event_id) AS m,
         |              date_trunc('second', MAX(ts)) - INTERVAL 7 DAY
         |                AS cutoff
         |            FROM events),
         |subs AS (SELECT * FROM (VALUES $subsValsD) s(subscription, f)),
        |c AS (SELECT CASE WHEN f = 0.0 THEN CAST(-1 AS BIGINT)
        |             ELSE CAST(floor(m * f) AS BIGINT) END AS ack_pos
        |      FROM subs, mx),
        |xp AS (SELECT coalesce(MAX(e.event_id), -1) AS expiry_pos
        |       FROM events e, mx
        |       WHERE date_trunc('second', e.ts) <= mx.cutoff),
        |md AS (SELECT MIN(greatest(ack_pos, expiry_pos)) AS min_md
        |       FROM c, xp),
        |l AS (SELECT event_id // $ledgerWidth AS ledger_id,
        |        CAST(SUM(length(event_type || ':' ||
        |          CAST(user_id AS VARCHAR) || ':' || props)) AS BIGINT)
        |          AS bytes,
        |        MAX(event_id) AS max_pos
        |      FROM events GROUP BY 1),
        |tot AS (SELECT CAST(SUM(bytes) AS BIGINT) AS total,
        |          COUNT(*) AS n_ledgers FROM l),
        |t AS (SELECT l.*, md.min_md, tot.total, tot.n_ledgers,
        |        tot.total // 2 AS limit_bytes,
        |        CAST(coalesce(SUM(bytes) OVER (ORDER BY ledger_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |          AS BIGINT) AS before
        |      FROM l, md, tot),
        |tr AS (SELECT *, (max_pos <= min_md AND
        |         total - before > limit_bytes) AS trimmed FROM t)
        |SELECT CAST(n_ledgers AS BIGINT) AS n_ledgers,
        |  total AS bytes_total, CAST(limit_bytes AS BIGINT) AS limit_bytes,
        |  CAST(SUM(CASE WHEN trimmed THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_trimmed,
        |  CAST(coalesce(SUM(CASE WHEN trimmed THEN bytes END), 0)
        |    AS BIGINT) AS bytes_reclaimed,
        |  CAST(total - coalesce(SUM(CASE WHEN trimmed THEN bytes END), 0)
        |    AS BIGINT) AS bytes_remaining,
        |  CAST(coalesce(MIN(CASE WHEN NOT trimmed THEN ledger_id END), -1)
        |    AS BIGINT) AS first_kept_ledger,
        |  CAST(coalesce(MAX(CASE WHEN trimmed THEN max_pos END), -1)
        |    AS BIGINT) AS trim_pos
        |FROM tr GROUP BY 1, 2, 3 ORDER BY n_ledgers""".stripMargin,

    "source_tiered_offload" ->
      s"""WITH mx AS (SELECT MAX(event_id // $ledgerWidth) AS ml FROM events)
         |SELECT CASE WHEN event_id // $ledgerWidth > ml - $keepLedgers THEN 'bookkeeper'
         |            ELSE 'offloaded' END AS tier,
         |  CAST(COUNT(DISTINCT event_id // $ledgerWidth) AS BIGINT) AS n_ledgers,
        |  CAST(COUNT(*) AS BIGINT) AS n_msgs,
        |  MIN(event_id) AS min_pos, MAX(event_id) AS max_pos,
        |  CAST(SUM(length(event_type || ':' || CAST(user_id AS VARCHAR)
        |    || ':' || props)) AS BIGINT) AS bytes,
        |  CAST(SUM(event_id) AS BIGINT) AS pos_checksum
        |FROM events, mx GROUP BY 1 ORDER BY tier""".stripMargin,

    "obs_bundle_split" -> {
      val slotD = "(" + graft.llm.Text.tokHashDOn("topic") + " % 65536)"
      s"""WITH tc AS (
         |  SELECT topic, n, $slotD AS slot FROM (
         |    SELECT 'topic_' || event_type AS topic, COUNT(*) AS n
         |    FROM events GROUP BY 1)),
         |bundles AS (SELECT * FROM (VALUES (0, 16384), (16384, 32768),
         |              (32768, 49152), (49152, 65536)) b(lo, hi)),
         |before AS (
         |  SELECT b.lo, b.hi, COUNT(tc.topic) AS n_topics,
         |    coalesce(SUM(tc.n), 0) AS n_msgs
         |  FROM bundles b LEFT JOIN tc
         |    ON tc.slot >= b.lo AND tc.slot < b.hi
         |  GROUP BY 1, 2),
         |hot AS (SELECT lo AS hlo, hi AS hhi FROM before
         |        ORDER BY n_msgs DESC, lo LIMIT 1),
         |ranges AS (
         |  SELECT b.lo, (b.lo + b.hi) // 2 AS hi FROM bundles b, hot
         |    WHERE b.lo = hot.hlo
         |  UNION ALL
         |  SELECT (b.lo + b.hi) // 2 AS lo, b.hi FROM bundles b, hot
         |    WHERE b.lo = hot.hlo
         |  UNION ALL
         |  SELECT b.lo, b.hi FROM bundles b, hot WHERE b.lo <> hot.hlo),
         |after AS (
         |  SELECT r.lo, r.hi, COUNT(tc.topic) AS n_topics,
         |    coalesce(SUM(tc.n), 0) AS n_msgs
         |  FROM ranges r LEFT JOIN tc
         |    ON tc.slot >= r.lo AND tc.slot < r.hi
         |  GROUP BY 1, 2)
         |SELECT phase, CAST(lo AS BIGINT) AS lo, CAST(hi AS BIGINT) AS hi,
         |  CAST(n_topics AS BIGINT) AS n_topics,
         |  CAST(n_msgs AS BIGINT) AS n_msgs
         |FROM (SELECT 'before' AS phase, * FROM before
         |      UNION ALL SELECT 'after' AS phase, * FROM after)
         |ORDER BY phase, lo""".stripMargin
    },

    "stream_ack_timeout" ->
      """WITH d AS (SELECT (user_id % 128) + 1 AS delay FROM events),
        |a AS (SELECT delay,
        |        CASE WHEN delay <= 8 THEN 1
        |             WHEN delay // 2 <= 8 THEN 2
        |             WHEN delay // 4 <= 8 THEN 3
        |             WHEN delay // 8 <= 8 THEN 4 END AS k
        |      FROM d),
        |r AS (SELECT
        |        CASE WHEN k IS NOT NULL THEN 'ACKED'
        |             ELSE 'TIMEOUT_DLQ' END AS disposition,
        |        CAST(coalesce(k, 4) AS BIGINT) AS attempts,
        |        CASE WHEN k IS NOT NULL THEN (k - 1) * 8 +
        |          (CASE k WHEN 1 THEN delay WHEN 2 THEN delay // 2
        |                  WHEN 3 THEN delay // 4 ELSE delay // 8 END)
        |        ELSE 32 END AS ack_offset_s
        |      FROM a)
        |SELECT disposition, attempts, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(ack_offset_s) AS BIGINT) AS clock_checksum
        |FROM r GROUP BY 1, 2 ORDER BY disposition, attempts""".stripMargin,

    "obs_cumulative_ack" ->
      s"""WITH mx AS (SELECT MAX(event_id) AS m FROM events),
         |subs AS (SELECT * FROM (VALUES $subsKValsD) s(subscription, f, k)),
        |c AS (SELECT subscription, k,
        |        CASE WHEN f = 0.0 THEN CAST(-1 AS BIGINT)
        |             ELSE CAST(floor(m * f) AS BIGINT) END AS ack_pos, m
        |      FROM subs, mx),
        |md AS (SELECT c.subscription,
        |         MIN(CASE WHEN e.event_id % 7 <> c.k
        |             THEN e.event_id END) - 1 AS md0
        |       FROM events e JOIN c ON e.event_id > c.ack_pos
        |       GROUP BY 1),
        |w AS (SELECT c.subscription, c.k,
        |        coalesce(md.md0, greatest(c.ack_pos, c.m)) AS mark_delete
        |      FROM c LEFT JOIN md USING (subscription)),
        |a AS (SELECT w.subscription,
        |        CAST(SUM(CASE WHEN e.event_id % 7 = w.k
        |          THEN 1 ELSE 0 END) AS BIGINT) AS n_acked_above,
        |        CAST(SUM(CASE WHEN e.event_id % 7 = w.k AND
        |          ((e.event_id - 1) % 7 + 7) % 7 <> w.k
        |          THEN 1 ELSE 0 END) AS BIGINT) AS n_ranges
        |      FROM events e JOIN w ON e.event_id > w.mark_delete
        |      GROUP BY 1)
        |SELECT w.subscription, w.mark_delete,
        |  coalesce(a.n_acked_above, 0) AS n_acked_above,
        |  coalesce(a.n_ranges, 0) AS n_ranges,
        |  CAST(CASE WHEN coalesce(a.n_ranges, 0) > 0
        |       THEN a.n_acked_above // a.n_ranges ELSE 0 END AS BIGINT)
        |    AS avg_run_len
        |FROM w LEFT JOIN a USING (subscription)
        |ORDER BY w.subscription""".stripMargin,

    "obs_quota_forecast" ->
      """WITH daily AS (
        |  SELECT 'topic_' || event_type AS topic,
        |    CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
        |      AS BIGINT) AS d,
        |    CAST(COUNT(*) AS BIGINT) AS y
        |  FROM events GROUP BY 1, 2),
        |m AS (
        |  SELECT topic, CAST(COUNT(*) AS BIGINT) AS n_days,
        |    CAST(SUM(y) AS BIGINT) AS total,
        |    CAST(SUM(d) AS BIGINT) AS sd,
        |    CAST(SUM(y * d) AS BIGINT) AS sdy,
        |    CAST(SUM(d * d) AS BIGINT) AS sdd
        |  FROM daily GROUP BY 1),
        |p AS (
        |  SELECT topic, n_days, total,
        |    n_days * sdy - sd * total AS slope_num,
        |    n_days * sdd - sd * sd AS slope_den
        |  FROM m)
        |SELECT topic, n_days, total,
        |  CAST(slope_num AS BIGINT) AS slope_num,
        |  CAST(slope_den AS BIGINT) AS slope_den,
        |  CASE WHEN slope_den > 0
        |       THEN ROUND(CAST(slope_num AS DOUBLE) / slope_den, 4)
        |       END AS slope_msgs_day,
        |  CAST(CASE WHEN slope_num > 0
        |       THEN (total * slope_den + slope_num - 1) // slope_num
        |       ELSE -1 END AS BIGINT) AS days_to_double
        |FROM p ORDER BY topic""".stripMargin,

    "obs_topic_stats" ->
      s"""SELECT 'topic_' || event_type AS topic,
         |  CAST(COUNT(*) AS BIGINT) AS msg_in_counter,
         |  CAST(SUM(length(event_type || ':' || CAST(user_id AS VARCHAR)
         |    || ':' || props)) AS BIGINT) AS bytes_in_counter,
         |  CAST(COUNT(DISTINCT user_id % 8) AS BIGINT) AS n_producers,
         |  CAST(COUNT(DISTINCT event_id // $ledgerWidth) AS BIGINT) AS n_ledgers,
        |  MIN(event_id) AS min_pos, MAX(event_id) AS max_pos,
        |  CAST(SUM(length(event_type || ':' || CAST(user_id AS VARCHAR)
        |    || ':' || props)) // COUNT(*) AS BIGINT) AS avg_msg_bytes
        |FROM events GROUP BY 1 ORDER BY topic""".stripMargin,

    "stream_consumer_priority" ->
      """WITH t AS (
        |  SELECT ROW_NUMBER() OVER (PARTITION BY date_trunc('hour', ts)
        |           ORDER BY event_id) AS r,
        |         date_trunc('hour', ts) AS tick
        |  FROM events)
        |SELECT CASE WHEN r <= 4 THEN
        |         (CASE WHEN r % 2 = 1 THEN 'c0' ELSE 'c1' END)
        |       WHEN r <= 8 THEN 'c2' ELSE 'no_permits' END AS consumer,
        |  CAST(CASE WHEN r <= 4 THEN 0 WHEN r <= 8 THEN 1
        |       ELSE -1 END AS INTEGER) AS priority,
        |  CAST(COUNT(*) AS BIGINT) AS n_msgs,
        |  CAST(COUNT(DISTINCT tick) AS BIGINT) AS n_ticks
        |FROM t GROUP BY 1, 2 ORDER BY consumer""".stripMargin
  )
}
