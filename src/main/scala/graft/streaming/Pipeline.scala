package graft.streaming

import graft.selector.Selector
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The flagship message-filtering pipeline (SURVEY.md §7.3) and the
  * shared streaming transforms. Every function here takes a DataFrame
  * and returns a DataFrame built purely from incremental-izable ops, so
  * the SAME code runs as a batch job (Verify/Bench/oracle) and as a
  * Structured Streaming job (StreamSpec asserts equality) — this is the
  * engine's answer to a broker-side entry filter: the filter/route/
  * enrich/aggregate logic is one declarative plan, and the micro-batch
  * planner re-executes it incrementally per batch.
  */
object Pipeline {

  /** The flagship selector (JMS §3.8 string, compiled to Catalyst). */
  val acceptSelector = "event_type IN ('purchase', 'signup') AND props.k >= 50 AND value BETWEEN 10 AND 400"
  val rescheduleSelector = "event_type = 'error'"

  /** PIP-105 tri-state routing: classify, never drop. */
  def route(events: DataFrame): DataFrame =
    events.withColumn("verdict",
      when(Selector.compileEvents(acceptSelector), "ACCEPT")
        .when(Selector.compileEvents(rescheduleSelector), "RESCHEDULE")
        .otherwise("REJECT"))

  /** PIP-105 redelivery (VERDICT r04 missing item 2): a RESCHEDULE
    * verdict is not terminal — the broker redelivers the message with an
    * incremented delivery count (the JMS JMSXDeliveryCount convention)
    * until the verdict changes or the max-redelivery policy dead-letters
    * it. Routing may reference the delivery count, which is what makes a
    * retry meaningful: here the transient fault on an 'error' event
    * clears once delivery_count exceeds event_id mod 4 — deterministic
    * (a stand-in for backoff elapsing), so the final disposition is
    * closed-form oracle-able. */
  val maxDeliveries = 3

  /** One delivery attempt: tri-state route aware of `delivery_count`. */
  def routeAttempt(ev: DataFrame): DataFrame =
    ev.withColumn("verdict",
      when(Selector.compileEvents(acceptSelector), "ACCEPT")
        .when(Selector.compileEvents(rescheduleSelector) &&
          pmod(col("event_id"), lit(4)) < col("delivery_count"), "ACCEPT")
        .when(Selector.compileEvents(rescheduleSelector), "RESCHEDULE")
        .otherwise("REJECT"))

  /** Batch twin of the redelivery loop: final disposition + attempt
    * count per message. Attempt 1 routes the full input (one scan);
    * every later attempt routes only the previous round's RESCHEDULE
    * set, localCheckpoint-pinned so the shrinking pending frame is
    * materialized once instead of re-deriving the whole chain (the two
    * small per-call blocks are GC-managed — the loop is depth-bounded by
    * maxDeliveries, not data-dependent like Cluster's). */
  def redeliver(events: DataFrame): DataFrame = {
    var pending = events.withColumn("delivery_count", lit(1))
    var parts = List.empty[DataFrame]
    for (a <- 1 to maxDeliveries) {
      val routed = routeAttempt(pending)
      val last = a == maxDeliveries
      val fin =
        (if (last) routed else routed.where(col("verdict") =!= "RESCHEDULE"))
          .select(col("event_id"),
            when(col("verdict") === "RESCHEDULE", lit("DEAD_LETTER"))
              .otherwise(col("verdict")).as("disposition"),
            col("delivery_count").cast("long").as("attempts"))
      parts ::= fin
      if (!last)
        pending = routed.where(col("verdict") === "RESCHEDULE")
          .drop("verdict")
          .withColumn("delivery_count", col("delivery_count") + 1)
          .localCheckpoint()
    }
    parts.reduce(_ unionByName _)
  }

  /** Columns a delivery attempt needs (the re-enqueue payload). */
  val redeliverySchema = "event_id LONG, event_type STRING, value DOUBLE, props STRING, delivery_count INT"

  /** Streaming redelivery: the file-source re-enqueue loop. Each
    * micro-batch routes its messages; final verdicts append to `outDir`
    * (dead-lettering RESCHEDULEs that exhausted maxDeliveries), and
    * still-RESCHEDULE'd messages are written BACK into `inDir` with
    * delivery_count+1 — the broker's redelivery, expressed as a file
    * re-enqueue since no broker connector exists offline. One
    * AvailableNow pass consumes everything enqueued before it started,
    * so the driver loops passes until the input quiesces — bounded by
    * maxDeliveries because each pass increments every pending message's
    * delivery count. StreamSpec asserts the result == redeliver(). */
  def redeliverStream(s: SparkSession, inDir: String, outDir: String, ckpt: String): Unit =
    reenqueueLoop(s, inDir, outDir, ckpt, redeliverySchema,
      fin => fin.select(col("event_id"),
        when(col("verdict") === "RESCHEDULE", lit("DEAD_LETTER"))
          .otherwise(col("verdict")).as("disposition"),
        col("delivery_count").cast("long").as("attempts")),
      p => p.withColumn("delivery_count", col("delivery_count") + 1))

  /** The ONE at-least-once file re-enqueue loop (the broker dispatch
    * recipe) — redeliverStream and its backoff sibling differ only in
    * payload schema, final-row projection, and the re-enqueue
    * transform, so the idempotence machinery cannot drift between
    * them. Each micro-batch routes its messages; final verdicts land
    * in an idempotent per-batch sink (each batch OVERWRITES its own
    * batch=<id> partition dir, so a batch replayed after a mid-write
    * failure rewrites its own output instead of appending duplicate
    * dispositions); still-RESCHEDULE'd messages are transformed and
    * appended BACK into `inDir` under a per-batch marker guard (json
    * appends have no overwrite-in-place; the marker lives under an
    * underscore dir, which Spark's file listing treats as hidden — the
    * stream source never reads it; a crash exactly between the append
    * and the marker still duplicates — the classic at-least-once
    * window a real broker closes with transactions). One AvailableNow
    * pass consumes everything enqueued before it started, so the
    * driver loops passes until the input quiesces — bounded by
    * maxDeliveries because each pass increments every pending
    * message's delivery count. */
  private def reenqueueLoop(s: SparkSession, inDir: String, outDir: String,
      ckpt: String, schema: String,
      finalRows: DataFrame => DataFrame,
      reenqueue: DataFrame => DataFrame): Unit = {
    import org.apache.spark.sql.streaming.Trigger
    for (_ <- 1 to maxDeliveries) {
      val q = s.readStream.schema(schema).json(inDir)
        .writeStream.trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          val routed = routeAttempt(batch).localCheckpoint()
          finalRows(routed.where(col("verdict") =!= "RESCHEDULE" ||
              col("delivery_count") >= maxDeliveries))
            .write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
          val markerDir = java.nio.file.Paths.get(inDir, "_reenq")
          java.nio.file.Files.createDirectories(markerDir)
          val marker = markerDir.resolve(s"done_$batchId")
          if (!java.nio.file.Files.exists(marker)) {
            reenqueue(routed.where(col("verdict") === "RESCHEDULE" &&
                col("delivery_count") < maxDeliveries)
              .drop("verdict"))
              .write.mode("append").json(inDir)
            java.nio.file.Files.createFile(marker)
          }
          ()
        }
        .start()
      q.awaitTermination()
    }
  }

  /** Exponential nack backoff (VERDICT r09 item 4): a RESCHEDULE does
    * not redeliver immediately — the negative-ack backoff ladder
    * shifts attempt a+1's deliver-at by base·2^(a−1), composing
    * stream_delayed_delivery's deliver-at mechanics with the
    * redelivery loop's attempt accounting. Attempt a therefore
    * delivers at t + base·(2^(a−1) − 1) (the geometric partial sum),
    * bounded by maxDeliveries. */
  val backoffBaseSec = 60L

  /** Batch twin, closed-form on the FINAL WATERMARK (the dlq_ageout
    * precedent): a ladder is complete only when its final attempt's
    * deliver-at is at or before the corpus' max event-time second — a
    * ladder still climbing past that clock has emitted nothing in the
    * unbounded form, so it is excluded here too (StreamSpec crafts
    * exactly such a pending ladder and asserts the gate drops it).
    * delivered_at is the final attempt's visible clock; for a
    * DEAD_LETTER that is the failed last attempt's deliver-at — when
    * the DLQ entry lands. Shape: the redeliver() closed form + a
    * map-side shift + a 1-row broadcast max — no new shuffle. */
  def redeliverBackoffBatch(events: DataFrame): DataFrame =
    redeliverBackoffFrom(redeliver(events), events)

  /** The same closed form over an already-computed disposition frame —
    * the Streams key feeds it the persisted ledger artifact so the
    * 3-pass loop isn't re-run per report. */
  def redeliverBackoffFrom(fin: DataFrame, events: DataFrame): DataFrame = {
    val ev = events.select(col("event_id"),
      unix_timestamp(date_trunc("second", col("ts"))).as("t"))
    val mx = ev.agg(max(col("t")).as("max_t"))
    fin
      .join(ev, Seq("event_id"))
      .withColumn("delivered_at", col("t") + lit(backoffBaseSec) *
        (expr("shiftleft(1L, cast(attempts - 1 AS int))") - 1))
      .crossJoin(broadcast(mx))
      .where(col("delivered_at") <= col("max_t"))
      .select(col("event_id"), col("disposition"), col("attempts"),
        col("delivered_at"))
  }

  /** The re-enqueue payload with the ladder clock: deliver_at rides
    * the message so each nack's shift ACCUMULATES across micro-batches
    * — the stream derives delivered_at by accumulation, a genuinely
    * different computation than the batch twin's closed form. */
  val backoffSchema = redeliverySchema + ", deliver_at LONG"

  /** Streaming backoff ladder: redeliverStream's re-enqueue loop with
    * the deliver-at shift applied on every nack; final verdicts record
    * the deliver_at they arrived with. The final-watermark gate
    * belongs to the CONSUMER of the drained sink (StreamSpec applies
    * it), exactly as dlqAgeOutBatch gates the DLQ windows. */
  def redeliverBackoffStream(s: SparkSession, inDir: String, outDir: String,
      ckpt: String): Unit =
    reenqueueLoop(s, inDir, outDir, ckpt, backoffSchema,
      fin => fin.select(col("event_id"),
        when(col("verdict") === "RESCHEDULE", lit("DEAD_LETTER"))
          .otherwise(col("verdict")).as("disposition"),
        col("delivery_count").cast("long").as("attempts"),
        col("deliver_at").as("delivered_at")),
      p => p.withColumn("deliver_at",
          col("deliver_at") + lit(backoffBaseSec) *
            expr("shiftleft(1L, cast(delivery_count - 1 AS int))"))
        .withColumn("delivery_count", col("delivery_count") + 1))

  /** Transactional multi-sink commit (round 11 — the PIP-31 producer
    * half, closing the at-least-once window the reenqueueLoop
    * documents): a micro-batch's writes to SEVERAL sinks become
    * visible atomically — each sink writes its own epoch dir
    * (overwrite-idempotent, the repo's epoch recipe), and a single
    * commit marker lands LAST. [[txnRead]] admits an epoch only if its
    * marker exists, so a crash anywhere between the first sink write
    * and the marker exposes NOTHING (the epochs are garbage until the
    * replayed batch overwrites them and commits). Exactly-once
    * visibility from at-least-once execution — what a broker
    * transaction gives a two-topic producer. StreamSpec injects a
    * crash between the two sink writes and proves the gate. */
  def txnCommit(batch: DataFrame, batchId: Long, markerDir: String,
      sinks: Seq[(DataFrame => DataFrame, String)]): Unit = {
    sinks.foreach { case (part, sink) =>
      part(batch).write.mode("overwrite").parquet(s"$sink/batch=$batchId")
    }
    val md = java.nio.file.Paths.get(markerDir)
    java.nio.file.Files.createDirectories(md)
    val m = md.resolve(s"commit_$batchId")
    if (!java.nio.file.Files.exists(m)) java.nio.file.Files.createFile(m)
    ()
  }

  /** Read-committed view of a txnCommit sink: only epochs whose commit
    * marker exists. Marker listing is per-epoch metadata (bounded by
    * batch count, not data). */
  def txnRead(s: SparkSession, sink: String, markerDir: String): DataFrame = {
    val committed = graft.Tables.listByPrefix(
        java.nio.file.Paths.get(markerDir), "commit_")
      .map(_.getFileName.toString.stripPrefix("commit_"))
      .filter(id => java.nio.file.Files.isDirectory(
        java.nio.file.Paths.get(sink, s"batch=$id")))
      .sorted
    if (committed.isEmpty) s.emptyDataFrame
    else committed.map(id => s.read.parquet(s"$sink/batch=$id"))
      .reduce(_ unionByName _)
  }

  /** Dead-letter TTL age-out (VERDICT r05 item 7). Dead-lettering is
    * not terminal storage either: a DLQ retains entries for a bounded
    * TTL (here 5 days of EVENT time) and then evicts them — the
    * broker's `ttlDurationDefaultInSeconds` convention. */
  val dlqTtl = "5 days"
  private val dlqTtlSec = 5L * 24 * 3600

  /** The DLQ content: dead-lettered messages with their event time. */
  def deadLetters(events: DataFrame): DataFrame =
    deadLettersFrom(redeliver(events), events)

  /** The DLQ slice of an already-computed disposition frame (see
    * redeliverBackoffFrom — the persisted-ledger consumers). */
  def deadLettersFrom(fin: DataFrame, events: DataFrame): DataFrame =
    fin.where(col("disposition") === "DEAD_LETTER")
      .join(events.select(col("event_id"), col("ts")), Seq("event_id"))
      .select(col("event_id"), col("attempts"), col("ts"))

  /** Streaming age-out: the watermark over the DLQ's own event time IS
    * the TTL clock — an append-mode hourly window aggregate emits a
    * window exactly once the watermark (max event time − TTL) passes
    * its end, so the emitted rows are the eviction records ("these
    * dead letters aged out", with the per-hour count). State is one
    * open window per hour of TTL — bounded by the TTL, not the queue.
    * In batch mode the watermark is a no-op and this computes every
    * window; dlqAgeOutBatch adds the final-watermark cutoff to form
    * the closed-form twin StreamSpec compares against. */
  def dlqAgeOut(dlq: DataFrame): DataFrame =
    dlq.withColumn("ts_sec", date_trunc("second", col("ts")))
      .withWatermark("ts_sec", dlqTtl)
      .groupBy(window(col("ts_sec"), "1 hour").as("w"))
      .agg(count(lit(1)).as("n_expired"))
      .select(unix_timestamp(col("w.start")).as("ws"), col("n_expired"))

  /** Batch twin: windows whose end has fallen at or before the final
    * watermark, max(event time) − TTL. */
  def dlqAgeOutBatch(dlq: DataFrame): DataFrame = {
    val mx = dlq.agg(unix_timestamp(
      date_trunc("second", max(col("ts")))).as("mxs"))
    dlqAgeOut(dlq).crossJoin(broadcast(mx))
      .where(col("ws") + 3600 <= col("mxs") - dlqTtlSec)
      .select("ws", "n_expired")
  }

  /** Flagship: route → keep ACCEPTed → enrich with the customer dim
    * (broadcast: the dim is bounded) → per-5-min-window per-type counts
    * and value sums. Works on batch and streaming `events`. */
  def filterPipeline(events: DataFrame, customer: DataFrame): DataFrame =
    route(events)
      .where(col("verdict") === "ACCEPT")
      .join(broadcast(customer), col("user_id") === col("c_custkey"), "inner")
      .withColumn("ts_sec", date_trunc("second", col("ts")))
      .groupBy(window(col("ts_sec"), "5 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(28,2)")).cast("double").as("sum_value"))
      .select(unix_timestamp(col("w.start")).as("ws"), col("event_type"),
        col("n"), col("sum_value"))

  /** Tumbling 5-min window aggregation (batch + streaming). */
  def tumbling(events: DataFrame): DataFrame =
    events
      .withColumn("ts_sec", date_trunc("second", col("ts")))
      .groupBy(window(col("ts_sec"), "5 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(28,2)")).cast("double").as("sum_value"))
      .select(unix_timestamp(col("w.start")).as("ws"), col("event_type"),
        col("n"), col("sum_value"))

  /** Sliding 10-min window every 5 min. */
  def sliding(events: DataFrame): DataFrame =
    events
      .withColumn("ts_sec", date_trunc("second", col("ts")))
      .groupBy(window(col("ts_sec"), "10 minutes", "5 minutes").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(unix_timestamp(col("w.start")).as("ws"), col("n"))

  /** Per-user session windows, 30-minute gap. */
  def sessions(events: DataFrame): DataFrame =
    events
      .withColumn("ts_sec", date_trunc("second", col("ts")))
      .groupBy(session_window(col("ts_sec"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(28,2)")).cast("double").as("sum_value"))
      .select(col("user_id"), unix_timestamp(col("w.start")).as("session_start"),
        col("n"), col("sum_value"))

  /** First event per (user_id, event_type) — the dedup transform.
    * Batch form: min-(ts,event_id) row per key (deterministic).
    * Streaming form (StreamSpec): dropDuplicates on the key columns. */
  def firstPerKey(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts_sec"), col("event_id"))
    events
      .withColumn("ts_sec", date_trunc("second", col("ts")))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("user_id"), col("event_type"), col("event_id"),
        date_format(col("ts_sec"), "yyyy-MM-dd HH:mm:ss").as("ts_s"))
  }

  /** Compacted-topic read view — broker topic compaction (the
    * PIP-105-era Pulsar feature letting a new reader bootstrap state
    * without replaying history): only the LATEST message per key
    * survives, older ones are compacted away. The dual of firstPerKey,
    * same (second-truncated ts, event_id) total-order discipline, with
    * the VALUE carried — the retained payload is the point of
    * compaction. The streaming form is a keep-latest aggregation
    * (max of the (ts_sec, event_id, value) struct per key — per-key
    * O(1) state, exactly what a broker's compactor holds); StreamSpec
    * asserts stream == batch. */
  def compactLatest(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts_sec").desc, col("event_id").desc)
    events
      .withColumn("ts_sec", date_trunc("second", col("ts")))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("user_id"), col("event_type"), col("event_id"),
        col("value"),
        date_format(col("ts_sec"), "yyyy-MM-dd HH:mm:ss").as("ts_s"))
  }

  /** Stream-static enrichment join. */
  def enrich(events: DataFrame, customer: DataFrame): DataFrame =
    events.join(broadcast(customer), col("user_id") === col("c_custkey"), "inner")
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("c_name"), col("c_mktsegment"))

  /** Bloom-gated stream-static enrichment: a STATELESS map-side Bloom
    * probe (built once from the dim selection, e.g. by a nightly job)
    * drops most non-matching events before they ever reach the join —
    * at production stream rates the filter runs per-event with no state
    * store and no shuffle, and the exact join behind it keeps results
    * identical to the plain join (false positives only cost join
    * lookups). The 10-min tumbling count is the downstream consumer. */
  def bloomEnrich(events: DataFrame, dim: DataFrame,
      bf: org.apache.spark.util.sketch.BloomFilter): DataFrame =
    events
      .where(graft.functions.BloomMightContain.prune(col("user_id"), bf))
      .withColumn("ts_sec", date_trunc("second", col("ts")))
      .join(broadcast(dim), col("user_id") === col("c_custkey"))
      .groupBy(window(col("ts_sec"), "10 minutes").as("w"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n"))
      .select(unix_timestamp(col("w.start")).as("ws"), col("c_mktsegment"), col("n"))

  /** Stream-stream interval join: purchases matched to same-user clicks
    * that happened at most 30 minutes before. In streaming mode both
    * sides carry watermarks so the join state is bounded (clicks older
    * than the interval + watermark are evicted); in batch mode the same
    * plan is an ordinary time-bounded equi self-join. */
  def purchaseClickJoin(purchases: DataFrame, clicks: DataFrame): DataFrame = {
    val p = purchases.select(col("event_id").as("p_id"), col("user_id"),
      date_trunc("second", col("ts")).as("p_ts"))
    val c = clicks.select(col("event_id").as("c_id"),
      col("user_id").as("c_user"), date_trunc("second", col("ts")).as("c_ts"))
    p.join(c,
      col("user_id") === col("c_user") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 30 MINUTES") &&
        col("c_ts") <= col("p_ts"))
      .select(col("p_id"), col("c_id"), col("user_id"),
        unix_timestamp(col("p_ts")).as("p_t"), unix_timestamp(col("c_ts")).as("c_t"))
  }

  /** Stream-stream LEFT OUTER interval join (VERDICT r07 item 2) —
    * the standard attribution shape: every purchase emits; one with no
    * same-user click in the preceding 30 minutes emits a null click
    * side. In streaming mode both sides carry watermarks and Spark
    * emits the null row exactly once, when the watermark passes the
    * purchase's match window (no click can arrive anymore); matched
    * rows emit as they join, like the inner form. */
  def purchaseClickOuter(purchases: DataFrame, clicks: DataFrame,
      delaySec: Long = 7200): DataFrame = {
    // the watermark must ride the very columns of the range condition
    // (the outer join's null-emission analysis rejects a watermark
    // stranded behind the date_trunc projection), so it is applied
    // HERE, post-projection — a no-op on batch inputs, which is what
    // lets one definition serve both modes
    val p = purchases.select(col("event_id").as("p_id"), col("user_id"),
        date_trunc("second", col("ts")).as("p_ts"))
      .withWatermark("p_ts", s"$delaySec seconds")
    val c = clicks.select(col("event_id").as("c_id"),
        col("user_id").as("c_user"), date_trunc("second", col("ts")).as("c_ts"))
      .withWatermark("c_ts", s"$delaySec seconds")
    p.join(c,
      col("user_id") === col("c_user") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 30 MINUTES") &&
        col("c_ts") <= col("p_ts"), "left_outer")
      .select(col("p_id"), col("c_id"), col("user_id"),
        unix_timestamp(col("p_ts")).as("p_t"), unix_timestamp(col("c_ts")).as("c_t"))
  }

  /** The BATCH twin of the streaming outer join, restricted to the
    * closed-form final watermark (the dlqAgeOutBatch precedent): a
    * terminated stream has emitted every matched row, but an UNMATCHED
    * purchase only if the final watermark — min(max event time per
    * side) − the 2 h delay — passed its match window (till then the
    * runtime must hold it open for a possible click). Matched rows are
    * kept unconditionally; null rows where p_t < final watermark. */
  def purchaseClickOuterBatch(purchases: DataFrame, clicks: DataFrame,
      delaySec: Long = 7200): DataFrame = {
    val wm = purchases.agg(unix_timestamp(date_trunc("second",
        max(col("ts")))).as("pmx"))
      .crossJoin(clicks.agg(unix_timestamp(date_trunc("second",
        max(col("ts")))).as("cmx")))
      .select((least(col("pmx"), col("cmx")) - delaySec).as("wm"))
    purchaseClickOuter(purchases, clicks, delaySec).crossJoin(broadcast(wm))
      .where(col("c_id").isNotNull || col("p_t") < col("wm"))
      .select("p_id", "c_id", "user_id", "p_t", "c_t")
  }

  /** FULL outer form of the watermarked interval join: unmatched rows
    * of BOTH sides emit nulls — a purchase once the watermark passes
    * its match window, a click once the watermark passes c_ts + 30 min
    * (the last purchase instant that could still claim it). Same
    * post-projection watermark discipline as purchaseClickOuter. */
  def purchaseClickFullOuter(purchases: DataFrame, clicks: DataFrame,
      delaySec: Long = 7200): DataFrame = {
    val p = purchases.select(col("event_id").as("p_id"), col("user_id"),
        date_trunc("second", col("ts")).as("p_ts"))
      .withWatermark("p_ts", s"$delaySec seconds")
    val c = clicks.select(col("event_id").as("c_id"),
        col("user_id").as("c_user"), date_trunc("second", col("ts")).as("c_ts"))
      .withWatermark("c_ts", s"$delaySec seconds")
    p.join(c,
      col("user_id") === col("c_user") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 30 MINUTES") &&
        col("c_ts") <= col("p_ts"), "full_outer")
      .select(col("p_id"), col("c_id"),
        coalesce(col("user_id"), col("c_user")).as("user_id"),
        unix_timestamp(col("p_ts")).as("p_t"), unix_timestamp(col("c_ts")).as("c_t"))
  }

  /** Batch twin with the closed-form final watermark on BOTH null
    * sides: matched rows unconditionally; purchase-nulls where the
    * watermark passed p_t; click-nulls where it passed c_t + 30 min. */
  def purchaseClickFullOuterBatch(purchases: DataFrame, clicks: DataFrame,
      delaySec: Long = 7200): DataFrame = {
    val wm = purchases.agg(unix_timestamp(date_trunc("second",
        max(col("ts")))).as("pmx"))
      .crossJoin(clicks.agg(unix_timestamp(date_trunc("second",
        max(col("ts")))).as("cmx")))
      .select((least(col("pmx"), col("cmx")) - delaySec).as("wm"))
    purchaseClickFullOuter(purchases, clicks, delaySec)
      .crossJoin(broadcast(wm))
      .where((col("p_id").isNotNull && col("c_id").isNotNull) ||
        (col("c_id").isNull && col("p_t") < col("wm")) ||
        (col("p_id").isNull && col("c_t") + 1800 < col("wm")))
      .select("p_id", "c_id", "user_id", "p_t", "c_t")
  }

  /** Producer effectively-once dedup fixture convention (the PIP-6
    * broker-dedup semantic — VERDICT r10 item 2): producer_name =
    * user_id mod 8, publish order = event_id, and the sequence id is
    * the per-producer publish rank EXCEPT every 5th message, which
    * RETRANSMITS an already-persisted sequence (rank − 2) — the
    * producer-resend-after-timeout duplicate broker dedup exists to
    * drop. Deterministic, so the dedup verdict is closed-form
    * oracle-able. The two windows share one (producer, publish-order)
    * partitioning — one shuffle, one sort. */
  def producerSeqFixture(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("producer_id").orderBy("event_id")
    events
      .select(col("event_id"), pmod(col("user_id"), lit(8)).as("producer_id"))
      .withColumn("r", row_number().over(w).cast("long"))
      .withColumn("seq_id",
        when(pmod(col("r"), lit(5)) === 0, col("r") - 2).otherwise(col("r")))
      .drop("r")
  }

  /** Broker dedup closed form: a message persists iff its sequence id
    * exceeds the producer's high watermark — the max sequence id over
    * ALL PRIOR arrivals in publish order (PIP-6: the broker stores one
    * last-sequence-id per producer; a message at or below it is
    * dropped as a duplicate, including late-lower-seq arrivals). At
    * 100 TB this is a shuffle on producer_name + a per-producer sorted
    * scan — exactly the per-producer sequential check the broker runs;
    * state is one long per producer. The streaming form
    * (StateV2.producerDedupStream) holds that long in a ValueState;
    * StreamSpec asserts stream == this twin across forced micro-batch
    * boundaries and a checkpoint restart. */
  def producerDedupBatch(msgs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("producer_id").orderBy("event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    msgs
      .withColumn("hw", max(col("seq_id")).over(w))
      .where(col("hw").isNull || col("seq_id") > col("hw"))
      .select(col("producer_id"), col("seq_id"), col("event_id"))
  }

  /** Union of two event streams into one windowed aggregate — the
    * multi-source fan-in every broker-consumer topology needs (N topics
    * → one pipeline). unionByName keeps the merge schema-safe; in
    * streaming mode each source keeps its own offsets and the union is
    * planned incrementally like any other stateless op. */
  def unionCounts(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .withColumn("ts_sec", date_trunc("second", col("ts")))
      .groupBy(window(col("ts_sec"), "10 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(unix_timestamp(col("w.start")).as("ws"), col("event_type"), col("n"))

  /** Key_Shared subscription dispatch (Pulsar's Key_Shared subtype,
    * PIP-34/PIP-105 context): every message key hashes into one of
    * 65536 slots, and each consumer owns a contiguous slot range —
    * all messages for one key land on one consumer (per-key ordering
    * survives fan-out), and ranges rebalance without rehashing keys.
    * The hash here is the engine's portable md5 slot (Pulsar uses
    * Murmur3-32; the algorithm is a pluggable detail, the range
    * assignment is the semantics). Map-only — a stream routes with
    * zero shuffle and zero state. */
  val keySharedSlots = 65536
  val keySharedRanges: Seq[(String, Long)] = Seq(
    ("consumer-0", 21846L), ("consumer-1", 43691L), ("consumer-2", 65536L))

  def keySharedRoute(events: DataFrame): DataFrame = {
    // single definition of the portable slot hash (ADVICE r07): the
    // Spark side IS Text.tokHashS, whose DuckDB twin (tokHashDOn)
    // the filter_keyshared oracle builds — one formula, two engines,
    // no third inlined copy to drift
    val slot = graft.llm.Text.tokHashS(col("user_id").cast("string")) %
      keySharedSlots
    val consumer = keySharedRanges.init.foldRight(
      lit(keySharedRanges.last._1)) { case ((name, hi), rest) =>
      when(slot < hi, name).otherwise(rest)
    }
    events.withColumn("slot", slot).withColumn("consumer", consumer)
  }

  /** Per-consumer dispatch census — the batch twin judged by the
    * oracle; the streaming form (same def over a file stream) is
    * asserted equal in StreamSpec. n_keys counts distinct keys per
    * consumer: the Key_Shared invariant (a key never splits across
    * consumers) makes the per-consumer key counts sum to the global
    * distinct-key count, which the spec asserts. */
  def keySharedCounts(events: DataFrame): DataFrame =
    keySharedRoute(events)
      .groupBy("consumer", "event_type")
      .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("n_keys"))
      .select(col("consumer"), col("event_type"), col("n"), col("n_keys"))

  /** Pulsar delayed delivery (deliverAfter/deliverAt): a message is
    * invisible to consumers until its deliver-at time. Policy here:
    * 'error' events back off 15 minutes (retry-after-transient-fault),
    * 'signup' events 5 minutes (welcome-flow delay), everything else
    * delivers immediately — deterministic, so the batch twin is
    * closed-form oracle-able. Map-only shift of the event-time column.
    *
    * STREAMING WATERMARK CONTRACT (ADVICE r07): when the watermark
    * runs on deliver_at, the delay budget must absorb the MAXIMUM
    * backoff on top of the source's own lateness allowance — a delayed
    * error arriving on time advances max(deliver_at) 15 minutes ahead
    * of the undelayed clock, so a watermark of only 10 minutes on
    * deliver_at would let that single error expire windows that
    * on-time undelayed events (up to 5 minutes behind) still need,
    * silently dropping them and diverging from the batch twin. Use
    * delayedWatermark (= max backoff 15 m + 10 m lateness) via
    * delayedCountsStream; StreamSpec replays a crafted corpus one file
    * per micro-batch and asserts both that the safe delay keeps every
    * on-time event and that the naive 10-minute delay demonstrably
    * drops one. */
  def delayedDeliver(events: DataFrame): DataFrame =
    events.withColumn("deliver_at",
      when(col("event_type") === "error", col("ts") + expr("INTERVAL 15 MINUTES"))
        .when(col("event_type") === "signup", col("ts") + expr("INTERVAL 5 MINUTES"))
        .otherwise(col("ts")))

  /** The safe deliver-at watermark: max backoff (15 m) + the 10 m
    * lateness allowance the undelayed pipeline uses. */
  val delayedWatermark = "25 minutes"

  /** The canonical STREAMING form of delayedCounts: watermark on the
    * visible clock sized by delayedWatermark (see delayedDeliver's
    * contract), then the same 5-min tumbling count. */
  def delayedCountsStream(events: DataFrame): DataFrame =
    delayedDeliver(events)
      .withColumn("da_sec", date_trunc("second", col("deliver_at")))
      // the watermark must ride the SAME column the window groups on —
      // a watermark on deliver_at does not propagate through the
      // date_trunc projection, and append mode then rejects the agg
      .withWatermark("da_sec", delayedWatermark)
      .groupBy(window(col("da_sec"), "5 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(unix_timestamp(col("w.start")).as("ws"), col("event_type"), col("n"))

  /** 5-min tumbling counts on the VISIBLE (deliver-at) clock. */
  def delayedCounts(events: DataFrame): DataFrame =
    delayedDeliver(events)
      .withColumn("da_sec", date_trunc("second", col("deliver_at")))
      .groupBy(window(col("da_sec"), "5 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(unix_timestamp(col("w.start")).as("ws"), col("event_type"), col("n"))

  /** Windowed per-user activity counts — the streamable incremental
    * aggregate under stream_window_topk. */
  def windowUserCounts(events: DataFrame): DataFrame =
    events.withColumn("ts_sec", date_trunc("second", col("ts")))
      .groupBy(window(col("ts_sec"), "10 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(unix_timestamp(col("w.start")).as("ws"), col("user_id"), col("n"))

  /** Top-3 users per window, as RANK POST-PROCESSING of the
    * incremental aggregate: a rank over a streaming agg would be a
    * second stateful stage (unsupported chained aggregation), and it
    * doesn't need to be one — the production pattern is to keep the
    * incremental agg as the streaming state and rank in foreachBatch /
    * over the sink table, which is exactly how the StreamSpec gate
    * executes it. The window ranks per ws group (window-count-sized,
    * not event-sized). */
  def topkOfCounts(counts: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("ws").orderBy(col("n").desc, col("user_id"))
    counts.withColumn("rn", row_number().over(w)).where(col("rn") <= 3)
      .select(col("ws"), col("rn"), col("user_id"), col("n"))
  }

  /** The canonical change record of the CDC view: op = D on 'error'
    * (delete), else upsert; ordered by (event-time second, event_id). */
  final case class CdcChange(user_id: Long, op: String, last_value: Double,
      last_t: Long, event_id: Long)

  /** Map events to change records (map-only — legal on a stream). */
  def cdcChanges(events: DataFrame): DataFrame =
    events.select(col("user_id"), col("event_id"),
      unix_timestamp(date_trunc("second", col("ts"))).as("last_t"),
      round(col("value"), 2).as("last_value"),
      when(col("event_type") === "error", lit("D")).otherwise(lit("U")).as("op"))

  /** CDC latest-change view, batch form: the newest change record per
    * key INCLUDING delete tombstones — what a CDC connector emits
    * downstream (`sink_cdc_apply` is the applied-state twin, deletes
    * absent). One window over the key partition. */
  def cdcLatestBatch(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id")
      .orderBy(col("last_t").desc, col("event_id").desc)
    cdcChanges(events).withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("user_id"), col("op"), col("last_value"), col("last_t"))
  }

  /** Session-timeout closed form, batch twin of StateV2.sessionStream
    * (VERDICT r08 item 3 — the shape event-time timers exist for):
    * gaps-and-islands sessionization (gap > gapSec splits) restricted
    * to CLOSED sessions — every session except a user's last is closed
    * by data (its user's next event proves the gap); the last is
    * closed iff the final watermark (max corpus ts − watermark delay)
    * passed its end + gapSec, i.e. end + gapSec + delay ≤ max_ts. The
    * delay is THREADED as a parameter defaulting to gapSec, matching
    * StateV2.sessionStream's derived watermark (ADVICE r09 — the old
    * hardcoded 2·gapSec silently assumed delay == gap). The gate is
    * NON-STRICT (≤) because Spark's timer expiry is non-strict: the
    * TimerStateImpl expired-timer iterator keeps timers with
    * `timer_ts <= watermark` (lcmp/ifgt on expiryTimestampMs in the
    * 4.1.2 bytecode), so a timer at end+gap fires exactly when
    * max − delay ≥ end + gap — StreamSpec pins the equality boundary
    * with a fixture where end + gap + delay == max ts. The streaming
    * side emits exactly these rows: data-gap closures from
    * handleInputRows, idle-key evictions from the event-time timer in
    * handleExpiredTimer. With watermark delay ≤ gap the stream's
    * sequential fold is EXACT (any accepted out-of-order event is ≤
    * delay behind the global max ts, hence within gap of the open
    * session's span — an event that could belong to an earlier island
    * is by definition late and dropped).
    * One window per user partition + a 1-row broadcast max; per-user
    * work is user-sized, never corpus-sized. */
  def sessionTimeoutBatch(events: DataFrame, gapSec: Long = 600L,
      delaySec: Long = -1L): DataFrame = {
    val delay = if (delaySec < 0) gapSec else delaySec
    require(delay <= gapSec,
      s"session watermark delay $delay s > gap $gapSec s (see " +
        "StateV2.sessionStream — the twin contract requires delay <= gap)")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts_s", "event_id")
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ev = events.select(col("user_id"), col("event_id"),
      unix_timestamp(date_trunc("second", col("ts"))).as("ts_s"))
    val mx = ev.agg(max(col("ts_s")).as("max_s"))
    val lastW = Window.partitionBy("user_id")
    ev
      .withColumn("is_new",
        (col("ts_s") - lag("ts_s", 1).over(w) > gapSec) ||
          lag("ts_s", 1).over(w).isNull)
      .withColumn("sess_id", sum(col("is_new").cast("long")).over(run))
      .groupBy("user_id", "sess_id")
      .agg(min("ts_s").as("sess_start"), max("ts_s").as("sess_end"),
        count(lit(1)).as("n_events"))
      .withColumn("is_last", col("sess_id") === max("sess_id").over(lastW))
      .crossJoin(broadcast(mx))
      .where(!col("is_last") ||
        col("sess_end") + gapSec + delay <= col("max_s"))
      .select(col("user_id"), col("sess_start"), col("sess_end"),
        col("n_events"))
  }

  /** Streaming form: keyed state holds the newest change per key
    * (max by (last_t, event_id) — arrival order across micro-batches
    * doesn't matter), emitting the updated latest record each batch
    * (Update mode). State is ONE record per key — bounded by key
    * cardinality, not stream length. StreamSpec asserts the drained
    * stream's final emission per key == cdcLatestBatch. */
  def cdcLatestStream(changes: DataFrame): DataFrame = {
    import org.apache.spark.sql.Encoders
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    implicit val enc = Encoders.product[CdcChange]
    changes.as[CdcChange]
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (_: Long, it: Iterator[CdcChange], state: GroupState[CdcChange]) => {
          val newest = (state.getOption.iterator ++ it)
            .maxBy(c => (c.last_t, c.event_id))
          state.update(newest)
          Iterator(newest)
        })(enc, enc)
      .toDF()
  }

  /** Custom keyed state (SURVEY §2.10 / guide): running per-user event
    * count maintained in the state store via flatMapGroupsWithState,
    * emitting the updated count on every arrival. Input: (user_id,
    * event_id) tuples; output: (user_id, running_n). State is one long
    * per user — bounded by user cardinality, not stream length. */
  def statefulCounts(events: org.apache.spark.sql.Dataset[(Long, Long)])
      : org.apache.spark.sql.Dataset[(Long, Long)] = {
    import org.apache.spark.sql.Encoders
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    implicit val tup = Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
    events.groupByKey(_._1)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (uid: Long, it: Iterator[(Long, Long)], state: GroupState[Long]) => {
          val n = state.getOption.getOrElse(0L) + it.size
          state.update(n)
          Iterator((uid, n))
        })(Encoders.scalaLong, tup)
  }
}
