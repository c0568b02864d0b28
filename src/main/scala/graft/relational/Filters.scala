package graft.relational

import graft.{QueryPack, Tables}
import graft.selector.Selector
import graft.selector.Selector.{KStr, KBool}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Filter / predicate operators (SURVEY.md §2.2) — the JMS-selector
  * surface, the heart of the message-filter domain. Every predicate here
  * is produced by `Selector.compile` (dogfooding the compiler), emitting
  * plain Catalyst expressions that push down into the Parquet scan.
  */
object Filters extends QueryPack {

  /** Canonical deterministic events projection: ts is ns-precision in
    * storage (FIXTURES.md pitfall 1) → emit a to-the-second string. */
  private def evOut(df: DataFrame, extra: Column*): DataFrame =
    df.select(Seq(col("event_id"),
      date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_s"),
      col("user_id"), col("event_type"), col("value")) ++ extra: _*)
      .orderBy("event_id")

  /** PIP-105 multi-subscription fan-out: every subscription's compiled
    * selector evaluates against each message in ONE map-side pass (an
    * array of when()s, filtered, exploded) — a message matching k
    * subscriptions fans out k rows with a single scan, no join, no
    * shuffle. Shared by the `filter_subscriptions` key and the
    * StreamSpec stream==batch gate (stateless ⇒ identical over an
    * unbounded source). */
  private[graft] def subscriptionFanOut(ev: DataFrame): DataFrame = {
    val subs = Seq(
      "alerts" -> "event_type = 'error' AND value > 100",
      "bigbuys" -> "event_type = 'purchase' AND value BETWEEN 200 AND 400",
      "signups_hi" -> "value * 2 > 500 OR event_type LIKE 'sign%'",
      "vip" -> "props.k >= 90 AND event_type <> 'error'")
    ev.select(col("event_id"), col("event_type"),
      round(col("value"), 2).as("value"),
      explode(filter(array(subs.map { case (n, sel) =>
        when(Selector.compileEvents(sel), lit(n))
          .otherwise(lit(null).cast("string")) }: _*),
        x => x.isNotNull)).as("subscription"))
  }

  /** Messages per batched entry (the fixture's producer-batching
    * convention: entry_id = event_id div k, contiguous publish order —
    * the multimodal_pack precedent of a deterministic pack). */
  private[graft] val entryBatchK = 4

  /** The batched-entry selector of the fidelity key, evaluated PER
    * MESSAGE inside each entry (chosen so the fixture produces all
    * three entry verdicts at every SF). */
  private[graft] val entrySelector =
    "event_type IN ('purchase', 'signup', 'click', 'view') AND value > 40"

  /** Pack events into batched entries (one array<struct> payload per
    * entry, messages in publish order). The groupBy here is the
    * FIXTURE's stand-in for producer batching — at the broker, entries
    * arrive already packed and this shuffle does not exist. */
  private[graft] def packEntries(ev: DataFrame): DataFrame =
    ev.groupBy(expr(s"event_id div $entryBatchK").as("entry_id"))
      .agg(sort_array(collect_list(struct(
        col("event_id"), col("user_id"), col("event_type"),
        col("value"), col("props")))).as("msgs"))

  /** PIP-105 batched-entry verdicts over an already-packed entries
    * frame (entry_id, msgs) — STATELESS and map-only, so the streaming
    * execution over an unbounded entry source is identical by
    * construction (StreamSpec asserts it). The selector evaluates
    * against each message inside the entry via a higher-order filter
    * on the payload array (the eventsPacked resolver) — the entry is
    * never unpacked into per-message rows, exactly the broker
    * constraint the PIP-105 batched-entry rules exist for: an entry is
    * the unit of dispatch, so ACCEPT only if every message matches,
    * REJECT only if none does, and a mixed entry must RESCHEDULE (the
    * broker cannot deliver or drop half an entry). n_msgs/n_match are
    * the per-message unpack counts consumers use to meter the mixed
    * entries they must client-side filter. */
  private[graft] def entryVerdicts(entries: DataFrame): DataFrame = {
    val ast = Selector.parse(entrySelector)
    val nMsgs = size(col("msgs")).cast("long")
    val nMatch = size(filter(col("msgs"),
      m => Selector.compileExpr(ast, Selector.eventsPacked(m)))).cast("long")
    entries.select(col("entry_id"), nMsgs.as("n_msgs"), nMatch.as("n_match"),
      when(nMatch === nMsgs, "ACCEPT")
        .when(nMatch === 0L, "REJECT")
        .otherwise("RESCHEDULE").as("verdict"))
  }

  /** PIP-37 chunked-message fixture convention (the inverse of
    * packEntries: there a producer batches k messages into one entry,
    * here ONE oversized message splits across k entries). The payload
    * is a deterministic string of the message's own fields; it splits
    * into total_chunks = event_id mod 3 + 1 chunks of [[chunkWidth]]
    * chars (last chunk takes the remainder — any fixed-boundary split
    * reassembles losslessly, so the sha oracle is exact), keyed by
    * (producer_id = user_id mod 8, msg_seq = event_id). Chunk 2 of
    * every 13th multi-chunk message is LOST in transit — the
    * incomplete-message case the consumer's reassembly timeout
    * (`expireTimeOfIncompleteChunkedMessage`) exists for. */
  private[graft] val chunkWidth = 7

  private[graft] def chunkPayload: Column =
    concat_ws(":", col("event_type"), col("user_id").cast("string"),
      col("props"))

  private[graft] def chunkRows(ev: DataFrame): DataFrame =
    ev.select(
        pmod(col("user_id"), lit(8)).as("producer_id"),
        col("event_id").as("msg_seq"),
        (pmod(col("event_id"), lit(3)) + 1).as("total_chunks"),
        chunkPayload.as("payload"), col("ts"))
      .withColumn("chunk_id",
        explode(sequence(lit(1), col("total_chunks").cast("int"))))
      .withColumn("chunk", col("payload").substr(
        (col("chunk_id") - 1) * chunkWidth + 1,
        when(col("chunk_id") < col("total_chunks"), lit(chunkWidth))
          .otherwise(lit(1000000))))
      .where(!(pmod(col("msg_seq"), lit(13)) === 0 &&
        col("total_chunks") >= 2 && col("chunk_id") === 2))
      .select("producer_id", "msg_seq", "total_chunks", "chunk_id", "chunk",
        "ts")

  /** Reassembly over a drained chunk corpus — the batch twin of
    * StateV2.chunkStream: group by (producer, msg_seq), verify
    * completeness against the declared chunk count, concatenate in
    * chunk order, and sha256 the reassembled payload (the oracle
    * computes the sha on the ORIGINAL payload, so any mis-split,
    * mis-order, or mis-merge hash-mismatches). A message still missing
    * chunks once the corpus is drained has timed out by definition —
    * the stream's timer emits exactly that row. Shape: one shuffle on
    * the (producer, seq) key; per-group state is total_chunks-bounded
    * (≤3 here — the max-message/chunk-size ratio, never stream
    * length), so the collect_list is safe at any corpus size. */
  private[graft] def reassemble(chunks: DataFrame): DataFrame = {
    val joined = array_join(transform(
      sort_array(collect_list(struct(col("chunk_id"), col("chunk")))),
      x => x.getField("chunk")), "")
    chunks.groupBy("producer_id", "msg_seq")
      .agg(max(col("total_chunks")).as("total_chunks"),
        count(lit(1)).as("n_received"),
        joined.as("payload"))
      .select(col("producer_id"), col("msg_seq"), col("total_chunks"),
        col("n_received"),
        when(col("n_received") === col("total_chunks"), lit("COMPLETE"))
          .otherwise(lit("TIMED_OUT")).as("disposition"),
        when(col("n_received") === col("total_chunks"),
          sha2(col("payload"), 256))
          .otherwise(lit(null).cast("string")).as("payload_sha"))
  }

  private val evSel =
    "SELECT event_id, strftime(date_trunc('second', ts), '%Y-%m-%d %H:%M:%S') AS ts_s, " +
      "user_id, event_type, value"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "filter_eq" -> ((s, dir) =>
      evOut(Tables.events(s, dir)
        .where(Selector.compileEvents("event_type = 'purchase'")))),

    "filter_cmp" -> ((s, dir) =>
      evOut(Tables.events(s, dir)
        .where(Selector.compileEvents(
          "value > 100 AND value <= 200 AND event_type <> 'error'")))),

    "filter_between" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .where(Selector.compile(
          "l_quantity BETWEEN 10 AND 20 AND l_discount NOT BETWEEN 0.02 AND 0.08",
          Selector.direct()))
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")
        .orderBy("l_orderkey", "l_linenumber")),

    "filter_in" -> ((s, dir) =>
      evOut(Tables.events(s, dir)
        .where(Selector.compileEvents(
          "event_type IN ('click', 'view', 'purchase') AND event_type NOT IN ('purchase')")))),

    "filter_like" -> ((s, dir) =>
      Tables.part(s, dir)
        .where(Selector.compile(
          "p_type LIKE '%DARD' OR p_brand LIKE 'Brand#1_' " +
            "OR p_name LIKE 'cold!_w%' ESCAPE '!' OR p_name NOT LIKE '%o%'",
          Selector.direct(Map("p_type" -> KStr, "p_brand" -> KStr, "p_name" -> KStr))))
        .select("p_partkey", "p_name", "p_brand", "p_type")
        .orderBy("p_partkey")),

    "filter_null" -> ((s, dir) =>
      evOut(
        Tables.events(s, dir)
          .withColumn("maybe",
            when(col("event_type") === "click", lit(null)).otherwise(col("event_type")))
          .where(Selector.compile("maybe IS NULL OR maybe = 'purchase'",
            n => if (n == "maybe") (col("maybe"), KStr) else Selector.events(n))),
        col("maybe"))),

    "filter_bool3" -> ((s, dir) =>
      evOut(
        Tables.events(s, dir)
          .withColumn("flag",
            when(col("event_type") === "error", lit(null)).otherwise(col("value") > 150))
          .where(Selector.compile(
            "NOT (flag AND event_type = 'view' OR value > 300)",
            n => if (n == "flag") (col("flag"), KBool) else Selector.events(n))))),

    "filter_arith" -> ((s, dir) =>
      evOut(Tables.events(s, dir)
        .where(Selector.compileEvents(
          "value * 2 - 10 > user_id / 3 + 5 AND value / 4 + 1 < 60")))),

    "filter_props" -> ((s, dir) =>
      evOut(Tables.events(s, dir)
        .where(Selector.compileEvents("props.k >= 50 AND props.k < 90")),
        get_json_object(col("props"), "$.k").cast("double").as("k_val"))),

    "selector_compile" -> ((s, dir) =>
      evOut(Tables.events(s, dir)
        .where(Selector.compileEvents(
          "(event_type IN ('purchase', 'signup', 'view') AND props.k BETWEEN 10 AND 90 " +
            "AND value > 20 AND NOT (user_id < 50 OR event_type LIKE 'v%')) OR value >= 300")))),

    "filter_result_route" -> ((s, dir) =>
      evOut(Tables.events(s, dir),
        when(Selector.compileEvents("event_type IN ('purchase', 'signup') AND value > 50"),
          "ACCEPT")
          .when(Selector.compileEvents("event_type = 'error'"), "RESCHEDULE")
          .otherwise("REJECT").as("verdict")))
          ,

    // PIP-105 multi-subscription fan-out: the broker evaluates every
    // subscription's selector against each entry ONCE, server-side —
    // here all N compiled selectors evaluate in one map-side pass
    // (an array of when()s, filtered, exploded), so a message matching
    // k subscriptions fans out k rows with zero extra scans and zero
    // shuffle. At 100 TB the subscription table is broker metadata
    // (O(100s)) compiled into the plan — never a join.
    "filter_subscriptions" -> ((s, dir) =>
      subscriptionFanOut(Tables.events(s, dir))
        .orderBy("event_id", "subscription")),

    // JMS §3.8 header identifiers as first-class selector metadata
    // (VERDICT r05 item 4): JMSTimestamp (epoch millis), JMSPriority
    // (0-9), JMSXDeliveryCount (the redelivery convention — here the
    // deterministic stand-in delivery_count = event_id mod 3 + 1, so
    // the predicate is closed-form oracle-able), JMSType,
    // JMSDeliveryMode, JMSMessageID, JMSCorrelationID (absent → NULL).
    // All compile to plain pushable Catalyst expressions like every
    // other selector.
    "filter_headers" -> ((s, dir) =>
      evOut(Tables.events(s, dir)
        .withColumn("delivery_count", pmod(col("event_id"), lit(3)) + 1)
        .where(Selector.compileEvents(
          "JMSTimestamp >= 1705000000000 AND JMSPriority BETWEEN 3 AND 8 " +
            "AND JMSXDeliveryCount < 3 AND JMSType <> 'error' " +
            "AND JMSDeliveryMode = 'PERSISTENT' AND JMSCorrelationID IS NULL " +
            "AND JMSMessageID LIKE 'ID:%'")),
        (pmod(col("event_id"), lit(3)) + 1).as("delivery_count"))),

    // PIP-105 batched-entry fidelity (VERDICT r09 item 2): the broker
    // dispatches ENTRIES, and a producer-batched entry holds k
    // messages — the filter sees one payload and must judge the whole
    // entry. Pack (fixture convention, entry_id = event_id div 4) →
    // per-message selector evaluation INSIDE the array payload →
    // entry-level verdict + unpack counts. See entryVerdicts for the
    // semantics; the pack groupBy is fixture-only (entries arrive
    // packed at a broker), and the verdict stage is stateless
    // map-side work — no join, no second shuffle, selector codegen'd
    // inside the higher-order filter.
    "filter_batch_entry" -> ((s, dir) =>
      entryVerdicts(packEntries(Tables.events(s, dir)))
        .orderBy("entry_id")),

    // PIP-37 chunked-message reassembly (VERDICT r10 item 3) — the
    // inverse of filter_batch_entry: one oversized payload arrives as
    // k chunk entries and the consumer must reassemble by (producer,
    // sequence), verify completeness against the declared chunk count,
    // and expire incomplete messages. The sha256 of the reassembled
    // payload is computed against the ORIGINAL payload by the oracle,
    // so reassembly order and completeness are exactly checked. The
    // chunk explode is the fixture's stand-in for producer-side
    // splitting (at a broker chunks arrive pre-split); the operator is
    // the one (producer, seq)-keyed shuffle + bounded-group merge.
    "filter_chunked_reassembly" -> ((s, dir) =>
      reassemble(chunkRows(Tables.events(s, dir)))
        .orderBy("msg_seq")),

    // Pulsar transactions, the consumer half (round 11 wave 3 —
    // PIP-31 read-committed visibility): messages carry their
    // transaction id, and a consumer with READ_COMMITTED isolation
    // sees a message only once its transaction committed — aborted
    // txns' messages are filtered at dispatch, never delivered.
    // Fixture: 10-message transactions (txn = position div 10), every
    // 7th aborted. The visibility gate goes through a JOIN against the
    // coordinator's transaction ledger (here derived — at a broker it
    // is the txn coordinator's log), not an inlined predicate: the
    // txn-keyed equi join is co-partitionable at any scale. Output:
    // per-type visible/hidden census with the visible value sum.
    "filter_txn_read_committed" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .withColumn("txn_id", expr("event_id div 10"))
      val ledger = ev.groupBy("txn_id").agg(count(lit(1)).as("n_msgs"))
        .withColumn("status",
          when(pmod(col("txn_id"), lit(7)) === 0, "ABORTED")
            .otherwise("COMMITTED"))
      ev.join(ledger, Seq("txn_id"))
        .groupBy("event_type")
        .agg(sum(when(col("status") === "COMMITTED", 1L).otherwise(0L))
            .as("n_visible"),
          sum(when(col("status") =!= "COMMITTED", 1L).otherwise(0L))
            .as("n_aborted_hidden"),
          sum(when(col("status") === "COMMITTED",
            round(col("value"), 2).cast("decimal(28,2)")))
            .cast("double").as("sum_visible"))
        .orderBy("event_type")
    }),

    // Pulsar subscription TYPES (round 11 wave 3 — completing the
    // subtype model around filter_keyshared): EXCLUSIVE — one consumer
    // owns the subscription and receives everything in order;
    // FAILOVER — one ACTIVE consumer at a time, the next in line takes
    // over on failure (fixture: consumer-0 dies at the mid position,
    // the handover point is exact); SHARED — round-robin across the
    // consumer group per message in arrival order, trading ordering
    // for throughput. Output: the per-(type, consumer) dispatch census
    // with position spans — the handover and the round-robin striping
    // are both visible in min/max_pos. ONE corpus scan, all three
    // subscriptions routed map-side (the filter_subscriptions explode
    // idiom), one census aggregate.
    "filter_subscription_modes" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val mx = ev.agg(max(col("event_id")).as("m"))
      ev.select(col("event_id")).crossJoin(broadcast(mx))
        .select(col("event_id"), explode(array(
          struct(lit("exclusive").as("sub_type"),
            lit("consumer-0").as("consumer")),
          struct(lit("failover").as("sub_type"),
            when(col("event_id") <= expr("m div 2"), "consumer-0")
              .otherwise("consumer-1").as("consumer")),
          struct(lit("shared").as("sub_type"),
            concat(lit("consumer-"), pmod(col("event_id"), lit(3)))
              .as("consumer")))).as("r"))
        .select(col("r.sub_type").as("sub_type"),
          col("r.consumer").as("consumer"), col("event_id"))
        .groupBy("sub_type", "consumer")
        .agg(count(lit(1)).as("n"), min("event_id").as("min_pos"),
          max("event_id").as("max_pos"))
        .orderBy("sub_type", "consumer")
    }),

    // Pulsar Key_Shared dispatch (the third subscription subtype next
    // to the filter_subscriptions fan-out): key-hash slots split into
    // contiguous consumer ranges — all of a key's messages reach ONE
    // consumer, so per-key order survives parallel consumption. Output
    // = the per-consumer dispatch census. Map-only routing (no join,
    // no shuffle before the census agg); the streaming execution of
    // the same Pipeline definition is asserted equal in StreamSpec.
    "filter_keyshared" -> ((s, dir) =>
      graft.streaming.Pipeline.keySharedCounts(Tables.events(s, dir))
        .orderBy("consumer", "event_type"))
  )

  val oracleSql: Map[String, String] = Map(
    "filter_eq" ->
      s"$evSel FROM events WHERE event_type = 'purchase' ORDER BY event_id",

    "filter_cmp" ->
      s"$evSel FROM events WHERE value > 100 AND value <= 200 AND event_type <> 'error' ORDER BY event_id",

    "filter_between" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_discount FROM lineitem
        |WHERE l_quantity BETWEEN 10 AND 20 AND l_discount NOT BETWEEN 0.02 AND 0.08
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "filter_in" ->
      s"$evSel FROM events WHERE event_type IN ('click','view','purchase') AND event_type NOT IN ('purchase') ORDER BY event_id",

    "filter_like" ->
      """SELECT p_partkey, p_name, p_brand, p_type FROM part
        |WHERE p_type LIKE '%DARD' OR p_brand LIKE 'Brand#1_'
        |   OR p_name LIKE 'cold!_w%' ESCAPE '!' OR p_name NOT LIKE '%o%'
        |ORDER BY p_partkey""".stripMargin,

    "filter_null" ->
      s"""$evSel, maybe FROM (
         |  SELECT *, NULLIF(event_type, 'click') AS maybe FROM events
         |) WHERE maybe IS NULL OR maybe = 'purchase' ORDER BY event_id""".stripMargin,

    "filter_bool3" ->
      s"""$evSel FROM (
         |  SELECT *, CASE WHEN event_type = 'error' THEN NULL ELSE value > 150 END AS flag
         |  FROM events
         |) WHERE NOT (flag AND event_type = 'view' OR value > 300) ORDER BY event_id""".stripMargin,

    "filter_arith" ->
      s"$evSel FROM events WHERE value * 2 - 10 > user_id / 3 + 5 AND value / 4 + 1 < 60 ORDER BY event_id",

    "filter_props" ->
      s"""$evSel, CAST(props->>'$$.k' AS DOUBLE) AS k_val FROM events
         |WHERE CAST(props->>'$$.k' AS DOUBLE) >= 50 AND CAST(props->>'$$.k' AS DOUBLE) < 90
         |ORDER BY event_id""".stripMargin,

    "selector_compile" ->
      s"""$evSel FROM events
         |WHERE (event_type IN ('purchase','signup','view')
         |  AND CAST(props->>'$$.k' AS DOUBLE) BETWEEN 10 AND 90
         |  AND value > 20 AND NOT (user_id < 50 OR event_type LIKE 'v%'))
         |  OR value >= 300
         |ORDER BY event_id""".stripMargin,

    "filter_result_route" ->
      s"""$evSel,
         |  CASE WHEN event_type IN ('purchase','signup') AND value > 50 THEN 'ACCEPT'
         |       WHEN event_type = 'error' THEN 'RESCHEDULE'
         |       ELSE 'REJECT' END AS verdict
         |FROM events ORDER BY event_id""".stripMargin,

    "filter_subscriptions" ->
      """WITH m AS (
        |  SELECT event_id, event_type, ROUND(value, 2) AS value, 'alerts' AS subscription
        |  FROM events WHERE event_type = 'error' AND value > 100
        |  UNION ALL
        |  SELECT event_id, event_type, ROUND(value, 2), 'bigbuys'
        |  FROM events WHERE event_type = 'purchase' AND value BETWEEN 200 AND 400
        |  UNION ALL
        |  SELECT event_id, event_type, ROUND(value, 2), 'signups_hi'
        |  FROM events WHERE value * 2 > 500 OR event_type LIKE 'sign%'
        |  UNION ALL
        |  SELECT event_id, event_type, ROUND(value, 2), 'vip'
        |  FROM events WHERE CAST(props->>'$.k' AS DOUBLE) >= 90
        |    AND event_type <> 'error')
        |SELECT * FROM m ORDER BY event_id, subscription""".stripMargin,

    "filter_headers" ->
      s"""$evSel, event_id % 3 + 1 AS delivery_count FROM events
         |WHERE epoch_ms(ts) >= 1705000000000
         |  AND (CAST(props->>'$$.k' AS BIGINT) % 10) BETWEEN 3 AND 8
         |  AND event_id % 3 + 1 < 3
         |  AND event_type <> 'error'
         |ORDER BY event_id""".stripMargin,

    "filter_batch_entry" ->
      """WITH g AS (
        |  SELECT event_id // 4 AS entry_id, COUNT(*) AS n_msgs,
        |    CAST(SUM(CASE WHEN event_type IN ('purchase','signup','click','view')
        |                       AND value > 40 THEN 1 ELSE 0 END) AS BIGINT) AS n_match
        |  FROM events GROUP BY 1)
        |SELECT entry_id, n_msgs, n_match,
        |  CASE WHEN n_match = n_msgs THEN 'ACCEPT'
        |       WHEN n_match = 0 THEN 'REJECT'
        |       ELSE 'RESCHEDULE' END AS verdict
        |FROM g ORDER BY entry_id""".stripMargin,

    // the oracle shortcut IS the check: a lossless split must
    // reassemble to the original payload, so the oracle computes the
    // sha directly on the payload and the dispositions closed-form —
    // Spark's exploded/shuffled/merged result must land on the same
    // hashes and the same TIMED_OUT set
    "filter_chunked_reassembly" ->
      """SELECT CAST(user_id % 8 AS BIGINT) AS producer_id,
        |  event_id AS msg_seq,
        |  CAST(event_id % 3 + 1 AS BIGINT) AS total_chunks,
        |  CAST(CASE WHEN event_id % 13 = 0 AND event_id % 3 + 1 >= 2
        |            THEN event_id % 3 ELSE event_id % 3 + 1 END AS BIGINT)
        |    AS n_received,
        |  CASE WHEN event_id % 13 = 0 AND event_id % 3 + 1 >= 2
        |       THEN 'TIMED_OUT' ELSE 'COMPLETE' END AS disposition,
        |  CASE WHEN event_id % 13 = 0 AND event_id % 3 + 1 >= 2 THEN NULL
        |       ELSE sha256(event_type || ':' || CAST(user_id AS VARCHAR)
        |                   || ':' || props) END AS payload_sha
        |FROM events ORDER BY msg_seq""".stripMargin,

    "filter_txn_read_committed" ->
      """SELECT event_type,
        |  CAST(SUM(CASE WHEN (event_id // 10) % 7 <> 0
        |                THEN 1 ELSE 0 END) AS BIGINT) AS n_visible,
        |  CAST(SUM(CASE WHEN (event_id // 10) % 7 = 0
        |                THEN 1 ELSE 0 END) AS BIGINT) AS n_aborted_hidden,
        |  CAST(SUM(CASE WHEN (event_id // 10) % 7 <> 0
        |                THEN CAST(ROUND(value, 2) AS DECIMAL(28,2)) END)
        |       AS DOUBLE) AS sum_visible
        |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin,

    "filter_subscription_modes" ->
      """WITH mx AS (SELECT MAX(event_id) AS m FROM events),
        |r AS (
        |  SELECT 'exclusive' AS sub_type, 'consumer-0' AS consumer, event_id
        |  FROM events
        |  UNION ALL
        |  SELECT 'failover',
        |    CASE WHEN event_id <= m // 2 THEN 'consumer-0'
        |         ELSE 'consumer-1' END, event_id
        |  FROM events, mx
        |  UNION ALL
        |  SELECT 'shared', 'consumer-' || CAST(event_id % 3 AS VARCHAR),
        |    event_id
        |  FROM events)
        |SELECT sub_type, consumer, COUNT(*) AS n,
        |  MIN(event_id) AS min_pos, MAX(event_id) AS max_pos
        |FROM r GROUP BY 1, 2 ORDER BY sub_type, consumer""".stripMargin,

    "filter_keyshared" ->
      s"""WITH r AS (
         |  SELECT event_type, user_id,
         |    ${graft.llm.Text.tokHashDOn("CAST(user_id AS VARCHAR)")} % 65536 AS slot
         |  FROM events)
         |SELECT CASE WHEN slot < 21846 THEN 'consumer-0'
         |            WHEN slot < 43691 THEN 'consumer-1'
         |            ELSE 'consumer-2' END AS consumer,
         |       event_type, COUNT(*) AS n,
         |       COUNT(DISTINCT user_id) AS n_keys
         |FROM r GROUP BY 1, 2 ORDER BY consumer, event_type""".stripMargin
  )
}
