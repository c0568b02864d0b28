package graft

import graft.streaming.{MessageSource, Pipeline}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import java.sql.Timestamp

/** Streaming batch-equivalence (SURVEY.md §5.5): each Pipeline transform
  * run as a Trigger.AvailableNow stream over the same events must equal
  * its batch execution; plus watermark late-data semantics via
  * MemoryStream, which no batch twin can express.
  */
class StreamSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  private lazy val spark: SparkSession = GraftSession.tuned(
    SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true"))
    .getOrCreate()

  /** Copy the single events parquet into a fresh dir (file-stream sources
    * watch directories), stream it with AvailableNow into a memory sink,
    * and hand back the collected result. */
  private def runFileStream(transform: DataFrame => DataFrame, name: String,
      mode: String = "complete"): DataFrame = {
    val streamDir = Files.createTempDirectory(s"graft_stream_$name")
    Files.copy(java.nio.file.Paths.get(s"$dir/events.parquet"),
      streamDir.resolve("events.parquet"))
    val ckpt = Files.createTempDirectory(s"graft_ckpt_$name").toString
    val q = transform(MessageSource.fileStream(spark, streamDir.toString))
      .writeStream.outputMode(mode)
      .format("memory").queryName(name)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    spark.table(name)
  }

  private def assertSameRows(a: DataFrame, b: DataFrame): Unit = {
    assert(a.count() === b.count())
    assert(a.except(b).count() === 0)
    assert(b.except(a).count() === 0)
  }

  test("tumbling window: stream(AvailableNow) == batch") {
    val streamed = runFileStream(Pipeline.tumbling, "tumbling")
    assertSameRows(streamed, Pipeline.tumbling(Tables.events(spark, dir)))
  }

  test("RocksDB state store: stateful stream results == default provider == batch") {
    // the provider is a runtime SQL conf picked up at query start — the
    // opt-in GraftSession wires via SPARK_GRAFT_STATESTORE=rocksdb;
    // exercised here directly so one suite run covers both providers
    val conf = "spark.sql.streaming.stateStore.providerClass"
    val before = spark.conf.getOption(conf)
    spark.conf.set(conf, GraftSession.rocksDBProvider)
    try {
      val tumb = runFileStream(Pipeline.tumbling, "tumbling_rocks")
      assertSameRows(tumb, Pipeline.tumbling(Tables.events(spark, dir)))
      val sess = runFileStream(Pipeline.sessions, "sessions_rocks")
      assertSameRows(sess, Pipeline.sessions(Tables.events(spark, dir)))
    } finally {
      before match {
        case Some(v) => spark.conf.set(conf, v)
        case None => spark.conf.unset(conf)
      }
    }
  }

  test("session windows: stream(AvailableNow) == batch") {
    val streamed = runFileStream(Pipeline.sessions, "sessions")
    assertSameRows(streamed, Pipeline.sessions(Tables.events(spark, dir)))
  }

  test("sliding windows: stream(AvailableNow) == batch") {
    val streamed = runFileStream(Pipeline.sliding, "sliding")
    assertSameRows(streamed, Pipeline.sliding(Tables.events(spark, dir)))
  }

  test("flagship filter pipeline: stream == batch == entry") {
    val cust = Tables.customer(spark, dir)
    val streamed = runFileStream(Pipeline.filterPipeline(_, cust), "flagship")
    val batch = Pipeline.filterPipeline(Tables.events(spark, dir), cust)
    assertSameRows(streamed, batch)
    assertSameRows(streamed, SparkEntry.entry(spark))
    assert(SparkEntry.entry(spark).count() > 0, "driver smoke gate: entry rows > 0")
  }

  test("Pulsar-shape source contract: stub connector frame binds the flagship pipeline unchanged") {
    // VERDICT r07 item 3: prove the MessageSource binding claim — a
    // source emitting the Pulsar connector's frame shape (binary JSON
    // payload, string-string properties map, __eventTime) drives the
    // full selector→route→enrich→window chain through fromPulsarShape
    // with NO pipeline change, and results equal the file-source run.
    val ev = Tables.events(spark, dir)
    val shaped = ev.select(
      col("user_id").cast("string").as("__key"),
      lit("persistent://graft/events").as("__topic"),
      col("ts").as("__eventTime"),
      map(lit("k"), get_json_object(col("props"), "$.k"))
        .as("__messageProperties"),
      to_json(struct(col("event_id"), col("user_id"), col("event_type"),
        col("value"))).cast("binary").as("value"))
    assert(shaped.schema.map(f => (f.name, f.dataType)) ===
      MessageSource.pulsarShape.map(f => (f.name, f.dataType)),
      "the stub must emit exactly the connector's frame shape")
    val srcDir = Files.createTempDirectory("graft_stream_pulsar").toString
    shaped.write.mode("overwrite").parquet(srcDir)
    val cust = Tables.customer(spark, dir)
    val src = spark.readStream.schema(MessageSource.pulsarShape).parquet(srcDir)
    val q = Pipeline.filterPipeline(MessageSource.fromPulsarShape(src), cust)
      .writeStream.outputMode("complete").format("memory")
      .queryName("pulsar_contract")
      .option("checkpointLocation",
        Files.createTempDirectory("graft_ckpt_pulsar").toString)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    // == the file-source run == the batch flagship (transitively the
    // driver's entry smoke gate)
    assertSameRows(spark.table("pulsar_contract"),
      Pipeline.filterPipeline(Tables.events(spark, dir), cust))
  }

  test("multi-subscription fan-out: stream == batch (stateless selector routing)") {
    // the PIP-105 broker shape: the same compiled-selector fan-out
    // (filter_subscriptions) runs unchanged over the unbounded source —
    // stateless, so append mode needs no watermark
    val streamed = runFileStream(
      graft.relational.Filters.subscriptionFanOut, "subs_fanout", mode = "append")
    assertSameRows(streamed, SparkEntry.queries("filter_subscriptions")(spark, dir))
  }

  test("batched-entry filter: stream over packed entries == batch, verdicts are entry-level") {
    // PIP-105 batched-entry fidelity (VERDICT r09 item 2): entries
    // ARRIVE packed at a broker, so the stream source emits the packed
    // (entry_id, msgs) frame and the verdict stage runs unchanged —
    // stateless map-side work, append mode, no watermark.
    import graft.relational.Filters
    val entries = Filters.packEntries(Tables.events(spark, dir))
    val srcDir = Files.createTempDirectory("graft_stream_entries").toString
    entries.repartition(3).write.mode("overwrite").parquet(srcDir)
    val src = spark.readStream.schema(entries.schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
    val q = Filters.entryVerdicts(src)
      .writeStream.outputMode("append").format("memory")
      .queryName("entry_verdicts")
      .option("checkpointLocation",
        Files.createTempDirectory("graft_ckpt_entries").toString)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assertSameRows(spark.table("entry_verdicts"),
      SparkEntry.queries("filter_batch_entry")(spark, dir))
    // the entry-level contract: a mixed entry RESCHEDULEs (the broker
    // cannot split an entry), and the fixture actually exercises all
    // three verdicts
    val verdicts = spark.table("entry_verdicts").select("verdict")
      .distinct().collect().map(_.getString(0)).toSet
    assert(verdicts === Set("ACCEPT", "REJECT", "RESCHEDULE"),
      s"fixture must exercise all three entry verdicts, got $verdicts")
    val mixed = spark.table("entry_verdicts")
      .where(col("n_match") > 0 && col("n_match") < col("n_msgs"))
    assert(mixed.where(col("verdict") =!= "RESCHEDULE").isEmpty,
      "every mixed entry must RESCHEDULE")
  }

  test("cursor seek/replay: replay-from-cursor stream == batch twin, truncated-commit re-replay idempotent") {
    // VERDICT r09 item 3 — consumer.seek: the by-time cursor resolves
    // to a POSITION (broker metadata; here the batch 1-row min), and
    // the replay source then delivers exactly the positions >= cursor.
    import graft.streaming.MessageSource
    val ev = Tables.events(spark, dir)
    val srcDir = Files.createTempDirectory("graft_seek_src").toString
    ev.repartition(3).write.mode("overwrite").parquet(srcDir)
    val outDir = Files.createTempDirectory("graft_seek_out").toString
    val ckpt = Files.createTempDirectory("graft_ckpt_seek").toString
    val cur = MessageSource.seekCursorByTime(ev, MessageSource.seekTs)
      .head().getLong(0)
    def run(): Unit = {
      val src = spark.readStream
        .schema(spark.read.parquet(srcDir).schema)
        .option("maxFilesPerTrigger", "1").parquet(srcDir)
      val q = src.where(col("event_id") >= cur)
        .writeStream.outputMode("append")
        .foreachBatch { (b: DataFrame, id: Long) =>
          b.write.mode("overwrite").parquet(s"$outDir/batch=$id"); ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (spark.streams.active.exists(_.id == q.id) &&
        System.nanoTime() < deadline) Thread.sleep(50)
    }
    run()
    val twin = SparkEntry.queries("source_seek_replay")(spark, dir)
      .where(col("mode") === "by_time").drop("mode")
    def got() = spark.read.parquet(s"$outDir/batch=*")
      .select(col("event_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_s"),
        col("event_type"))
    assertSameRows(got(), twin)
    // cursor rewind mid-stream: truncate the newest commit and rerun —
    // the replayed epoch overwrites its own batch dir, so redelivery
    // after a rewind is idempotent and the result set is unchanged
    val commits = new java.io.File(s"$ckpt/commits").listFiles()
      .filter(_.getName.forall(_.isDigit)).sortBy(_.getName.toInt)
    val crc = new java.io.File(s"$ckpt/commits/.${commits.last.getName}.crc")
    commits.last.delete()
    if (crc.exists()) crc.delete()
    run()
    assertSameRows(got(), twin)
  }

  test("Key_Shared dispatch: stream == batch, and no key ever splits across consumers") {
    // stateless hash-range routing (the third subscription subtype):
    // the same Pipeline definition routes the unbounded source with
    // zero shuffle and zero state — append mode, no aggregation on the
    // stream (the census is the batch-side report; its distinct-key
    // count is not an incremental op, and doesn't need to be: the
    // broker-side behavior IS the per-message route)
    val streamed = runFileStream(
      ev => Pipeline.keySharedRoute(ev)
        .select(col("event_id"), col("consumer")),
      "keyshared", mode = "append")
    assertSameRows(streamed,
      Pipeline.keySharedRoute(Tables.events(spark, dir))
        .select(col("event_id"), col("consumer")))
    // and the batch census key agrees with a recount over the routing
    val census = SparkEntry.queries("filter_keyshared")(spark, dir)
    val recount = Pipeline.keySharedRoute(Tables.events(spark, dir))
      .groupBy("consumer", "event_type")
      .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("n_keys"))
    assertSameRows(census, recount)
    // the Key_Shared invariant: every key maps to exactly one consumer,
    // so per-consumer distinct-key counts sum to the global count
    val routed = Pipeline.keySharedRoute(Tables.events(spark, dir))
    val split = routed.groupBy("user_id")
      .agg(countDistinct(col("consumer")).as("nc"))
      .where(col("nc") > 1).count()
    assert(split === 0, "a key reached more than one consumer")
  }

  test("delayed delivery: stream (watermark on deliver_at) == batch") {
    // the watermark runs on the VISIBLE clock — the deliver-at shift is
    // a map-side column, so late-data accounting follows delivery time
    // exactly as a broker's delayed-message tracker does; the delay is
    // delayedWatermark (>= max backoff + lateness — see delayedDeliver's
    // streaming contract and the multi-micro-batch test below)
    val streamed = runFileStream(Pipeline.delayedCountsStream, "delayed")
    assertSameRows(streamed, Pipeline.delayedCounts(Tables.events(spark, dir)))
  }

  test("delayed delivery multi-micro-batch: safe watermark keeps on-time events, naive 10m drops them") {
    // ADVICE r07: a single-micro-batch replay never fires the
    // watermark, so the unsafe interaction (a delayed error advances
    // max(deliver_at) past on-time undelayed events) went unexercised.
    // Crafted corpus, one file per micro-batch (maxFilesPerTrigger=1):
    //   f1: error @10:01 → deliver_at 10:16. Under a naive 10 m delay
    //       the watermark jumps to 10:06 although the UNDELAYED clock
    //       has only reached 10:01.
    //   f2: error @10:05 → deliver_at 10:20 (naive wm → 10:10). Spark
    //       filters late events with the PREVIOUS batch's watermark,
    //       so the victim must arrive ≥ 2 batches after the first
    //       error for the 10:06 watermark to be in force.
    //   f3: browse @10:02 — only 3 min behind the raw clock (max raw
    //       ts seen = 10:05), yet its window [10:00, 10:05) is already
    //       expired under the naive delay → dropped
    //   f4: browse @11:00 (advances the final watermark so windows emit)
    import java.sql.Timestamp
    def t(hhmm: String) = Timestamp.valueOf(s"2024-01-01 $hhmm:00")
    def mkEvents(rows: Seq[(Long, Timestamp, Long, String)]) =
      spark.createDataFrame(rows.map { case (id, ts, uid, et) =>
        (id, ts, uid, et, 1.0, "{}") })
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val streamDir = Files.createTempDirectory("graft_stream_delayed_mb")
    def land(name: String, mtime: Long,
        rows: Seq[(Long, Timestamp, Long, String)]): Unit = {
      val tmp = Files.createTempDirectory(s"graft_delayed_mb_$name").toString
      mkEvents(rows).coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dst = streamDir.resolve(s"$name.parquet")
      Files.move(part.toPath, dst)
      // FileStreamSource admits files in modification-time order; pin
      // distinct mtimes so the three micro-batches replay f1 → f2 → f3
      dst.toFile.setLastModified(mtime)
      ()
    }
    val t0 = System.currentTimeMillis() - 60000
    land("f1", t0, Seq((1L, t("10:01"), 1L, "error")))
    land("f2", t0 + 10000, Seq((2L, t("10:05"), 2L, "error")))
    land("f3", t0 + 20000, Seq((3L, t("10:02"), 3L, "browse")))
    land("f4", t0 + 30000, Seq((4L, t("11:00"), 4L, "browse")))
    def run(name: String, delay: String): Map[(Long, String), Long] = {
      val ckpt = Files.createTempDirectory(s"graft_ckpt_$name").toString
      val src = MessageSource.fileStream(spark, streamDir.toString,
        Map("maxFilesPerTrigger" -> "1"))
      val q = Pipeline.delayedDeliver(src)
        .withColumn("da_sec", date_trunc("second", col("deliver_at")))
        .withWatermark("da_sec", delay)
        .groupBy(window(col("da_sec"), "5 minutes").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(unix_timestamp(col("w.start")).as("ws"), col("event_type"), col("n"))
        .writeStream.outputMode("append")
        .format("memory").queryName(name)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      spark.table(name).collect()
        .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    }
    // files are admitted in modification-time order; maxFilesPerTrigger=1
    // makes each file its own micro-batch so the watermark advances
    // between them. Final watermark (safe) = 11:00 - 25m = 10:35 →
    // append mode emits exactly the windows ending <= 10:35.
    val safe = run("delayed_mb_safe", Pipeline.delayedWatermark)
    val ws = (hhmm: String) => t(hhmm).getTime / 1000
    assert(safe === Map(
      (ws("10:00"), "browse") -> 1L, // the on-time 10:02 row SURVIVED
      (ws("10:15"), "error") -> 1L,
      (ws("10:20"), "error") -> 1L))
    // and the emitted windows equal the batch twin restricted to the
    // closed-form final watermark (the stream_dlq_ageout precedent):
    // final wm = 11:00 - 25 m = 10:35 → windows ending <= 10:35
    val batch = Pipeline.delayedCounts(mkEvents(Seq(
        (1L, t("10:01"), 1L, "error"), (2L, t("10:05"), 2L, "error"),
        (3L, t("10:02"), 3L, "browse"), (4L, t("11:00"), 4L, "browse"))))
      .where(col("ws") + 300 <= ws("10:35"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(safe === batch)
    // the naive 10-minute delay: the delayed errors push the watermark
    // 5+ minutes PAST the undelayed clock, so the on-time 10:02 browse
    // is DROPPED — the divergence the contract exists to prevent,
    // actually exercised
    val naive = run("delayed_mb_naive", "10 minutes")
    assert(!naive.contains((ws("10:00"), "browse")),
      "naive 10m watermark should have dropped the on-time 10:02 event")
    assert(naive === Map(
      (ws("10:15"), "error") -> 1L,
      (ws("10:20"), "error") -> 1L))
  }

  test("windowed top-k: rank over the streamed incremental agg == batch twin") {
    // the incremental windowed count runs as the stream (complete
    // mode); the rank is applied to the SINK table — the foreachBatch/
    // sink-side pattern the key's scaladoc declares
    val counts = runFileStream(Pipeline.windowUserCounts, "win_topk_counts")
    val streamedTopk = Pipeline.topkOfCounts(counts)
    assertSameRows(streamedTopk,
      SparkEntry.queries("stream_window_topk")(spark, dir))
  }

  test("classifier ingest gate: hashed-model scoring over a document stream == batch") {
    // the model-based quality filter runs AT INGEST in production —
    // the same classifierLogits definition (broadcast weight vector,
    // doc-keyed agg) over an unbounded document source must equal the
    // batch scoring; complete mode, state = one logit row per doc
    import graft.llm.Selection
    val docs = Tables.documents(spark, dir)
    val inDir = Files.createTempDirectory("graft_cls_in").toString
    docs.select("doc_id", "text").repartition(3).write.mode("append").json(inDir)
    val ckpt = Files.createTempDirectory("graft_ckpt_cls").toString
    val q = Selection.classifierLogits(
        spark.readStream.schema("doc_id LONG, text STRING").json(inDir),
        Selection.classifierWeights(spark))
      .writeStream.outputMode("complete").format("memory")
      .queryName("cls_stream")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    assertSameRows(spark.table("cls_stream"),
      Selection.classifierLogits(docs, Selection.classifierWeights(spark)))
  }

  test("stream-static join: stream == batch") {
    val cust = Tables.customer(spark, dir)
    val streamed = runFileStream(Pipeline.enrich(_, cust), "enrich", mode = "append")
    assertSameRows(streamed, Pipeline.enrich(Tables.events(spark, dir), cust))
  }

  test("bloom-gated enrichment: stream == batch == plain join (probe changes nothing)") {
    val dim = Tables.customer(spark, dir)
      .where(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"), col("c_mktsegment"))
    val bf = dim.stat.bloomFilter("c_custkey", 1000, 0.01)
    val streamed = runFileStream(Pipeline.bloomEnrich(_, dim, bf), "bloom_enrich")
    val batch = Pipeline.bloomEnrich(Tables.events(spark, dir), dim, bf)
    assertSameRows(streamed, batch)
    // and the bloom gate must not change the result vs the plain join
    val plain = Tables.events(spark, dir)
      .withColumn("ts_sec", date_trunc("second", col("ts")))
      .join(dim, col("user_id") === col("c_custkey"))
      .groupBy(window(col("ts_sec"), "10 minutes").as("w"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n"))
      .select(unix_timestamp(col("w.start")).as("ws"), col("c_mktsegment"), col("n"))
    assertSameRows(batch, plain)
  }

  test("streaming dedup keeps one row per key (== batch key set)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // feed events sorted by event time so arrival order == event order
    val sorted = Tables.events(spark, dir)
      .withColumn("ts_sec", date_trunc("second", col("ts")))
      .orderBy("ts_sec", "event_id")
      .select(col("event_id"), col("ts").cast("timestamp").as("ts"),
        col("user_id"), col("event_type"))
      .as[(Long, Timestamp, Long, String)].collect()
    val mem = MemoryStream[(Long, Timestamp, Long, String)]
    mem.addData(sorted.toSeq)
    val ckpt = Files.createTempDirectory("graft_ckpt_dedup").toString
    val q = mem.toDF().toDF("event_id", "ts", "user_id", "event_type")
      .dropDuplicates("user_id", "event_type")
      .writeStream.outputMode("append").format("memory").queryName("dedup")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = spark.table("dedup").select("user_id", "event_type", "event_id")
    val batch = Pipeline.firstPerKey(Tables.events(spark, dir))
      .select("user_id", "event_type", "event_id")
    assertSameRows(streamed, batch)
  }

  test("topic compaction: the streamed keep-latest state == the batch compacted view") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = Tables.events(spark, dir)
      .select(col("event_id"), col("ts").cast("timestamp").as("ts"),
        col("user_id"), col("event_type"), col("value"))
      .as[(Long, Timestamp, Long, String, Double)].collect()
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)]
    mem.addData(rows.toSeq)
    val ckpt = Files.createTempDirectory("graft_ckpt_compaction").toString
    // the compactor's actual state shape: per-key max of the
    // (ts_sec, event_id, value) struct — field-by-field struct
    // ordering IS the batch window's (ts_sec DESC, event_id DESC)
    // argmax, and the state is O(1) per key
    val q = mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("ts_sec", date_trunc("second", col("ts")))
      .groupBy("user_id", "event_type")
      .agg(max(struct(col("ts_sec"), col("event_id"), col("value"))).as("m"))
      .select(col("user_id"), col("event_type"),
        col("m.event_id").as("event_id"), col("m.value").as("value"))
      .writeStream.outputMode("complete").format("memory")
      .queryName("compaction")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = spark.table("compaction")
    val batch = Pipeline.compactLatest(Tables.events(spark, dir))
      .select("user_id", "event_type", "event_id", "value")
    assertSameRows(streamed, batch)
  }

  test("union of two filtered streams: stream == batch") {
    // two DISTINCT file-stream sources (separate dirs, separate offset
    // logs) — a self-union of one source would not exercise the
    // multi-source fan-in the operator documents
    def src(name: String) = {
      val d = Files.createTempDirectory(s"graft_stream_$name")
      Files.copy(java.nio.file.Paths.get(s"$dir/events.parquet"),
        d.resolve("events.parquet"))
      MessageSource.fileStream(spark, d.toString)
    }
    val unioned = Pipeline.unionCounts(
      src("u1").where(col("event_type") === "purchase"),
      src("u2").where(col("event_type") === "click"))
    val ckpt = Files.createTempDirectory("graft_ckpt_union").toString
    val q = unioned.writeStream.outputMode("complete")
      .format("memory").queryName("union2")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val bev = Tables.events(spark, dir)
    assertSameRows(spark.table("union2"), Pipeline.unionCounts(
      bev.where(col("event_type") === "purchase"),
      bev.where(col("event_type") === "click")))
  }

  test("stream-stream interval join (purchases x clicks): stream == batch") {
    val streamDir = Files.createTempDirectory("graft_stream_ss")
    Files.copy(java.nio.file.Paths.get(s"$dir/events.parquet"),
      streamDir.resolve("events.parquet"))
    def src() = MessageSource.fileStream(spark, streamDir.toString)
    val joined = Pipeline.purchaseClickJoin(
      src().where(col("event_type") === "purchase").withWatermark("ts", "2 hours"),
      src().where(col("event_type") === "click").withWatermark("ts", "2 hours"))
    val ckpt = Files.createTempDirectory("graft_ckpt_ss").toString
    val q = joined.writeStream.outputMode("append").format("memory").queryName("ssjoin")
      .option("checkpointLocation", ckpt).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val ev = Tables.events(spark, dir)
    val batch = Pipeline.purchaseClickJoin(
      ev.where(col("event_type") === "purchase"),
      ev.where(col("event_type") === "click"))
    assertSameRows(spark.table("ssjoin"), batch)
  }

  test("stream-stream LEFT OUTER join: stream == watermark-restricted batch twin") {
    val streamDir = Files.createTempDirectory("graft_stream_sso")
    Files.copy(java.nio.file.Paths.get(s"$dir/events.parquet"),
      streamDir.resolve("events.parquet"))
    def src() = MessageSource.fileStream(spark, streamDir.toString)
    val joined = Pipeline.purchaseClickOuter(
      src().where(col("event_type") === "purchase"),
      src().where(col("event_type") === "click"))
    val ckpt = Files.createTempDirectory("graft_ckpt_sso").toString
    val q = joined.writeStream.outputMode("append").format("memory")
      .queryName("ssouter")
      .option("checkpointLocation", ckpt).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val ev = Tables.events(spark, dir)
    // the batch twin = the key: matched rows unconditionally, null rows
    // only where the closed-form final watermark passed the purchase
    val batch = Pipeline.purchaseClickOuterBatch(
      ev.where(col("event_type") === "purchase"),
      ev.where(col("event_type") === "click"))
    assertSameRows(spark.table("ssouter"), batch)
    // and the null rows genuinely exist (the outer form is exercised)
    assert(spark.table("ssouter").where(col("c_id").isNull).count() > 0)
  }

  test("stream-stream FULL OUTER join: stream == watermark-restricted batch twin, nulls on both sides") {
    val streamDir = Files.createTempDirectory("graft_stream_ssf")
    Files.copy(java.nio.file.Paths.get(s"$dir/events.parquet"),
      streamDir.resolve("events.parquet"))
    def src() = MessageSource.fileStream(spark, streamDir.toString)
    val joined = Pipeline.purchaseClickFullOuter(
      src().where(col("event_type") === "purchase"),
      src().where(col("event_type") === "click"))
    val ckpt = Files.createTempDirectory("graft_ckpt_ssf").toString
    val q = joined.writeStream.outputMode("append").format("memory")
      .queryName("ssfull")
      .option("checkpointLocation", ckpt).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val ev = Tables.events(spark, dir)
    val batch = Pipeline.purchaseClickFullOuterBatch(
      ev.where(col("event_type") === "purchase"),
      ev.where(col("event_type") === "click"))
    assertSameRows(spark.table("ssfull"), batch)
    // both null shapes genuinely exercised
    assert(spark.table("ssfull").where(col("c_id").isNull).count() > 0)
    assert(spark.table("ssfull").where(col("p_id").isNull).count() > 0)
  }

  test("stream-stream outer join multi-batch: null row emits exactly once after watermark expiry") {
    // crafted corpus, one file per micro-batch: p1 (no click) must stay
    // OPEN until the watermark passes its match window, then emit its
    // null row exactly once; the matched pair emits as it joins
    import java.sql.Timestamp
    def t(hhmm: String) = Timestamp.valueOf(s"2024-01-01 $hhmm:00")
    def mkEvents(rows: Seq[(Long, Timestamp, Long, String)]) =
      spark.createDataFrame(rows.map { case (id, ts, uid, et) =>
        (id, ts, uid, et, 1.0, "{}") })
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val streamDir = Files.createTempDirectory("graft_stream_sso_mb")
    def land(name: String, mtime: Long,
        rows: Seq[(Long, Timestamp, Long, String)]): Unit = {
      val tmp = Files.createTempDirectory(s"graft_sso_mb_$name").toString
      mkEvents(rows).coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dst = streamDir.resolve(s"$name.parquet")
      Files.move(part.toPath, dst)
      dst.toFile.setLastModified(mtime)
      ()
    }
    val t0 = System.currentTimeMillis() - 60000
    // f1: p1 @10:00 (user 1, never clicks), click @10:10 + purchase
    //     @10:20 for user 2 (the matched pair)
    land("f1", t0, Seq(
      (1L, t("10:00"), 1L, "purchase"),
      (2L, t("10:10"), 2L, "click"),
      (3L, t("10:20"), 2L, "purchase")))
    // f2: both sides advance to 14:00 → final watermark 13:00 (1 h
    //     delay) passes p1's window; the 14:00 purchase itself stays
    //     open (watermark never passes it) and must NOT emit
    land("f2", t0 + 10000, Seq(
      (4L, t("14:00"), 3L, "purchase"),
      (5L, t("14:00"), 4L, "click")))
    val src = MessageSource.fileStream(spark, streamDir.toString,
      Map("maxFilesPerTrigger" -> "1"))
    val joined = Pipeline.purchaseClickOuter(
      src.where(col("event_type") === "purchase"),
      src.where(col("event_type") === "click"), delaySec = 3600)
    val ckpt = Files.createTempDirectory("graft_ckpt_sso_mb").toString
    val q = joined.writeStream.outputMode("append").format("memory")
      .queryName("ssouter_mb")
      .option("checkpointLocation", ckpt).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("ssouter_mb").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toSeq.sorted
    // exactly one null row for p1 (exactly-once emission), the matched
    // pair, and nothing for the still-open 14:00 purchase
    assert(got === Seq((1L, -1L), (3L, 2L)))
    // and the crafted run equals the closed-form batch twin at the
    // same delay — the contract the fixture-level test asserts at 2 h
    val all = mkEvents(Seq(
      (1L, t("10:00"), 1L, "purchase"), (2L, t("10:10"), 2L, "click"),
      (3L, t("10:20"), 2L, "purchase"), (4L, t("14:00"), 3L, "purchase"),
      (5L, t("14:00"), 4L, "click")))
    val batch = Pipeline.purchaseClickOuterBatch(
      all.where(col("event_type") === "purchase"),
      all.where(col("event_type") === "click"), delaySec = 3600)
    assertSameRows(spark.table("ssouter_mb"), batch)
  }

  test("foreachBatch parquet sink: streamed flagship output == batch output") {
    val streamDir = Files.createTempDirectory("graft_stream_sink")
    Files.copy(java.nio.file.Paths.get(s"$dir/events.parquet"),
      streamDir.resolve("events.parquet"))
    val outDir = Files.createTempDirectory("graft_sink_out").toString
    val ckpt = Files.createTempDirectory("graft_ckpt_sink").toString
    val cust = Tables.customer(spark, dir)
    val q = Pipeline.filterPipeline(MessageSource.fileStream(spark, streamDir.toString), cust)
      .writeStream.outputMode("complete")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        batch.coalesce(1).write.mode("overwrite").parquet(outDir)
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val sunk = spark.read.parquet(outDir)
    assertSameRows(sunk, Pipeline.filterPipeline(Tables.events(spark, dir), cust))
  }

  test("PIP-105 redelivery loop: stream re-enqueue == batch; recoveries and dead-letters exercised") {
    val inDir = Files.createTempDirectory("graft_redeliver_in").toString
    val outDir = Files.createTempDirectory("graft_redeliver_out").toString
    val ckpt = Files.createTempDirectory("graft_ckpt_redeliver").toString
    // enqueue the fixture events as first-delivery messages
    Tables.events(spark, dir)
      .select(col("event_id"), col("event_type"), col("value"), col("props"),
        lit(1).as("delivery_count"))
      .write.mode("append").json(inDir)
    Pipeline.redeliverStream(spark, inDir, outDir, ckpt)
    // batch=<id> partition dirs (the idempotent per-batch sink) surface
    // a discovered `batch` column — project it away for the compare
    val streamed = spark.read.parquet(outDir)
      .select("event_id", "disposition", "attempts")
    val batch = Pipeline.redeliver(Tables.events(spark, dir))
    assertSameRows(streamed, batch)
    // every message gets exactly one final disposition
    assert(streamed.count() === Tables.events(spark, dir).count())
    // the crafted transient-fault model must exercise both loop exits:
    // recovery on a retry (ACCEPT with attempts > 1) and exhaustion
    assert(streamed.where("disposition = 'ACCEPT' AND attempts > 1").count() > 0,
      "no message recovered on redelivery")
    assert(streamed.where("disposition = 'DEAD_LETTER' AND attempts = 3").count() > 0,
      "no message dead-lettered after maxDeliveries")
  }

  test("nack backoff ladder: accumulated deliver-at across micro-batches == closed form; pending ladder gated out") {
    // VERDICT r09 item 4 — crafted corpus at 10:00 (epoch seconds):
    //   100 purchase k=60 v=100     → ACCEPT attempt 1, delivered at t
    //   101 error (%4=1)            → recovers attempt 2, t+60
    //   102 error (%4=2)            → recovers attempt 3, t+60+120
    //   103 error (%4=3)            → DEAD_LETTER after 3, t+180
    //   104 view                    → REJECT attempt 1, t
    //   107 error (%4=3) @10:58     → ladder lands 11:01 > max ts
    //                                 (11:00) — PENDING, gated out
    //   105 click @11:00            → REJECT; sets the final watermark
    import java.sql.Timestamp
    val rows = Seq(
      (100L, "2024-01-01 10:00:00", 7L, "purchase", 100.0, """{"k":60}"""),
      (101L, "2024-01-01 10:00:00", 7L, "error", 1.0, """{"k":10}"""),
      (102L, "2024-01-01 10:00:00", 7L, "error", 1.0, """{"k":10}"""),
      (103L, "2024-01-01 10:00:00", 7L, "error", 1.0, """{"k":10}"""),
      (104L, "2024-01-01 10:00:00", 7L, "view", 1.0, """{"k":10}"""),
      (107L, "2024-01-01 10:58:00", 8L, "error", 1.0, """{"k":10}"""),
      (105L, "2024-01-01 11:00:00", 9L, "click", 1.0, """{"k":10}"""))
    val ev = spark.createDataFrame(rows.map { case (id, ts, uid, et, v, p) =>
      (id, Timestamp.valueOf(ts), uid, et, v, p) })
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val inDir = Files.createTempDirectory("graft_backoff_in").toString
    val outDir = Files.createTempDirectory("graft_backoff_out").toString
    val ckpt = Files.createTempDirectory("graft_ckpt_backoff").toString
    ev.select(col("event_id"), col("event_type"), col("value"), col("props"),
        lit(1).as("delivery_count"),
        unix_timestamp(date_trunc("second", col("ts"))).as("deliver_at"))
      .write.mode("append").json(inDir)
    Pipeline.redeliverBackoffStream(spark, inDir, outDir, ckpt)
    val drained = spark.read.parquet(outDir)
      .select("event_id", "disposition", "attempts", "delivered_at")
    val maxT = ev.agg(max(unix_timestamp(date_trunc("second", col("ts")))))
      .head().getLong(0)
    // the loop itself is clockless — the pending ladder IS in the
    // drained sink, with its accumulated deliver-at past the watermark
    val pending = drained.where(col("event_id") === 107L).collect()
    assert(pending.length === 1 && pending.head.getLong(3) > maxT,
      "the crafted pending ladder must accumulate past the final watermark")
    // the final-watermark gate (the batch twin's) drops exactly it,
    // and the accumulated clocks equal the closed form row for row
    assertSameRows(drained.where(col("delivered_at") <= maxT),
      Pipeline.redeliverBackoffBatch(ev))
    // the ladder itself: a recovery on attempt 3 carries 60+120 shift
    val a3 = drained.where("event_id = 102").head()
    assert(a3.getLong(2) === 3L && a3.getLong(3) === maxT - 3600 + 180,
      s"attempt-3 recovery must land at t+180, got ${a3.getLong(3)}")
  }

  test("streaming index maintenance: post-stream band store == batch-built index, probes agree") {
    import graft.llm.Incremental
    val docs = Tables.documents(spark, dir)
    val day1 = docs.where(col("doc_id") % 4 =!= 0)
    // half the corpus is indexed up front; the rest arrives as a stream
    val initial = day1.where(pmod(col("doc_id"), lit(2)) === 1)
    val arriving = day1.where(pmod(col("doc_id"), lit(2)) === 0)
    val streamed = "shidx_streamed_test"
    val batchBuilt = "shidx_batch_test"
    // dropStaleTables also deletes the warehouse location — a leftover
    // dir from a previous JVM fails CREATE even when the fresh
    // in-memory catalog says the table doesn't exist
    Tables.dropStaleTables(spark, streamed)
    Tables.dropStaleTables(spark, batchBuilt)
    Incremental.buildSimhashIndex(initial, streamed)
    val inDir = Files.createTempDirectory("graft_shidx_in").toString
    arriving.select("doc_id", "text").write.mode("append").json(inDir)
    val ckpt = Files.createTempDirectory("graft_ckpt_shidx").toString
    val q = Incremental.maintainSimhashIndex(
      spark.readStream.schema("doc_id LONG, text STRING").json(inDir),
      streamed, ckpt)
    q.awaitTermination()
    // the maintained table must equal the index batch-built over all of
    // day 1 (content columns — epochs differ by construction: the
    // maintained table has one partition per micro-batch)
    Incremental.buildSimhashIndex(day1, batchBuilt)
    val content = Seq("band_id", "band_val", "idx_id", "h").map(col)
    assertSameRows(spark.table(streamed).select(content: _*),
      spark.table(batchBuilt).select(content: _*))
    // and the bucket layout survived the append: probing the maintained
    // index gives the same matches as probing the batch-built one
    assertSameRows(
      Incremental.simhashProbe(spark, dir, streamed),
      Incremental.simhashProbe(spark, dir, batchBuilt))
    assert(Incremental.simhashProbe(spark, dir, streamed).count() > 0,
      "probe found no candidates — fixture should contain near-dups")
  }

  test("DLQ TTL age-out: streamed eviction records == batch closed form") {
    import org.apache.spark.sql.streaming.Trigger
    val dlq = graft.streaming.Pipeline.deadLetters(Tables.events(spark, dir))
      .localCheckpoint()
    val inDir = Files.createTempDirectory("graft_dlq_in").toString
    dlq.write.mode("append").json(inDir)
    val ckpt = Files.createTempDirectory("graft_ckpt_dlq").toString
    val q = graft.streaming.Pipeline.dlqAgeOut(
        spark.readStream.schema("event_id LONG, attempts LONG, ts TIMESTAMP")
          .json(inDir))
      .writeStream.outputMode("append").format("memory")
      .queryName("dlq_ageout_probe")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = spark.table("dlq_ageout_probe")
    val batch = graft.streaming.Pipeline.dlqAgeOutBatch(dlq)
    assertSameRows(streamed, batch)
    // the TTL must be exercised both ways: some windows aged out, some
    // still inside the retention horizon
    val allWindows = graft.streaming.Pipeline.dlqAgeOut(dlq).count()
    assert(streamed.count() > 0, "no dead-letter window aged out")
    assert(streamed.count() < allWindows,
      "every window aged out — TTL horizon not exercised")
  }

  test("streaming IVF maintenance: maintained inverted lists == batch-built; retrain trigger") {
    import graft.llm.{Incremental, Similarity}
    val emb = Tables.embeddings(spark, dir)
    val n = emb.count()
    val k = Similarity.ivfCells(n)
    val cents = Similarity.learnedCentroids(spark, dir, k)
    // half the corpus is indexed up front; the rest arrives as a stream
    val initial = emb.where(pmod(col("vec_id"), lit(2)) === 1)
    val arriving = emb.where(pmod(col("vec_id"), lit(2)) === 0)
    val streamed = "ivfidx_streamed_test"
    val batchBuilt = "ivfidx_batch_test"
    Tables.dropStaleTables(spark, streamed)
    Tables.dropStaleTables(spark, batchBuilt)
    Incremental.buildIvfIndex(initial, streamed, cents, k, epoch = None)
    val inDir = Files.createTempDirectory("graft_ivfidx_in").toString
    arriving.select(col("vec_id"),
        col("embedding").cast("array<double>").as("embedding"))
      .write.mode("append").json(inDir)
    val ckpt = Files.createTempDirectory("graft_ckpt_ivfidx").toString
    val q = Incremental.maintainIvfIndex(
      spark.readStream.schema("vec_id LONG, embedding ARRAY<DOUBLE>").json(inDir),
      streamed, cents, k, ckpt)
    q.awaitTermination()
    // delta assignment against the frozen quantizer must reproduce the
    // index batch-built over the full corpus with the same centroids
    Incremental.buildIvfIndex(emb, batchBuilt, cents, k, epoch = None)
    assertSameRows(spark.table(streamed).select("cell", "idx_id"),
      spark.table(batchBuilt).select("cell", "idx_id"))
    // healthy at the matching K — appends alone must not trip re-train
    assert(!Incremental.ivfRetrainDue(spark, streamed, k),
      "retrain tripped on a balanced, correctly-sized index")
    // and a quantizer the corpus outgrew by > 2x is flagged
    val staleK = math.max(1, (math.sqrt(n.toDouble) / 4).toInt)
    assert(Incremental.ivfRetrainDue(spark, streamed, staleK),
      s"retrain not flagged for stale K=$staleK at n=$n")
  }

  test("stream_cdc_apply: keyed-state latest-change == batch twin across micro-batches") {
    import org.apache.spark.sql.streaming.Trigger
    import graft.streaming.Pipeline
    val ev = Tables.events(spark, dir)
    // several json files + maxFilesPerTrigger=1 forces MULTIPLE
    // micro-batches, so the per-key state genuinely carries across
    // batches (a single-batch drain would pass even with no state)
    val inDir = Files.createTempDirectory("graft_cdc_in").toString
    ev.select("event_id", "ts", "user_id", "event_type", "value")
      .repartition(4).write.mode("append").json(inDir)
    val ckpt = Files.createTempDirectory("graft_ckpt_cdc").toString
    val q = Pipeline.cdcLatestStream(Pipeline.cdcChanges(
        spark.readStream
          .schema("event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE")
          .option("maxFilesPerTrigger", "1").json(inDir)))
      .writeStream.outputMode("update").format("memory")
      .queryName("cdc_latest_probe")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val emitted = spark.table("cdc_latest_probe")
    assert(emitted.select("user_id").distinct().count() < emitted.count(),
      "every key emitted once — stream did not run multiple micro-batches")
    // final emission per key (the state after the drain) == batch fold
    val w = org.apache.spark.sql.expressions.Window.partitionBy("user_id")
      .orderBy(col("last_t").desc, col("event_id").desc)
    val finalState = emitted.withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select("user_id", "op", "last_value", "last_t")
    assertSameRows(finalState, Pipeline.cdcLatestBatch(ev))
  }

  test("streaming sha-index maintenance: maintained hash set == batch; probes agree") {
    import graft.llm.Incremental
    val docs = Tables.documents(spark, dir)
    val day1 = docs.where(col("doc_id") % 4 =!= 0)
    val initial = day1.where(pmod(col("doc_id"), lit(2)) === 1)
    val arriving = day1.where(pmod(col("doc_id"), lit(2)) === 0)
    val streamed = "shaidx_streamed_test"
    val batchBuilt = "shaidx_batch_test"
    Tables.dropStaleTables(spark, streamed)
    Tables.dropStaleTables(spark, batchBuilt)
    initial.select(sha2(col("text"), 256).as("h"), lit(-1L).as("epoch"))
      .distinct()
      .write.partitionBy("epoch")
      .bucketBy(16, "h").sortBy("h").format("parquet").saveAsTable(streamed)
    val inDir = Files.createTempDirectory("graft_shaidx_in").toString
    arriving.select("doc_id", "text").write.mode("append").json(inDir)
    val ckpt = Files.createTempDirectory("graft_ckpt_shaidx").toString
    val q = Incremental.maintainShaIndex(
      spark.readStream.schema("doc_id LONG, text STRING").json(inDir),
      streamed, ckpt)
    q.awaitTermination()
    day1.select(sha2(col("text"), 256).as("h")).distinct()
      .write.bucketBy(16, "h").sortBy("h").format("parquet").saveAsTable(batchBuilt)
    // per-batch distinct can repeat a hash ACROSS appends — membership
    // (what the anti-join probe consumes) must match the batch build
    assertSameRows(spark.table(streamed).select("h").distinct(),
      spark.table(batchBuilt))
    // and the exact-dedup probe agrees: delta docs surviving the
    // anti-join are identical against either index
    val delta = docs.where(col("doc_id") % 4 === 0)
      .withColumn("h", sha2(col("text"), 256))
    assertSameRows(
      delta.join(spark.table(streamed), Seq("h"), "left_anti").select("doc_id"),
      delta.join(spark.table(batchBuilt), Seq("h"), "left_anti").select("doc_id"))
  }

  test("streaming postings-index maintenance: read-derived df-capped rows == batch build; replay idempotent") {
    import graft.llm.{Dedup, Incremental}
    val docs = Tables.documents(spark, dir)
    val day1 = docs.where(col("doc_id") % 4 =!= 0)
    val initial = day1.where(pmod(col("doc_id"), lit(2)) === 1)
    val arriving = day1.where(pmod(col("doc_id"), lit(2)) === 0)
    val streamed = "ngidx_streamed_test"
    Tables.dropStaleTables(spark, streamed)
    // raw UNPRUNED posting rows — the cap is a read-time decision
    Dedup.trigrams(initial)
      .select(col("ng"), col("doc_id").as("idx_id"), lit(-1L).as("epoch"))
      .write.partitionBy("epoch")
      .bucketBy(16, "ng").sortBy("ng").format("parquet").saveAsTable(streamed)
    val inDir = Files.createTempDirectory("graft_ngidx_in").toString
    arriving.select("doc_id", "text").write.mode("append").json(inDir)
    val ckpt = Files.createTempDirectory("graft_ckpt_ngidx").toString
    Incremental.maintainPostingsIndex(
      spark.readStream.schema("doc_id LONG, text STRING").json(inDir),
      streamed, ckpt).awaitTermination()
    // the read-derived (ng, idx_id, nb) rows must equal the batch-built
    // jaccardIndex on the same day-1 docs — including shingles whose df
    // crossed the cap only once BOTH halves were in the store (a
    // pre-pruned store would keep them and re-derive stale nb)
    val batchTable = Incremental.jaccardIndex(spark, dir)
    assertSameRows(Incremental.prunedPostings(spark, streamed),
      spark.table(batchTable).select("ng", "idx_id", "nb"))
    // replay idempotency: re-running the maintainer over the same input
    // with a FRESH checkpoint re-lands the same epoch ids; the dynamic
    // partition overwrite must leave the store byte-identical
    val before = Incremental.prunedPostings(spark, streamed)
      .orderBy("idx_id", "ng").collect().toSeq
    val ckpt2 = Files.createTempDirectory("graft_ckpt_ngidx2").toString
    Incremental.maintainPostingsIndex(
      spark.readStream.schema("doc_id LONG, text STRING").json(inDir),
      streamed, ckpt2).awaitTermination()
    // reader contract (epochInsert note): the replay REPLACED part
    // files; this session's cached file index must be refreshed
    spark.catalog.refreshTable(streamed)
    val after = Incremental.prunedPostings(spark, streamed)
      .orderBy("idx_id", "ng").collect().toSeq
    assert(before == after, "replayed epochs changed the maintained store")
  }

  test("streaming chunk-index maintenance: read-derived df-capped rows == batch editChunkIndex") {
    import graft.llm.Incremental
    // round 8: the edit-dedup chunk store joins the maintainer family —
    // half of day 1 is bulk-built, the rest arrives as a stream; the
    // read-side capped view must equal the write-once pre-pruned build
    // on the same docs (same equality contract as the postings store)
    val day1 = Tables.documents(spark, dir).where(col("doc_id") % 4 =!= 0)
    val initial = day1.where(pmod(col("doc_id"), lit(2)) === 1)
    val arriving = day1.where(pmod(col("doc_id"), lit(2)) === 0)
    val streamed = "eckidx_streamed_test"
    Tables.dropStaleTables(spark, streamed)
    Incremental.buildChunkIndex(initial, streamed)
    val inDir = Files.createTempDirectory("graft_eckidx_in").toString
    arriving.select("doc_id", "text").write.mode("append").json(inDir)
    val ckpt = Files.createTempDirectory("graft_ckpt_eckidx").toString
    Incremental.maintainChunkIndex(
      spark.readStream.schema("doc_id LONG, text STRING").json(inDir),
      streamed, ckpt).awaitTermination()
    val batchTable = Incremental.editChunkIndex(spark, dir)
    assertSameRows(Incremental.prunedChunks(spark, streamed),
      spark.table(batchTable).select("g1", "g2", "idx_id", "ln"))
    // replay idempotency (the shared epochInsert contract): a fresh
    // checkpoint re-lands the same epoch ids; dynamic partition
    // overwrite must leave the store identical
    val before = Incremental.prunedChunks(spark, streamed)
      .orderBy("idx_id", "g1", "g2").collect().toSeq
    val ckpt2 = Files.createTempDirectory("graft_ckpt_eckidx2").toString
    Incremental.maintainChunkIndex(
      spark.readStream.schema("doc_id LONG, text STRING").json(inDir),
      streamed, ckpt2).awaitTermination()
    spark.catalog.refreshTable(streamed)
    val after = Incremental.prunedChunks(spark, streamed)
      .orderBy("idx_id", "g1", "g2").collect().toSeq
    assert(before == after, "replayed epochs changed the maintained chunk store")
  }

  test("streaming BQ codes maintenance: maintained store == batch encode; replay idempotent") {
    import graft.llm.Quantize
    // sign codes are deterministic, so maintained == batch is an exact
    // row-set equality (no codebook involved)
    val emb = Tables.embeddings(spark, dir)
    val initial = emb.where(pmod(col("vec_id"), lit(2)) === 1)
    val arriving = emb.where(pmod(col("vec_id"), lit(2)) === 0)
    val streamed = "bq_streamed_test"
    Tables.dropStaleTables(spark, streamed)
    Quantize.buildBqCodeStore(initial, streamed)
    val inDir = Files.createTempDirectory("graft_bqidx_in").toString
    arriving.select(col("vec_id"),
        col("embedding").cast("array<double>").as("embedding"))
      .write.mode("append").json(inDir)
    val ckpt = Files.createTempDirectory("graft_ckpt_bqidx").toString
    Quantize.maintainBqCodes(
      spark.readStream.schema("vec_id LONG, embedding ARRAY<DOUBLE>").json(inDir),
      streamed, ckpt).awaitTermination()
    // maintained rows == the deterministic batch encode of everything
    val batch = SparkEntry.queries("embed_bq")(spark, dir)
      .select(col("vec_id").as("idx_id"), col("code_lo").as("lo"),
        col("code_hi").as("hi"))
    assertSameRows(spark.table(streamed).select("idx_id", "lo", "hi"), batch)
    // replay idempotency via the shared epoch-partition contract
    val before = spark.table(streamed).select("idx_id", "lo", "hi")
      .orderBy("idx_id").collect().toSeq
    val ckpt2 = Files.createTempDirectory("graft_ckpt_bqidx2").toString
    Quantize.maintainBqCodes(
      spark.readStream.schema("vec_id LONG, embedding ARRAY<DOUBLE>").json(inDir),
      streamed, ckpt2).awaitTermination()
    spark.catalog.refreshTable(streamed)
    val after = spark.table(streamed).select("idx_id", "lo", "hi")
      .orderBy("idx_id").collect().toSeq
    assert(before == after, "replayed epochs changed the maintained BQ store")
  }

  test("streaming lexicon maintenance: summed epoch partials == batch df/stats; replay idempotent") {
    import graft.llm.Retrieval
    // the BM25 lexicon is ADDITIVE: each epoch lands PARTIAL (term, df)
    // counts and one (n, sdl) stats row; the read-side SUM must equal
    // the batch build over all docs — exact longs, so equality is exact
    val day1 = Tables.documents(spark, dir).where(col("doc_id") % 4 =!= 0)
    val initial = day1.where(pmod(col("doc_id"), lit(2)) === 1)
    val arriving = day1.where(pmod(col("doc_id"), lit(2)) === 0)
    val lexT = "bm25_lex_streamed_test"
    val statT = "bm25_stat_streamed_test"
    Tables.dropStaleTables(spark, lexT)
    Tables.dropStaleTables(spark, statT)
    Retrieval.buildLexTerms(initial, lexT)
    Retrieval.buildLexStats(initial, statT)
    val inDir = Files.createTempDirectory("graft_lexidx_in").toString
    arriving.select("doc_id", "text").write.mode("append").json(inDir)
    val ckpt = Files.createTempDirectory("graft_ckpt_lexidx").toString
    Retrieval.maintainLexicon(
      spark.readStream.schema("doc_id LONG, text STRING").json(inDir),
      lexT, statT, ckpt).awaitTermination()
    // summed partials == one batch pass over ALL of day-1
    val batchDf = day1
      .select(explode(array_distinct(split(col("text"), " "))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("df"))
    assertSameRows(
      spark.table(lexT).groupBy("term").agg(sum(col("df")).as("df")),
      batchDf)
    val batchStats = day1
      .select(size(split(col("text"), " ")).cast("long").as("dl"))
      .agg(count(lit(1)).as("n"), sum(col("dl")).as("sdl"))
    assertSameRows(
      spark.table(statT).agg(sum(col("n")).as("n"), sum(col("sdl")).as("sdl")),
      batchStats)
    // replay idempotency via the shared epoch-partition contract
    val before = spark.table(lexT).groupBy("term").agg(sum(col("df")).as("df"))
      .orderBy("term").collect().toSeq
    val ckpt2 = Files.createTempDirectory("graft_ckpt_lexidx2").toString
    Retrieval.maintainLexicon(
      spark.readStream.schema("doc_id LONG, text STRING").json(inDir),
      lexT, statT, ckpt2).awaitTermination()
    spark.catalog.refreshTable(lexT)
    spark.catalog.refreshTable(statT)
    val after = spark.table(lexT).groupBy("term").agg(sum(col("df")).as("df"))
      .orderBy("term").collect().toSeq
    assert(before == after, "replayed epochs changed the maintained lexicon")
  }

  test("stream_bm25_route: streamed relevance routing == batch twin") {
    import graft.llm.Retrieval
    // the router is stateless (map + broadcast stats join + filter), so
    // it streams in append mode; the stats side is STATIC (the day-1
    // lexicon artifacts) — the stream-static broadcast join shape
    val stats = Retrieval.dayStats(spark, dir)
    val delta = Tables.documents(spark, dir).where(col("doc_id") % 4 === 0)
    val inDir = Files.createTempDirectory("graft_bm25route_in").toString
    delta.select("doc_id", "text").write.mode("append").json(inDir)
    val ckpt = Files.createTempDirectory("graft_ckpt_bm25route").toString
    val q = Retrieval.bm25Route(
        spark.readStream.schema("doc_id LONG, text STRING").json(inDir), stats)
      .writeStream.outputMode("append")
      .format("memory").queryName("bm25_route_stream")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = spark.table("bm25_route_stream")
      .orderBy("doc_id").collect().toSeq
    val batch = SparkEntry.queries("stream_bm25_route")(spark, dir)
      .collect().toSeq
    assert(batch.nonEmpty, "no docs cleared the routing threshold")
    assert(streamed == batch,
      s"stream (${streamed.size}) != batch (${batch.size})")
  }

  test("streaming PQ codes maintenance: maintained codes == batch-encoded; drift trigger") {
    import graft.llm.Quantize
    val emb = Tables.embeddings(spark, dir)
    val book = Quantize.codebook(spark, dir)
    // half the corpus is encoded up front; the rest arrives as a stream
    val initial = emb.where(pmod(col("vec_id"), lit(2)) === 1)
    val arriving = emb.where(pmod(col("vec_id"), lit(2)) === 0)
    val streamed = Files.createTempDirectory("graft_pq_streamed").toString + "/codes"
    val batchBuilt = Files.createTempDirectory("graft_pq_batch").toString + "/codes"
    Quantize.buildPqCodes(initial, streamed, book, "batch_init")
    val inDir = Files.createTempDirectory("graft_pqidx_in").toString
    arriving.select(col("vec_id"),
        col("embedding").cast("array<double>").as("embedding"))
      .write.mode("append").json(inDir)
    val ckpt = Files.createTempDirectory("graft_ckpt_pqidx").toString
    val q = Quantize.maintainPqCodes(
      spark.readStream.schema("vec_id LONG, embedding ARRAY<DOUBLE>").json(inDir),
      streamed, book, ckpt)
    q.awaitTermination()
    // delta encode against the frozen book must reproduce the artifact
    // batch-encoded over the full corpus with the same book
    Quantize.buildPqCodes(emb, batchBuilt, book, "batch_init")
    assertSameRows(Quantize.readCodes(spark, streamed), Quantize.readCodes(spark, batchBuilt))
    // healthy book on its own corpus — appends alone must not trip
    // re-train (fidelity == the deploy-time baseline by construction)
    val baseline = Quantize.bookFidelity(spark, dir, book)
    assert(!Quantize.pqRetrainDue(emb, book, baseline),
      "retrain tripped on a book matching its training distribution")
    // a corpus that drifted away from the frozen book is flagged: a
    // mean shift moves the cloud off the trained centroids entirely —
    // the classic distribution drift a frozen quantizer cannot cover
    val driftedCorpus = emb.select(col("vec_id"),
      transform(col("embedding").cast("array<double>"),
        x => x + lit(2.0)).as("embedding"))
    assert(Quantize.pqRetrainDue(driftedCorpus, book, baseline),
      "retrain not flagged for a corpus that drifted off the book")
  }

  test("rate source produces the canonical message shape") {
    val rate = graft.streaming.MessageSource.rateStream(spark, 100)
    assert(rate.isStreaming)
    assert(rate.schema.fieldNames.toSeq ===
      Seq("event_id", "ts", "user_id", "event_type", "value", "props"))
    val ckpt = Files.createTempDirectory("graft_ckpt_rate").toString
    val q = rate.writeStream.outputMode("append").format("memory")
      .queryName("rate_probe").option("checkpointLocation", ckpt)
      .trigger(Trigger.ProcessingTime("200 milliseconds")).start()
    try {
      q.processAllAvailable()
      Thread.sleep(1500)
      q.processAllAvailable()
      val rows = spark.table("rate_probe")
      assert(rows.count() > 0, "rate source emitted no rows")
      // the props bag must be selector-compatible JSON
      assert(rows.where(get_json_object(col("props"), "$.k").isNull).count() === 0)
    } finally q.stop()
  }

  test("checkpoint recovery: restart resumes offsets, restores state, and a replayed epoch lands idempotently") {
    // THE production streaming property (VERDICT r06 missing 1): a query
    // killed mid-stream must, on restart from its checkpoint, (a) not
    // re-read already-committed input, (b) restore aggregation state,
    // and (c) re-emit an uncommitted epoch without duplicating sink
    // effects. Forced deterministically: phase 1 runs to completion,
    // then the newest entry in the checkpoint's commit log is deleted —
    // exactly the on-disk state after a crash between sink write and
    // commit — so the restarted query MUST replay that epoch (same
    // batch id, same offset range) before processing phase 2.
    val streamDir = Files.createTempDirectory("graft_recover_in")
    val outDir = Files.createTempDirectory("graft_recover_out").toString
    val ckpt = Files.createTempDirectory("graft_ckpt_recover").toString
    val ev = Tables.events(spark, dir)
    def land(name: String, half: DataFrame): Unit = {
      val tmp = Files.createTempDirectory(s"graft_recover_stage_$name")
      half.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = java.nio.file.Files.list(tmp).toArray.map(_.toString)
        .filter(_.endsWith(".parquet")).head
      Files.copy(java.nio.file.Paths.get(part), streamDir.resolve(s"$name.parquet"))
    }
    val seenEpochs = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    def runOnce(): Unit = {
      // stateful per-type running counts (update mode — state carries
      // across epochs and restarts); the sink writes each epoch to its
      // own batch=<id> dir with OVERWRITE, the idempotent-replay recipe
      val counts = MessageSource.fileStream(spark, streamDir.toString)
        .groupBy("event_type").agg(count(lit(1)).as("n"))
      val q = counts.writeStream.outputMode("update")
        .foreachBatch { (batch: DataFrame, id: Long) =>
          seenEpochs.add(id)
          batch.coalesce(1).write.mode("overwrite").parquet(s"$outDir/batch=$id")
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      // termination deregisters the checkpoint dir asynchronously; the
      // restart must wait or it sees "multiple queries using <ckpt>"
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (spark.streams.active.exists(_.id == q.id) &&
        System.nanoTime() < deadline) Thread.sleep(50)
    }
    land("p1", ev.where(col("event_id") % 2 === 0))
    runOnce()
    val committed = java.nio.file.Paths.get(ckpt, "commits")
    val latest = java.nio.file.Files.list(committed).toArray.map(_.toString)
      .filter(_.split("/").last.forall(_.isDigit))
      .maxBy(_.split("/").last.toLong)
    java.nio.file.Files.delete(java.nio.file.Paths.get(latest))
    // the local FS keeps a checksum sidecar; a stale one makes the
    // replayed commit write look like a concurrent writer
    val crc = committed.resolve("." + latest.split("/").last + ".crc")
    java.nio.file.Files.deleteIfExists(crc)
    land("p2", ev.where(col("event_id") % 2 =!= 0))
    runOnce()
    // the uncommitted epoch really was replayed: its id appears twice
    val ids = seenEpochs.toArray(Array.empty[java.lang.Long]).map(_.toLong).toSeq
    assert(ids.count(_ == ids.head) === 2,
      s"expected epoch ${ids.head} to replay after commit-log truncation, saw $ids")
    // final state: per type, the value from the LAST epoch that updated
    // it must equal the batch counts over phase 1 ∪ phase 2 — proves
    // state restored (phase-1 rows counted exactly once, file never
    // re-listed as new input) and the replayed epoch overwrote, not
    // duplicated, its sink effect
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy(col("batch").desc)
    val finalCounts = spark.read.parquet(outDir)
      .withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .select("event_type", "n")
    assertSameRows(finalCounts,
      ev.groupBy("event_type").agg(count(lit(1)).as("n")))
  }

  test("index maintainer restart-safety: replayed epoch does not double-apply to the persisted band store") {
    // the maintainer twin of the checkpoint-recovery test (VERDICT r06
    // item 7): kill/resume semantics forced by commit-log truncation;
    // the epoch-partitioned dynamic overwrite must land the replayed
    // micro-batch exactly once in the index
    import graft.llm.Incremental
    val docs = Tables.documents(spark, dir)
    val day1 = docs.where(col("doc_id") % 4 =!= 0)
    val initial = day1.where(pmod(col("doc_id"), lit(2)) === 1)
    val arriving = day1.where(pmod(col("doc_id"), lit(2)) === 0)
    val (p1, p2) = (arriving.where(col("doc_id") % 3 === 0),
      arriving.where(col("doc_id") % 3 =!= 0))
    val maintained = "shidx_restart_test"
    val batchBuilt = "shidx_restart_batch"
    Tables.dropStaleTables(spark, maintained)
    Tables.dropStaleTables(spark, batchBuilt)
    Incremental.buildSimhashIndex(initial, maintained)
    val inDir = Files.createTempDirectory("graft_shidx_restart_in").toString
    val ckpt = Files.createTempDirectory("graft_ckpt_shidx_restart").toString
    def runOnce(): Unit = {
      val q = Incremental.maintainSimhashIndex(
        spark.readStream.schema("doc_id LONG, text STRING").json(inDir),
        maintained, ckpt)
      q.awaitTermination()
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (spark.streams.active.exists(_.id == q.id) &&
        System.nanoTime() < deadline) Thread.sleep(50)
    }
    p1.select("doc_id", "text").write.mode("append").json(inDir)
    runOnce()
    // crash window: the epoch's index write committed, the checkpoint
    // commit did not — restart must replay it
    val commits = java.nio.file.Paths.get(ckpt, "commits")
    val latest = java.nio.file.Files.list(commits).toArray.map(_.toString)
      .filter(_.split("/").last.forall(_.isDigit))
      .maxBy(_.split("/").last.toLong)
    java.nio.file.Files.delete(java.nio.file.Paths.get(latest))
    java.nio.file.Files.deleteIfExists(
      commits.resolve("." + latest.split("/").last + ".crc"))
    p2.select("doc_id", "text").write.mode("append").json(inDir)
    runOnce()
    // exactly-once content: the maintained index == batch-built over
    // everything, with NO duplicate rows from the replayed epoch
    Incremental.buildSimhashIndex(day1, batchBuilt)
    val content = Seq("band_id", "band_val", "idx_id", "h").map(col)
    assertSameRows(spark.table(maintained).select(content: _*),
      spark.table(batchBuilt).select(content: _*))
    assert(spark.table(maintained).count() ===
      spark.table(maintained).select(content: _*).distinct().count(),
      "replayed epoch double-applied: duplicate index rows")
    // and the probe over the maintained index agrees with batch-built
    assertSameRows(
      Incremental.simhashProbe(spark, dir, maintained),
      Incremental.simhashProbe(spark, dir, batchBuilt))
  }

  test("PQ codes maintainer restart-safety: replayed epoch overwrites its batch dir, codes stay exact") {
    // same kill/resume recipe as the band-store test, applied to the
    // one maintainer whose consumer (a top-k scan) is NOT duplicate-
    // tolerant: a double-applied epoch would double-count its vectors
    // in every ADC scan. batch_<id> overwrite must make the replay a
    // byte-identical rewrite.
    import graft.llm.Quantize
    val emb = Tables.embeddings(spark, dir)
    val book = Quantize.codebook(spark, dir)
    val initial = emb.where(pmod(col("vec_id"), lit(2)) === 1)
    val arriving = emb.where(pmod(col("vec_id"), lit(2)) === 0)
    val (p1, p2) = (arriving.where(col("vec_id") % 3 === 0),
      arriving.where(col("vec_id") % 3 =!= 0))
    val streamed = Files.createTempDirectory("graft_pq_restart").toString + "/codes"
    val batchBuilt = Files.createTempDirectory("graft_pq_restart_b").toString + "/codes"
    Quantize.buildPqCodes(initial, streamed, book, "batch_init")
    val inDir = Files.createTempDirectory("graft_pqrst_in").toString
    val ckpt = Files.createTempDirectory("graft_ckpt_pqrst").toString
    def push(df: DataFrame): Unit =
      df.select(col("vec_id"),
          col("embedding").cast("array<double>").as("embedding"))
        .write.mode("append").json(inDir)
    def runOnce(): Unit = {
      val q = Quantize.maintainPqCodes(
        spark.readStream.schema("vec_id LONG, embedding ARRAY<DOUBLE>").json(inDir),
        streamed, book, ckpt)
      q.awaitTermination()
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (spark.streams.active.exists(_.id == q.id) &&
        System.nanoTime() < deadline) Thread.sleep(50)
    }
    push(p1)
    runOnce()
    // crash window: epoch data committed, checkpoint commit truncated
    val commits = java.nio.file.Paths.get(ckpt, "commits")
    val latest = java.nio.file.Files.list(commits).toArray.map(_.toString)
      .filter(_.split("/").last.forall(_.isDigit))
      .maxBy(_.split("/").last.toLong)
    java.nio.file.Files.delete(java.nio.file.Paths.get(latest))
    java.nio.file.Files.deleteIfExists(
      commits.resolve("." + latest.split("/").last + ".crc"))
    push(p2)
    runOnce()
    // exactly-once content: maintained artifact == batch encode of the
    // union, one code row per vector (no replay duplicates)
    Quantize.buildPqCodes(emb, batchBuilt, book, "batch_init")
    assertSameRows(Quantize.readCodes(spark, streamed),
      Quantize.readCodes(spark, batchBuilt))
    assert(Quantize.readCodes(spark, streamed).count() ===
      Quantize.readCodes(spark, streamed).select("vec_id").distinct().count(),
      "replayed epoch double-applied: duplicate code rows")
  }

  // completes the restart-safety family for the third state shape:
  // windowed agg (checkpoint-recovery test), persisted index
  // (maintainer tests), and here flatMapGroupsWithState keyed state.
  // Recipe: drain part 1 across multiple micro-batches, truncate the
  // newest commit (state store checkpoint for that epoch survives,
  // the commit record does not — the crash window), add part 2,
  // resume from the same checkpoint. The restarted query must replay
  // the uncommitted epoch against the REWOUND state version, so the
  // final per-key state equals the batch fold over everything —
  // update-mode emissions may duplicate (allowed), state may not.
  private def cdcRestartScenario(): Unit = {
    import org.apache.spark.sql.streaming.Trigger
    val ev = Tables.events(spark, dir)
    val cols = Seq("event_id", "ts", "user_id", "event_type", "value")
    val p1 = ev.where(col("event_id") % 3 =!= 0)
    val p2 = ev.where(col("event_id") % 3 === 0)
    val inDir = Files.createTempDirectory("graft_cdc_rst_in").toString
    val ckpt = Files.createTempDirectory("graft_ckpt_cdc_rst").toString
    val outDir = Files.createTempDirectory("graft_cdc_rst_out").toString
    def runOnce(): Unit = {
      // memory sinks cannot recover from a checkpoint; the epoch-dir
      // foreachBatch sink (each epoch OVERWRITES its own batch=<id>
      // dir — the idempotent-replay recipe of the checkpoint-recovery
      // test) both recovers and makes the replayed epoch visible
      val q = Pipeline.cdcLatestStream(Pipeline.cdcChanges(
          spark.readStream
            .schema("event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE")
            .option("maxFilesPerTrigger", "1").json(inDir)))
        .writeStream.outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, id: Long) =>
          batch.write.mode("overwrite").parquet(s"$outDir/batch=$id")
          ()
        }.start()
      q.awaitTermination()
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (spark.streams.active.exists(_.id == q.id) &&
        System.nanoTime() < deadline) Thread.sleep(50)
    }
    p1.select(cols.map(col): _*).repartition(3).write.mode("append").json(inDir)
    runOnce()
    val commits = java.nio.file.Paths.get(ckpt, "commits")
    val latest = java.nio.file.Files.list(commits).toArray.map(_.toString)
      .filter(_.split("/").last.forall(_.isDigit))
      .maxBy(_.split("/").last.toLong)
    java.nio.file.Files.delete(java.nio.file.Paths.get(latest))
    java.nio.file.Files.deleteIfExists(
      commits.resolve("." + latest.split("/").last + ".crc"))
    p2.select(cols.map(col): _*).repartition(2).write.mode("append").json(inDir)
    runOnce()
    // final state per key across ALL epoch emissions == batch fold
    val emitted = spark.read
      .option("recursiveFileLookup", "true").parquet(outDir)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("user_id")
      .orderBy(col("last_t").desc, col("event_id").desc)
    val finalState = emitted.withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select("user_id", "op", "last_value", "last_t")
    assertSameRows(finalState, Pipeline.cdcLatestBatch(ev))
  }

  test("keyed-state restart: CDC state survives checkpoint resume; replayed epoch cannot corrupt it") {
    cdcRestartScenario()
  }

  test("keyed-state restart under RocksDB: same recovery contract on the production state store") {
    // the provider a real cluster runs — state snapshots + changelog
    // live in RocksDB files; the truncated-commit replay must restore
    // the same rewound state version there too
    val conf = "spark.sql.streaming.stateStore.providerClass"
    val before = spark.conf.getOption(conf)
    spark.conf.set(conf, GraftSession.rocksDBProvider)
    try cdcRestartScenario()
    finally before match {
      case Some(v) => spark.conf.set(conf, v)
      case None => spark.conf.unset(conf)
    }
  }

  test("transformWithState: multi-batch profile accumulation == batch twin; restart-safe") {
    import graft.streaming.StateV2
    // the state-v2 API REQUIRES the RocksDB provider
    val conf = "spark.sql.streaming.stateStore.providerClass"
    val before = spark.conf.getOption(conf)
    spark.conf.set(conf, GraftSession.rocksDBProvider)
    try {
      // two input files + maxFilesPerTrigger=1 → the profile builds
      // across ≥ 2 micro-batches, so ValueState genuinely carries
      val ev = Tables.events(spark, dir)
        .select("event_id", "user_id", "value")
      val inDir = Files.createTempDirectory("graft_twstate_in").toString
      // two appends → multiple part files; maxFilesPerTrigger=1 splits
      // them into separate micro-batches
      ev.where(col("event_id") % 2 === 0).coalesce(1)
        .write.mode("append").json(inDir)
      ev.where(col("event_id") % 2 === 1).coalesce(1)
        .write.mode("append").json(inDir)
      val ckpt = Files.createTempDirectory("graft_ckpt_twstate").toString
      val outDir = Files.createTempDirectory("graft_twstate_out").toString
      // epoch-dir foreachBatch recipe: memory sinks cannot recover
      // from a checkpoint; per-epoch overwrite keeps replays idempotent
      def run(): Unit = {
        val q = StateV2.profileStream(
            spark.readStream.schema("user_id LONG, value DOUBLE")
              .option("maxFilesPerTrigger", 1).json(inDir))
          .writeStream.outputMode("update")
          .foreachBatch {
            (b: org.apache.spark.sql.Dataset[graft.streaming.UserProfile],
             id: Long) =>
              b.write.mode("overwrite").parquet(s"$outDir/batch=$id"); ()
          }
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
      run()
      // Update mode emits one refreshed row per key per batch — the
      // final profile per user is the row with max n_events (the count
      // is monotone); it must equal the batch twin exactly
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("n_events").desc)
      def finalRows() = spark.read.parquet(s"$outDir/batch=*")
        .withColumn("rk", row_number().over(w)).where(col("rk") === 1)
        .select("user_id", "n_events", "max_value")
      val twin = SparkEntry.queries("stream_state_profile")(spark, dir)
      assertSameRows(finalRows(), twin)
      // restart recovery: truncate the newest commit and rerun — the
      // replayed epoch must restore the same rewound ValueState and
      // re-emit identical rows (the shared truncated-commit recipe)
      val commits = new java.io.File(s"$ckpt/commits").listFiles()
        .filter(_.getName.forall(_.isDigit)).sortBy(_.getName.toInt)
      val crc = new java.io.File(s"$ckpt/commits/.${commits.last.getName}.crc")
      commits.last.delete()
      if (crc.exists()) crc.delete()
      run()
      assertSameRows(finalRows(), twin)
    } finally before match {
      case Some(v) => spark.conf.set(conf, v)
      case None => spark.conf.unset(conf)
    }
  }

  test("transformWithState event-time timers: idle key evicted by handleExpiredTimer; stream == batch twin") {
    import graft.streaming.StateV2
    val conf = "spark.sql.streaming.stateStore.providerClass"
    val before = spark.conf.getOption(conf)
    spark.conf.set(conf, GraftSession.rocksDBProvider)
    try {
      // VERDICT r08 item 3 — the session-timeout shape timers exist
      // for. Crafted corpus, one file per micro-batch (gap = 600 s,
      // watermark delay = 600 s):
      //   f1: user 1 @10:00,10:05 (the IDLE key — never seen again, so
      //       only a firing timer can close it); user 2 @10:00
      //   f2: user 2 @10:30 — user 2's own 30 m gap closes its first
      //       session by DATA inside handleInputRows
      //   f3: user 9 @11:30 — during this batch the watermark (from
      //       f2) is 10:20 > user 1's timer at 10:05+10 m → EVICTED
      //   f4: user 9 @11:35 — watermark (from f3) 11:20 > user 2's
      //       re-armed timer at 10:40 → its second session evicted;
      //       user 9 stays open (timer 11:45 > final watermark)
      def t(hhmm: String) = Timestamp.valueOf(s"2024-01-01 $hhmm:00")
      def mkEvents(rows: Seq[(Long, Timestamp, Long)]) =
        spark.createDataFrame(rows.map { case (id, ts, uid) =>
          (id, ts, uid, "browse", 1.0, "{}") })
          .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      val streamDir = Files.createTempDirectory("graft_stream_sess_to")
      def land(name: String, mtime: Long,
          rows: Seq[(Long, Timestamp, Long)]): Unit = {
        val tmp = Files.createTempDirectory(s"graft_sess_to_$name").toString
        mkEvents(rows).coalesce(1).write.mode("overwrite").parquet(tmp)
        val part = new java.io.File(tmp).listFiles()
          .filter(_.getName.endsWith(".parquet")).head
        val dst = streamDir.resolve(s"$name.parquet")
        Files.move(part.toPath, dst)
        dst.toFile.setLastModified(mtime)
        ()
      }
      val t0 = System.currentTimeMillis() - 60000
      land("f1", t0, Seq((1L, t("10:00"), 1L), (2L, t("10:05"), 1L),
        (3L, t("10:00"), 2L)))
      land("f2", t0 + 10000, Seq((4L, t("10:30"), 2L)))
      land("f3", t0 + 20000, Seq((5L, t("11:30"), 9L)))
      land("f4", t0 + 30000, Seq((6L, t("11:35"), 9L)))
      val ckpt = Files.createTempDirectory("graft_ckpt_sess_to").toString
      val src = spark.readStream
        .schema("event_id LONG, ts TIMESTAMP, user_id LONG, " +
          "event_type STRING, value DOUBLE, props STRING")
        .option("maxFilesPerTrigger", "1").parquet(streamDir.toString)
      val q = StateV2.sessionStream(src, gapSec = 600L)
        .writeStream.outputMode("append")
        .format("memory").queryName("sess_timeout")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val got = spark.table("sess_timeout")
      // the idle key's closure is in the output — user 1 has NO event
      // after 10:05 anywhere in the corpus, so no handleInputRows call
      // can have emitted this row; only the event-time timer did
      val idle = got.where(col("user_id") === 1).collect()
      assert(idle.length === 1, "idle key must be evicted exactly once")
      assert(idle.head.getLong(3) === 2L, "eviction carries the full session")
      // stream == the oracle-checked batch twin over the same corpus
      val all = mkEvents(Seq((1L, t("10:00"), 1L), (2L, t("10:05"), 1L),
        (3L, t("10:00"), 2L), (4L, t("10:30"), 2L),
        (5L, t("11:30"), 9L), (6L, t("11:35"), 9L)))
      assertSameRows(got.select("user_id", "sess_start", "sess_end", "n_events"),
        Pipeline.sessionTimeoutBatch(all, 600L))
    } finally before match {
      case Some(v) => spark.conf.set(conf, v)
      case None => spark.conf.unset(conf)
    }
  }

  test("session-timeout boundary: end + gap + delay == max ts closes on BOTH sides (non-strict), one second short stays open") {
    import graft.streaming.StateV2
    val conf = "spark.sql.streaming.stateStore.providerClass"
    val before = spark.conf.getOption(conf)
    spark.conf.set(conf, GraftSession.rocksDBProvider)
    try {
      // ADVICE r09 — pin the <=/< boundary. gap = delay = 600 s.
      // Spark's timer expiry is NON-STRICT (timer_ts <= watermark
      // fires — TimerStateImpl's expired-timer iterator), so the batch
      // twin's non-strict `end + gap + delay <= max_s` is the matching
      // gate; this fixture makes equality reachable on both sides:
      //   user 1 @10:00      → timer 10:10; final watermark
      //                        = 10:20 − 10 m = 10:10 EXACTLY → fires
      //                        (batch: 10:00 + 1200 ≤ 10:20 ✓)
      //   user 3 @10:00:01   → timer 10:10:01 > 10:10 → stays open
      //                        (batch: 10:20:01 > 10:20 ✗) — one
      //                        second past the boundary, both sides
      //   user 2 @10:20      → the max-ts key, its own timer 10:30
      //                        > 10:10 → stays open
      // The equality firing happens in the final NO-DATA micro-batch
      // (AvailableNow runs one when the watermark advances), which is
      // exactly the "final watermark" the batch twin gates on.
      def t(hhmmss: String) = Timestamp.valueOf(s"2024-01-01 $hhmmss")
      def mkEvents(rows: Seq[(Long, Timestamp, Long)]) =
        spark.createDataFrame(rows.map { case (id, ts, uid) =>
          (id, ts, uid, "browse", 1.0, "{}") })
          .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      val streamDir = Files.createTempDirectory("graft_stream_sess_bnd")
      def land(name: String, mtime: Long,
          rows: Seq[(Long, Timestamp, Long)]): Unit = {
        val tmp = Files.createTempDirectory(s"graft_sess_bnd_$name").toString
        mkEvents(rows).coalesce(1).write.mode("overwrite").parquet(tmp)
        val part = new java.io.File(tmp).listFiles()
          .filter(_.getName.endsWith(".parquet")).head
        val dst = streamDir.resolve(s"$name.parquet")
        Files.move(part.toPath, dst)
        dst.toFile.setLastModified(mtime)
        ()
      }
      val t0 = System.currentTimeMillis() - 60000
      land("f1", t0, Seq((1L, t("10:00:00"), 1L), (2L, t("10:00:01"), 3L)))
      land("f2", t0 + 10000, Seq((3L, t("10:20:00"), 2L)))
      val ckpt = Files.createTempDirectory("graft_ckpt_sess_bnd").toString
      val src = spark.readStream
        .schema("event_id LONG, ts TIMESTAMP, user_id LONG, " +
          "event_type STRING, value DOUBLE, props STRING")
        .option("maxFilesPerTrigger", "1").parquet(streamDir.toString)
      val q = StateV2.sessionStream(src, gapSec = 600L)
        .writeStream.outputMode("append")
        .format("memory").queryName("sess_boundary")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val got = spark.table("sess_boundary")
      val users = got.select("user_id").collect().map(_.getLong(0)).sorted
      assert(users.toSeq === Seq(1L),
        s"exactly the boundary-equality key must close, got ${users.toSeq}")
      val all = mkEvents(Seq((1L, t("10:00:00"), 1L),
        (2L, t("10:00:01"), 3L), (3L, t("10:20:00"), 2L)))
      assertSameRows(got.select("user_id", "sess_start", "sess_end", "n_events"),
        Pipeline.sessionTimeoutBatch(all, 600L))
    } finally before match {
      case Some(v) => spark.conf.set(conf, v)
      case None => spark.conf.unset(conf)
    }
  }

  test("transformWithState TTL: idle state expires and the count restarts; TTL-less twin accumulates") {
    import graft.streaming.StateV2
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val conf = "spark.sql.streaming.stateStore.providerClass"
    val before = spark.conf.getOption(conf)
    spark.conf.set(conf, GraftSession.rocksDBProvider)
    try {
      // two AvailableNow runs over the SAME checkpoint separated by a
      // sleep > TTL: run 2's batch timestamp is past the run-1 write's
      // expiry, so the TTL'd ValueState reads empty (count restarts at
      // 1) while the TTL-less control resumes its carried state (count
      // reaches 2). Proves TTLConfig expiry actually runs, not just
      // parses (VERDICT r08 item 3's honesty gap). NOT processAll-
      // Available on a long-lived query: ProcessingTime-mode
      // transformWithState runs no-data batches continuously for
      // eviction, so noNewData never latches and the wait never
      // returns (observed: 4 900 commits in 15 min) — and the same
      // eviction loop keeps an AvailableNow run alive indefinitely,
      // so no-data micro-batches are disabled for this test: TTL is
      // enforced on state READ (an expired value reads as absent), so
      // eviction batches are not needed to observe expiry.
      val ndConf = "spark.sql.streaming.noDataMicroBatches.enabled"
      spark.conf.set(ndConf, "false")
      def run(name: String, ttl: Option[java.time.Duration]): Long = {
        val inDir = Files.createTempDirectory(s"graft_ttl_in_$name").toString
        val ckpt = Files.createTempDirectory(s"graft_ckpt_$name").toString
        val outDir = Files.createTempDirectory(s"graft_ttl_out_$name").toString
        def once(batch: Int, value: Double): Unit = {
          spark.createDataFrame(Seq((7L, value))).toDF("user_id", "value")
            .coalesce(1).write.mode("append").json(inDir)
          val src = spark.readStream.schema("user_id LONG, value DOUBLE")
            .json(inDir)
          val st = ttl match {
            case Some(d) => StateV2.ttlProfileStream(src, d)
            case None => StateV2.profileStream(src)
          }
          val q = st.writeStream.outputMode("update")
            .foreachBatch {
              (b: org.apache.spark.sql.Dataset[graft.streaming.UserProfile],
               id: Long) =>
                b.write.mode("overwrite").parquet(s"$outDir/run$batch-$id"); ()
            }
            .option("checkpointLocation", ckpt)
            .trigger(Trigger.AvailableNow()).start()
          q.awaitTermination()
        }
        once(1, 5.0)
        Thread.sleep(2500)
        once(2, 3.0)
        // the count is monotone within a state lifetime, so the final
        // profile is the max across all emitted epochs
        spark.read.parquet(s"$outDir/run*").agg(max("n_events"))
          .head.getLong(0)
      }
      try {
        assert(run("ttl_profile", Some(java.time.Duration.ofSeconds(1))) === 1L,
          "TTL'd state survived past its expiry — count did not restart")
        assert(run("nottl_profile", None) === 2L,
          "TTL-less control must accumulate across the same batches")
      } finally spark.conf.unset(ndConf)
    } finally before match {
      case Some(v) => spark.conf.set(conf, v)
      case None => spark.conf.unset(conf)
    }
  }

  test("Key_Shared ordering contract: per-key delivery order holds across micro-batches and keys never split") {
    // VERDICT r08 item 5 — the broker domain's core delivery guarantee:
    // per-key messages reach ONE consumer IN ORDER across micro-batches.
    // Publisher order is encoded in event_id (per-user monotone with
    // ts); each file holds one "publish round" and lands with a pinned
    // mtime, so FileStreamSource admits rounds in publish order and
    // maxFilesPerTrigger=1 makes each round its own micro-batch.
    def t(min: Int) = Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
    val users = Seq(1L, 2L, 3L, 4L)
    def round(k: Int) = users.map(u =>
      (u * 100 + k, t(k), u, "browse", 1.0, "{}"))
    def mk(rows: Seq[(Long, Timestamp, Long, String, Double, String)]) =
      spark.createDataFrame(rows)
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val streamDir = Files.createTempDirectory("graft_stream_ksorder")
    val t0 = System.currentTimeMillis() - 60000
    (1 to 3).foreach { k =>
      val tmp = Files.createTempDirectory(s"graft_ksorder_f$k").toString
      mk(round(k)).coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dst = streamDir.resolve(s"f$k.parquet")
      Files.move(part.toPath, dst)
      dst.toFile.setLastModified(t0 + k * 10000)
      ()
    }
    val outDir = Files.createTempDirectory("graft_ksorder_out").toString
    val ckpt = Files.createTempDirectory("graft_ckpt_ksorder").toString
    val src = spark.readStream
      .schema("event_id LONG, ts TIMESTAMP, user_id LONG, " +
        "event_type STRING, value DOUBLE, props STRING")
      .option("maxFilesPerTrigger", "1").parquet(streamDir.toString)
    val q = Pipeline.keySharedRoute(src)
      .select("event_id", "user_id", "slot", "consumer")
      .writeStream.outputMode("append")
      .foreachBatch { (b: DataFrame, id: Long) =>
        b.withColumn("batch_id", lit(id))
          .write.mode("append").parquet(outDir); ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val delivered = spark.read.parquet(outDir)
    // 1) a key NEVER splits across consumers, across all micro-batches
    assert(delivered.groupBy("user_id")
      .agg(countDistinct(col("consumer")).as("nc"))
      .where(col("nc") > 1).count() === 0, "a key split across consumers")
    // 2) per-key delivery order across micro-batches == publish order:
    //    within every slot range (per key), event_ids are strictly
    //    monotone in batch_id — batch b's max < batch b+1's min
    val perBatch = delivered.groupBy("user_id", "batch_id")
      .agg(min("event_id").as("lo"), max("event_id").as("hi"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("batch_id")
    val inversions = perBatch
      .withColumn("prev_hi", lag("hi", 1).over(w))
      .where(col("prev_hi").isNotNull && col("prev_hi") >= col("lo"))
      .count()
    assert(inversions === 0, "per-key delivery order broke across micro-batches")
    // 3) the union of all micro-batch deliveries == the batch route
    assertSameRows(delivered.drop("batch_id"),
      Pipeline.keySharedRoute(mk((1 to 3).flatMap(round)))
        .select("event_id", "user_id", "slot", "consumer"))
  }

  test("empty monitored directory: stream starts on the canonical schema before any file lands") {
    val emptyDir = Files.createTempDirectory("graft_empty_src").toString
    val st = MessageSource.fileStream(spark, emptyDir)
    assert(st.isStreaming)
    // schema fell back to the canonical message shape, ts normalized
    assert(st.schema.fieldNames.toSeq ===
      Seq("event_id", "ts", "user_id", "event_type", "value", "props"))
    assert(st.schema("ts").dataType ===
      org.apache.spark.sql.types.TimestampType)
    // and the stream actually runs (zero batches of zero rows) — the
    // pre-fix behavior threw at plan time
    val ckpt = Files.createTempDirectory("graft_ckpt_empty").toString
    val q = st.writeStream.format("memory").queryName("empty_probe")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(spark.table("empty_probe").count() === 0)
  }

  test("watermark drops events later than 10 minutes behind max ts") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def t(min: Int) = Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
    val mem = MemoryStream[(Timestamp, String)]
    val ckpt = Files.createTempDirectory("graft_ckpt_wm").toString
    val agg = mem.toDF().toDF("ts", "event_type")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.outputMode("append").format("memory").queryName("wm")
      .option("checkpointLocation", ckpt).start()
    try {
      mem.addData((t(0), "a"), (t(1), "a"), (t(6), "a"))
      q.processAllAvailable()
      // advance watermark far past the first windows
      mem.addData((t(40), "a"))
      q.processAllAvailable()
      // late arrival into the long-closed 10:00 window: must be dropped
      mem.addData((t(2), "late"))
      q.processAllAvailable()
      mem.addData((t(55), "a"))
      q.processAllAvailable()
      val rows = spark.table("wm").select("event_type").collect().map(_.getString(0))
      assert(!rows.contains("late"), "late event leaked past the watermark")
      assert(spark.table("wm")
        .where(col("event_type") === "a").count() >= 2, "on-time windows finalized")
    } finally q.stop()
  }

  test("source_jsonl_quarantine: the streaming ingest routes ok/quarantine identically to the batch classifier") {
    import graft.relational.Extras
    // the corrupted landing-zone artifact (built once by the batch key)
    val path = Extras.jsonlArtifact(spark, dir)
    val okSink = Files.createTempDirectory("graft_jsonlq_ok").toString
    val dlqSink = Files.createTempDirectory("graft_jsonlq_dlq").toString
    val ckpt = Files.createTempDirectory("graft_ckpt_jsonlq").toString
    val q = spark.readStream
      .schema("value STRING").text(path)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // the ONE shared classifier (Extras.jsonlClassify) routes each
        // micro-batch; the DLQ keeps the RAW line for replay
        val c = Extras.jsonlClassify(batch)
        c.where(col("status") === "ok")
          .select("k", "price")
          .write.mode("append").parquet(okSink)
        c.where(col("status") =!= "ok")
          .select("value", "status")
          .write.mode("append").parquet(dlqSink)
        ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    try q.awaitTermination() finally q.stop()
    val batchC = Extras.jsonlClassify(spark.read.text(path)).cache()
    try {
      // ok stream == ok batch (count + exact key sum)
      val okStream = spark.read.parquet(okSink)
      val okBatch = batchC.where(col("status") === "ok")
      assert(okStream.count() == okBatch.count(), "ok row counts diverge")
      assert(okStream.agg(sum("k")).head.getLong(0) ==
        okBatch.agg(sum("k")).head.getLong(0), "ok key sums diverge")
      // the DLQ holds EXACTLY the batch-classified bad lines, raw
      val dlq = spark.read.parquet(dlqSink)
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
      val bad = batchC.where(col("status") =!= "ok")
        .select("value", "status")
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
      assert(dlq == bad,
        s"DLQ diverges from batch classification (dlq=${dlq.size}, batch=${bad.size})")
      assert(bad.exists(_._2 == "corrupt") && bad.exists(_._2 == "schema_drift"),
        "fixture must exercise both quarantine classes")
    } finally batchC.unpersist()
  }

  test("producer effectively-once dedup: stream == batch across micro-batches; restart-safe") {
    import graft.streaming.StateV2
    val conf = "spark.sql.streaming.stateStore.providerClass"
    val before = spark.conf.getOption(conf)
    spark.conf.set(conf, GraftSession.rocksDBProvider)
    try {
      // the REAL fixture messages (producer = user_id mod 8, seq with
      // every-5th retransmission), split in PUBLISH ORDER into three
      // files → maxFilesPerTrigger=1 forces the per-producer high
      // watermark to genuinely carry across micro-batch boundaries
      // (publish order across batches matters — dedup is order-
      // dependent, unlike the profile test's count+max)
      val msgs = Pipeline.producerSeqFixture(Tables.events(spark, dir))
        .cache()
      val streamDir = Files.createTempDirectory("graft_stream_pdedup")
      def land(name: String, mtime: Long, part: DataFrame): Unit = {
        val tmp = Files.createTempDirectory(s"graft_pdedup_$name").toString
        part.coalesce(1).write.mode("overwrite").parquet(tmp)
        val f = new java.io.File(tmp).listFiles()
          .filter(_.getName.endsWith(".parquet")).head
        val dst = streamDir.resolve(s"$name.parquet")
        Files.move(f.toPath, dst)
        dst.toFile.setLastModified(mtime)
        ()
      }
      val t0 = System.currentTimeMillis() - 60000
      land("f1", t0, msgs.where(col("event_id") < 300))
      land("f2", t0 + 10000,
        msgs.where(col("event_id") >= 300 && col("event_id") < 700))
      land("f3", t0 + 20000, msgs.where(col("event_id") >= 700))
      val ckpt = Files.createTempDirectory("graft_ckpt_pdedup").toString
      val outDir = Files.createTempDirectory("graft_pdedup_out").toString
      def run(): Unit = {
        val q = StateV2.producerDedupStream(
            spark.readStream
              .schema("event_id LONG, producer_id LONG, seq_id LONG")
              .option("maxFilesPerTrigger", "1").parquet(streamDir.toString))
          .writeStream.outputMode("append")
          .foreachBatch {
            (b: org.apache.spark.sql.Dataset[graft.streaming.ProducerMsg],
             id: Long) =>
              b.write.mode("overwrite").parquet(s"$outDir/batch=$id"); ()
          }
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
      run()
      val twin = Pipeline.producerDedupBatch(msgs)
      def got() = spark.read.parquet(s"$outDir/batch=*")
        .select("producer_id", "seq_id", "event_id")
      assertSameRows(got(), twin)
      // duplicates were genuinely dropped (the every-5th retransmission)
      assert(got().count() < msgs.count(),
        "fixture must exercise duplicate drops")
      // truncated-commit restart: the replayed epoch re-reads the
      // rewound watermark and overwrites its own batch dir — idempotent
      val commits = new java.io.File(s"$ckpt/commits").listFiles()
        .filter(_.getName.forall(_.isDigit)).sortBy(_.getName.toInt)
      val crc = new java.io.File(s"$ckpt/commits/.${commits.last.getName}.crc")
      commits.last.delete()
      if (crc.exists()) crc.delete()
      run()
      assertSameRows(got(), twin)
      msgs.unpersist()
      ()
    } finally before match {
      case Some(v) => spark.conf.set(conf, v)
      case None => spark.conf.unset(conf)
    }
  }

  test("chunked-message reassembly: complete on last chunk, missing chunk times out exactly once; stream == batch") {
    import graft.streaming.StateV2
    val conf = "spark.sql.streaming.stateStore.providerClass"
    val before = spark.conf.getOption(conf)
    spark.conf.set(conf, GraftSession.rocksDBProvider)
    try {
      // crafted chunk corpus, one file per micro-batch; timeout 600 s,
      // watermark delay 0:
      //   msg A (p1, seq 10, 2 chunks): chunk 1 in f1, chunk 2 in f2 —
      //     COMPLETE emits in batch 2, the moment reassembly closes
      //   msg B (p1, seq 20, 2 chunks): chunk 1 in f1 ONLY — its timer
      //     (10:00 + 600 s = 10:10) fires once the watermark passes it
      //   f3 (p2, seq 30, 1 chunk @11:00) advances the watermark;
      //   f4 (p2, seq 40, 1 chunk @11:05) then RUNS with watermark
      //     11:00 > 10:10 → B is evicted as TIMED_OUT in batch 4
      def t(hhmm: String) = Timestamp.valueOf(s"2024-01-01 $hhmm:00")
      def mkChunks(rows: Seq[(Long, Long, Long, Int, String, Timestamp)]) =
        spark.createDataFrame(rows)
          .toDF("producer_id", "msg_seq", "total_chunks", "chunk_id",
            "chunk", "ts")
      val streamDir = Files.createTempDirectory("graft_stream_chunks")
      def land(name: String, mtime: Long,
          rows: Seq[(Long, Long, Long, Int, String, Timestamp)]): Unit = {
        val tmp = Files.createTempDirectory(s"graft_chunks_$name").toString
        mkChunks(rows).coalesce(1).write.mode("overwrite").parquet(tmp)
        val f = new java.io.File(tmp).listFiles()
          .filter(_.getName.endsWith(".parquet")).head
        val dst = streamDir.resolve(s"$name.parquet")
        Files.move(f.toPath, dst)
        dst.toFile.setLastModified(mtime)
        ()
      }
      val t0 = System.currentTimeMillis() - 60000
      land("f1", t0, Seq(
        (1L, 10L, 2L, 1, "hello-", t("10:00")),
        (1L, 20L, 2L, 1, "orphan", t("10:00"))))
      land("f2", t0 + 10000, Seq((1L, 10L, 2L, 2, "world", t("10:05"))))
      land("f3", t0 + 20000, Seq((2L, 30L, 1L, 1, "solo", t("11:00"))))
      land("f4", t0 + 30000, Seq((2L, 40L, 1L, 1, "last", t("11:05"))))
      val ckpt = Files.createTempDirectory("graft_ckpt_chunks").toString
      val src = spark.readStream
        .schema("producer_id LONG, msg_seq LONG, total_chunks LONG, " +
          "chunk_id INT, chunk STRING, ts TIMESTAMP")
        .option("maxFilesPerTrigger", "1").parquet(streamDir.toString)
      val q = StateV2.chunkStream(src, timeoutSec = 600L, delaySec = 0L)
        .writeStream.outputMode("append")
        .format("memory").queryName("chunk_reasm")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val got = spark.table("chunk_reasm")
      // the missing-chunk message timed out EXACTLY once, reporting
      // what arrived; only the timer can have emitted it (no chunk of
      // B arrives after f1)
      val b = got.where(col("msg_seq") === 20).collect()
      assert(b.length === 1, s"expected one timeout row, got ${b.length}")
      assert(b.head.getAs[String]("disposition") === "TIMED_OUT")
      assert(b.head.getAs[Long]("n_received") === 1L)
      assert(b.head.getAs[String]("payload_sha") == null)
      // stream == the batch twin over the same drained corpus — this
      // also cross-checks the processor's MessageDigest sha against
      // the batch twin's sha2() on the reassembled "hello-world"
      val all = mkChunks(Seq(
        (1L, 10L, 2L, 1, "hello-", t("10:00")),
        (1L, 20L, 2L, 1, "orphan", t("10:00")),
        (1L, 10L, 2L, 2, "world", t("10:05")),
        (2L, 30L, 1L, 1, "solo", t("11:00")),
        (2L, 40L, 1L, 1, "last", t("11:05"))))
      assertSameRows(got.select("producer_id", "msg_seq", "total_chunks",
          "n_received", "disposition", "payload_sha"),
        graft.relational.Filters.reassemble(all))
    } finally before match {
      case Some(v) => spark.conf.set(conf, v)
      case None => spark.conf.unset(conf)
    }
  }

  test("ack-holes / retention / expiry compose: the stuck subscription pins the ledger until the TTL move unblocks it") {
    // the round-11 broker-state triad reads ONE cursor fixture, so the
    // invariants must hold across keys, not just inside each oracle:
    //  - markDelete never regresses below the cumulative base, and the
    //    caught-up subscription reports a clean ledger (no holes)
    //  - the paused subscription's scattered acks are exactly the
    //    ledger's individually-deleted bloat (holes > 0)
    //  - retention trim before the TTL move is pinned at −1 by the
    //    paused cursor (nothing reclaimable); after the move it equals
    //    the min MOVED cursor and reclaims a real prefix
    val holes = SparkEntry.queries("obs_ack_holes")(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    holes.foreach { case (s, (ack, md, _, _)) =>
      assert(md >= ack, s"$s: markDelete $md regressed below base $ack")
    }
    assert(holes("sub_paused")._3 > 0, "paused sub must carry ack holes")
    assert(holes("sub_caughtup")._3 == 0 && holes("sub_caughtup")._4 == 0,
      "caught-up sub must report a clean ledger")
    val trim = SparkEntry.queries("obs_retention_trim")(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(trim("before_ttl") == ((-1L, 0L, 0L)),
      s"stuck subscription must pin the ledger: ${trim("before_ttl")}")
    val expiry = SparkEntry.queries("stream_msg_expiry")(spark, dir)
      .collect().map(r => r.getLong(2)).min
    assert(trim("after_ttl")._1 == expiry,
      s"after_ttl trim ${trim("after_ttl")._1} != min moved cursor $expiry")
    assert(trim("after_ttl")._2 > 0 && trim("after_ttl")._3 > 0,
      "the TTL move must unblock a real reclaimable prefix")
  }

  test("transactional two-sink commit: a crash between sink writes exposes neither; replay commits both exactly once") {
    // the PIP-31 producer guarantee over the epoch-dir recipe: sink A
    // and sink B must become visible ATOMICALLY. Crash injection: the
    // first attempt throws after sink A's epoch write but before sink
    // B and the marker — the read-committed view must show NOTHING
    // (A's orphan epoch is invisible without its marker). The rerun
    // replays the same batch from the checkpoint, overwrites A's
    // orphan, writes B, and commits — both sinks visible exactly once.
    val streamDir = Files.createTempDirectory("graft_stream_txn")
    Files.copy(java.nio.file.Paths.get(s"$dir/events.parquet"),
      streamDir.resolve("events.parquet"))
    val ckpt = Files.createTempDirectory("graft_ckpt_txn").toString
    val sinkA = Files.createTempDirectory("graft_txn_a").toString
    val sinkB = Files.createTempDirectory("graft_txn_b").toString
    val markers = Files.createTempDirectory("graft_txn_m").toString
    val purchases: DataFrame => DataFrame =
      _.where(col("event_type") === "purchase").select("event_id", "value")
    val clicks: DataFrame => DataFrame =
      _.where(col("event_type") === "click").select("event_id", "value")
    @volatile var crashOnce = true
    def run(): Unit = {
      val q = MessageSource.fileStream(spark, streamDir.toString)
        .writeStream
        .foreachBatch { (b: DataFrame, id: Long) =>
          if (crashOnce) {
            // simulate the crash window: sink A landed, B + marker not
            purchases(b).write.mode("overwrite").parquet(s"$sinkA/batch=$id")
            crashOnce = false
            throw new RuntimeException("injected crash between sink writes")
          }
          Pipeline.txnCommit(b, id, markers,
            Seq(purchases -> sinkA, clicks -> sinkB))
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] { run() }
    // after the crash: A's orphan epoch exists on disk, but the
    // read-committed view admits NEITHER sink
    assert(new java.io.File(sinkA).listFiles().exists(_.getName.startsWith("batch=")),
      "the crash must leave A's orphan epoch (or the injection did nothing)")
    assert(Pipeline.txnRead(spark, sinkA, markers).isEmpty,
      "orphan epoch visible without its commit marker")
    assert(Pipeline.txnRead(spark, sinkB, markers).isEmpty)
    // replay: the same batch re-executes, overwrites the orphan,
    // writes B, commits — both visible, exactly once, equal to batch
    run()
    val ev = Tables.events(spark, dir)
    assertSameRows(Pipeline.txnRead(spark, sinkA, markers),
      purchases(ev))
    assertSameRows(Pipeline.txnRead(spark, sinkB, markers),
      clicks(ev))
  }

  test("topic-pattern subscription: between-batch topic discovery, discovered exactly once, never reprocessed") {
    // Pulsar's regex consumerPattern discovers topics BETWEEN batches:
    // a topic dir that appears after run 1 must be consumed by run 2
    // exactly once, already-consumed topics must not replay, and
    // non-matching topics must never be read. The file source's
    // partition-dir discovery over one checkpoint is exactly that
    // contract.
    def t(hhmm: String) = Timestamp.valueOf(s"2024-01-01 $hhmm:00")
    def mkEvents(rows: Seq[(Long, Timestamp)]) =
      spark.createDataFrame(rows).toDF("event_id", "ts")
    val root = Files.createTempDirectory("graft_topics_disc")
    def landTopic(topic: String, rows: Seq[(Long, Timestamp)]): Unit = {
      mkEvents(rows).coalesce(1).write.mode("overwrite")
        .parquet(s"$root/topic=$topic")
      ()
    }
    landTopic("topic_click", Seq((1L, t("10:00")), (2L, t("10:30"))))
    landTopic("topic_error", Seq((90L, t("10:00")))) // never matches
    val ckpt = Files.createTempDirectory("graft_ckpt_topics").toString
    val outDir = Files.createTempDirectory("graft_topics_out").toString
    def run(): Unit = {
      val q = spark.readStream
        .schema("event_id LONG, ts TIMESTAMP, topic STRING")
        .parquet(root.toString)
        .where(col("topic").rlike(graft.streaming.Streams.topicPattern))
        .writeStream.outputMode("append")
        .foreachBatch { (b: DataFrame, id: Long) =>
          b.write.mode("overwrite")
            .parquet(s"$outDir/run=${new java.io.File(outDir).list().length}_$id")
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    run()
    val after1 = spark.read.parquet(s"$outDir/*")
    assert(after1.count() === 2, "run 1 must read exactly the click topic")
    assert(after1.select("topic").distinct().collect()
      .map(_.getString(0)).toSet === Set("topic_click"),
      "non-matching topics must never be read")
    // a new MATCHING topic (and a new non-matching one) appear between
    // the AvailableNow restarts — the pattern consumer's discovery tick
    landTopic("topic_view", Seq((3L, t("11:00"))))
    landTopic("topic_signup", Seq((91L, t("11:00"))))
    run()
    val after2 = spark.read.parquet(s"$outDir/*")
    assert(after2.count() === 3, "run 2 must add ONLY the new topic's rows")
    assert(after2.where(col("topic") === "topic_click").count() === 2,
      "already-consumed topic must not replay")
    assert(after2.where(col("topic") === "topic_view")
      .collect().map(_.getAs[Long]("event_id")).toSeq === Seq(3L),
      "the discovered topic's rows arrive exactly once, with provenance")
  }

  test("transformWithState batch-index acks: live per-entry bitmap state == batch census; restart-safe") {
    import graft.streaming.StateV2
    val conf = "spark.sql.streaming.stateStore.providerClass"
    val before = spark.conf.getOption(conf)
    spark.conf.set(conf, GraftSession.rocksDBProvider)
    try {
      // the key's exact fixture: entries of 4, acked = user_id%3 != 0;
      // even/odd split → every entry's indices arrive across TWO
      // micro-batches, so the ValueState genuinely accumulates
      val ev = Tables.events(spark, dir)
        .select(expr("event_id div 4").as("entry_id"), col("event_id"),
          (pmod(col("user_id"), lit(3)) =!= 0).as("acked"))
      val inDir = Files.createTempDirectory("graft_bia_in").toString
      ev.where(col("event_id") % 2 === 0).coalesce(1)
        .write.mode("append").json(inDir)
      ev.where(col("event_id") % 2 === 1).coalesce(1)
        .write.mode("append").json(inDir)
      val ckpt = Files.createTempDirectory("graft_ckpt_bia").toString
      val outDir = Files.createTempDirectory("graft_bia_out").toString
      def run(): Unit = {
        val q = StateV2.batchIndexAckStream(
            spark.readStream
              .schema("entry_id LONG, event_id LONG, acked BOOLEAN")
              .option("maxFilesPerTrigger", 1).json(inDir))
          .writeStream.outputMode("update")
          .foreachBatch {
            (b: org.apache.spark.sql.Dataset[graft.streaming.BatchAckOut],
             id: Long) =>
              b.write.mode("overwrite").parquet(s"$outDir/batch=$id"); ()
          }
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
      run()
      // final ledger state per entry = the row with max n_msgs (the
      // count is monotone across update-mode emissions)
      def entries() = {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("entry_id").orderBy(col("n_msgs").desc)
        spark.read.parquet(s"$outDir/batch=*")
          .withColumn("rk", row_number().over(w)).where(col("rk") === 1)
          .select("entry_id", "n_msgs", "n_acked").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      }
      def census(rows: Array[(Long, Long, Long)]): (Long, Long, Long, Long) = {
        val md = rows.filter { case (_, m, a) => a != m }
          .map(_._1).sorted.headOption.map(_ - 1)
          .getOrElse(rows.map(_._1).max)
        (rows.length.toLong,
          rows.count { case (_, m, a) => a == m }.toLong, md,
          rows.filter(_._1 > md).map { case (_, m, a) => m - a }.sum)
      }
      val twin = SparkEntry.queries("stream_batch_index_ack")(spark, dir)
        .collect()(0)
      val (n, full, md, redeliver) = census(entries())
      assert(n === twin.getAs[Long]("n_entries"))
      assert(full === twin.getAs[Long]("full_entries"))
      assert(md === twin.getAs[Long]("mark_delete_entry"))
      assert(redeliver === twin.getAs[Long]("redeliver_pip54"),
        "the live ack state must reproduce the batch census exactly")
      // truncated-commit restart: the replayed epoch restores the
      // rewound ValueState and re-emits identical ledger rows
      val commits = new java.io.File(s"$ckpt/commits").listFiles()
        .filter(_.getName.forall(_.isDigit)).sortBy(_.getName.toInt)
      val crc = new java.io.File(s"$ckpt/commits/.${commits.last.getName}.crc")
      commits.last.delete()
      if (crc.exists()) crc.delete()
      run()
      assert(census(entries()) === ((n, full, md, redeliver)))
    } finally before match {
      case Some(v) => spark.conf.set(conf, v)
      case None => spark.conf.unset(conf)
    }
  }

  test("wave-4 broker resource keys: cross-key invariants hold on the shared fixtures") {
    // the wave-4 pack reads the SAME subCursors fixture and position
    // convention as the wave-2 broker-state triad, so the invariants
    // must hold ACROSS keys, not just inside each oracle (the round-11
    // composition discipline).
    val n = Tables.events(spark, dir).count()

    // PIP-54: entry states partition the ledger; the batch-index win is
    // never negative (acked indices inside partial entries don't redeliver)
    val bia = SparkEntry.queries("stream_batch_index_ack")(spark, dir)
      .collect()(0)
    assert(bia.getAs[Long]("full_entries") + bia.getAs[Long]("partial_entries")
      + bia.getAs[Long]("untouched_entries") === bia.getAs[Long]("n_entries"))
    assert(bia.getAs[Long]("redeliver_pip54")
      <= bia.getAs[Long]("redeliver_entry_level"),
      "batch-index acks can only shrink the redelivery set")
    assert(bia.getAs[Long]("mark_delete_entry") >= -1L)

    // backlog quota: the quota key's backlog must agree with the
    // standalone backlog report, and eviction lands EXACTLY on quota
    val blMap = SparkEntry.queries("obs_sub_backlog")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("backlog")).toMap
    val quota = SparkEntry.queries("obs_backlog_quota")(spark, dir).collect()
    quota.foreach { r =>
      assert(r.getAs[Long]("backlog") === blMap(r.getString(0)),
        s"${r.getString(0)}: quota key disagrees with the backlog report")
      val evicted = r.getAs[String]("action") == "consumer_backlog_eviction"
      if (evicted)
        assert(n - 1 - r.getAs[Long]("new_ack_pos") === r.getAs[Long]("quota"),
          "eviction must shrink the backlog to exactly the quota")
      else assert(r.getAs[Long]("n_evicted") === 0L,
        "producer-side policies never move the cursor")
    }

    // dispatch throttle: drain time is the ceiling division; the first
    // second saturates the rate (or drains everything)
    SparkEntry.queries("stream_dispatch_throttle")(spark, dir).collect()
      .foreach { r =>
        val (bl, rate) = (r.getAs[Long]("backlog"), r.getAs[Long]("rate"))
        assert(r.getAs[Long]("drain_seconds") === (bl + rate - 1) / rate,
          s"${r.getString(0)}: drain != ceil(backlog/rate)")
        assert(r.getAs[Long]("msgs_slot0") === math.min(rate, bl))
      }

    // tiered offload: the two tiers partition the corpus exactly
    // (count + position checksum), and exactly keepLedgers stay hot
    val tiers = SparkEntry.queries("source_tiered_offload")(spark, dir)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(tiers.values.map(_.getAs[Long]("n_msgs")).sum === n)
    assert(tiers.values.map(_.getAs[Long]("pos_checksum")).sum === n * (n - 1) / 2,
      "tier split must partition the dense position space")
    assert(tiers("bookkeeper").getAs[Long]("n_ledgers")
      === graft.streaming.Broker.keepLedgers.toLong)
    assert(tiers("offloaded").getAs[Long]("max_pos")
      < tiers("bookkeeper").getAs[Long]("min_pos"),
      "offloaded ledgers must be a strict position prefix")

    // bundle split: both phases conserve the corpus; the split halves
    // the hottest range without touching the other bundles
    val bs = SparkEntry.queries("obs_bundle_split")(spark, dir).collect()
    val (before, after) = bs.partition(_.getString(0) == "before")
    assert(before.length === 4 && after.length === 5)
    assert(before.map(_.getAs[Long]("n_msgs")).sum === n)
    assert(after.map(_.getAs[Long]("n_msgs")).sum === n)
    val hot = before.maxBy(r => (r.getAs[Long]("n_msgs"), -r.getAs[Long]("lo")))
    val halves = after.filter(r => r.getAs[Long]("lo") >= hot.getAs[Long]("lo")
      && r.getAs[Long]("hi") <= hot.getAs[Long]("hi"))
    assert(halves.length === 2, "the hottest bundle must split in two")
    assert(halves.map(_.getAs[Long]("n_msgs")).sum === hot.getAs[Long]("n_msgs"),
      "the split must conserve the hot bundle's load")

    // capacity forecast: totals must agree with the topic-stats
    // counters; the integer slope pair is self-consistent with the
    // rounded presentation value
    val stats = SparkEntry.queries("obs_topic_stats")(spark, dir)
      .collect().map(r => r.getString(0) ->
        r.getAs[Long]("msg_in_counter")).toMap
    SparkEntry.queries("obs_quota_forecast")(spark, dir).collect()
      .foreach { r =>
        val topic = r.getString(0)
        assert(r.getAs[Long]("total") === stats(topic),
          s"$topic: forecast total must equal the stats counter")
        val (num, den) = (r.getAs[Long]("slope_num"), r.getAs[Long]("slope_den"))
        assert(den > 0, s"$topic: degenerate regression denominator")
        assert(math.abs(r.getAs[Double]("slope_msgs_day")
          - num.toDouble / den) < 1e-3)
        if (num > 0) assert(r.getAs[Long]("days_to_double") >= 1)
        else assert(r.getAs[Long]("days_to_double") === -1L)
      }

    // ackTimeout ladder: every message lands exactly once; a DLQ'd
    // message's clock is exactly the four timeout windows
    val at = SparkEntry.queries("stream_ack_timeout")(spark, dir).collect()
    assert(at.map(_.getAs[Long]("n")).sum === n)
    at.foreach { r =>
      val k = r.getAs[Long]("attempts")
      assert(k >= 1 && k <= 4)
      if (r.getString(0) == "TIMEOUT_DLQ")
        assert(r.getAs[Long]("clock_checksum") === 32L * r.getAs[Long]("n"),
          "a dead-lettered message's clock is 4 ackTimeout windows, nothing else")
    }

    // cumulative vs individual acks: markDelete and the ack census
    // must agree with obs_ack_holes (same fixture, same definitions);
    // the range count can never exceed the ack count
    val holesRows = SparkEntry.queries("obs_ack_holes")(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("mark_delete"), r.getAs[Long]("n_holes"))).toMap
    SparkEntry.queries("obs_cumulative_ack")(spark, dir).collect()
      .foreach { r =>
        val sub = r.getString(0)
        assert(r.getAs[Long]("mark_delete") === holesRows(sub)._1,
          s"$sub: cumulative cursor must equal the ack-holes markDelete")
        assert(r.getAs[Long]("n_acked_above") === holesRows(sub)._2,
          s"$sub: individual-ack census must equal the hole census")
        val (ranges, acked) = (r.getAs[Long]("n_ranges"), r.getAs[Long]("n_acked_above"))
        assert(ranges <= acked)
        assert((ranges == 0) === (acked == 0),
          s"$sub: acked positions above markDelete form ≥1 range")
      }

    // size-based retention: the trim respects BOTH constraints — never
    // past the ack floor (the SAME moved cursors the TTL-expiry key
    // produces), and it stops as soon as the size drops to the limit
    val rs = SparkEntry.queries("obs_retention_size")(spark, dir)
      .collect()(0)
    val minMoved = SparkEntry.queries("stream_msg_expiry")(spark, dir)
      .collect().map(_.getLong(2)).min
    assert(rs.getAs[Long]("trim_pos") <= minMoved,
      "size trim must never pass the min moved cursor")
    assert(rs.getAs[Long]("bytes_reclaimed") + rs.getAs[Long]("bytes_remaining")
      === rs.getAs[Long]("bytes_total"))
    val sizeBinds = rs.getAs[Long]("bytes_remaining") <= rs.getAs[Long]("limit_bytes")
    val ackBinds = rs.getAs[Long]("trim_pos") + 1 > minMoved - graft.streaming.Broker.ledgerWidth
    assert(sizeBinds || ackBinds,
      "trim must stop for a reason: size at/below limit or ack floor reached")
    assert(rs.getAs[Long]("first_kept_ledger") === rs.getAs[Long]("n_trimmed"),
      "trimmed ledgers must be exactly the oldest prefix")

    // priority dispatch: round-robin gives c0 first pick in every tick,
    // so it can never trail c1 in messages or active ticks
    val pr = SparkEntry.queries("stream_consumer_priority")(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n_msgs"), r.getAs[Long]("n_ticks"))).toMap
    assert(pr("c0")._1 >= pr("c1")._1 && pr("c0")._2 >= pr("c1")._2)
    pr.get("c2").foreach { case (_, t2) =>
      assert(t2 <= pr("c1")._2, "spill to priority 1 needs p0 saturated")
    }

    // publish throttle (round 12): the publish clock is the dispatch
    // slot rule applied to a full-replay cursor (ack_pos = −1), slot =
    // event_id div R — so on the dense positions the global census
    // closes in closed form, the cross-key invariant tying the
    // producer and consumer sides of the throttle quad together
    val pt = SparkEntry.queries("stream_publish_throttle")(spark, dir)
      .collect()
    val rate = graft.streaming.Broker.publishRateMsgs.toLong
    assert(pt.map(_.getAs[Long]("n_msgs")).sum === n)
    assert(pt.map(_.getAs[Long]("first_slot")).min === 0L)
    assert(pt.map(_.getAs[Long]("last_slot")).max === (n - 1) / rate)
    val fullSlots = n / rate
    assert(pt.map(_.getAs[Long]("slot_checksum")).sum
      === rate * fullSlots * (fullSlots - 1) / 2 + (n % rate) * fullSlots,
      "per-topic slot checksums must sum to the full-replay dispatch clock")
    pt.foreach { r =>
      assert(r.getAs[Long]("peak_slot_msgs") <= rate,
        s"${r.getString(0)}: one second can never admit more than the rate")
      assert(r.getAs[Long]("n_active_slots")
        <= r.getAs[Long]("paced_seconds"),
        s"${r.getString(0)}: active slots live inside the paced extent")
    }

    // consumer flow control (round 12): the permit gate's census must
    // close in closed form against backlog and queue size — the first
    // Q backlog positions ride the initial permit grant, the rest wait
    // on the app drain clock (the dispatch-throttle arithmetic shifted
    // by Q), so every column is derivable from (backlog, Q, rate)
    val qSize = graft.streaming.Broker.receiverQueueSize.toLong
    val blFlow = SparkEntry.queries("obs_sub_backlog")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("backlog")).toMap
    val cf = SparkEntry.queries("stream_consumer_flow")(spark, dir).collect()
    assert(cf.exists(_.getAs[Long]("n_flow_gated") > 0),
      "fixture must exercise the permit-gated regime")
    cf.foreach { r =>
      val (sub, d) = (r.getString(0), r.getAs[Long]("rate"))
      val bl = r.getAs[Long]("backlog")
      assert(bl === blFlow(sub),
        s"$sub: flow key disagrees with the backlog report")
      assert(r.getAs[Long]("n_immediate") === math.min(bl, qSize))
      val gatedN = math.max(0L, bl - qSize)
      assert(r.getAs[Long]("n_flow_gated") === gatedN)
      assert(r.getAs[Long]("last_dispatch_s") ===
        (if (gatedN == 0) 0L else (gatedN - 1) / d + 1))
      val t = gatedN / d; val rem = gatedN - t * d
      assert(r.getAs[Long]("flow_checksum")
        === gatedN + d * t * (t - 1) / 2 + rem * t,
        s"$sub: flow checksum must equal the closed-form drain clock")
    }
  }

  test("IVFPQ cell-codes maintainer: maintained layout == bulk build == join derivation; replay idempotent") {
    // the round-13 cell-co-partitioned serving artifact joins the
    // maintainer family (FAISS add() semantics): frozen centroids +
    // frozen codebook, per-batch top-2 assignment + encode appended
    // under the bucketed spec. Three pins: (a) maintained rows ==
    // direct bulk build over the union after a truncated-commit
    // restart (exactly-once), (b) every vector holds exactly its 2
    // redundant-assignment rows (no replay duplicates), (c) the
    // fingerprint-keyed SERVING artifact — built by joining the
    // inverted-list and codes artifacts — equals the maintainer's
    // direct derivation row-for-row, so the two definitions cannot
    // fork silently.
    import graft.llm.{Incremental, Quantize, Similarity}
    val emb = Tables.embeddings(spark, dir)
    val n = emb.count()
    val K = Similarity.ivfCells(n)
    val cents = Similarity.learnedCentroids(spark, dir, K)
    val book = Quantize.codebook(spark, dir)
    val initial = emb.where(pmod(col("vec_id"), lit(2)) === 1)
    val arriving = emb.where(pmod(col("vec_id"), lit(2)) === 0)
    val (p1, p2) = (arriving.where(col("vec_id") % 3 === 0),
      arriving.where(col("vec_id") % 3 =!= 0))
    val maintained = "ivfpq_restart_test"
    val batchBuilt = "ivfpq_restart_batch"
    Tables.dropStaleTables(spark, maintained)
    Tables.dropStaleTables(spark, batchBuilt)
    Quantize.writeIvfPqCodes(
      Quantize.ivfPqRowsOf(initial, cents, K, book), maintained, None)
    val inDir = Files.createTempDirectory("graft_ivfpqrst_in").toString
    val ckpt = Files.createTempDirectory("graft_ckpt_ivfpqrst").toString
    def push(df: DataFrame): Unit =
      df.select(col("vec_id"),
          col("embedding").cast("array<double>").as("embedding"))
        .write.mode("append").json(inDir)
    def runOnce(): Unit = {
      val q = Quantize.maintainIvfPqCodes(
        spark.readStream.schema("vec_id LONG, embedding ARRAY<DOUBLE>")
          .json(inDir), maintained, cents, K, book, ckpt)
      q.awaitTermination()
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (spark.streams.active.exists(_.id == q.id) &&
        System.nanoTime() < deadline) Thread.sleep(50)
    }
    push(p1)
    runOnce()
    val commits = java.nio.file.Paths.get(ckpt, "commits")
    val latest = java.nio.file.Files.list(commits).toArray.map(_.toString)
      .filter(_.split("/").last.forall(_.isDigit))
      .maxBy(_.split("/").last.toLong)
    java.nio.file.Files.delete(java.nio.file.Paths.get(latest))
    java.nio.file.Files.deleteIfExists(
      commits.resolve("." + latest.split("/").last + ".crc"))
    push(p2)
    runOnce()
    spark.catalog.refreshTable(maintained)
    Quantize.writeIvfPqCodes(
      Quantize.ivfPqRowsOf(emb, cents, K, book), batchBuilt, None)
    val cols = Seq("cell", "idx_id", "codes", "nrm")
    assertSameRows(spark.table(maintained).select(cols.map(col): _*),
      spark.table(batchBuilt).select(cols.map(col): _*))
    val perVec = spark.table(maintained).groupBy("idx_id")
      .agg(count(lit(1)).as("c")).where(col("c") =!= 2).count()
    assert(perVec === 0,
      "every vector must hold exactly its 2 redundant-assignment rows")
    // the serving artifact's join derivation == the direct derivation
    val served = spark.table(
      Quantize.ivfPqCodesTable(spark, dir, book, cents, K))
    assertSameRows(served.select(cols.map(col): _*),
      Quantize.ivfPqRowsOf(emb, cents, K, book))
  }

  test("composed streaming curation gate: kept == v3 across a truncated-commit restart; cross-batch dedup holds") {
    // the capstone composition gate (VERDICT r12 item 2): the persisted-
    // index ingest gates driven as ONE AvailableNow file stream must
    // reproduce pipeline_curate_incr_v3's keep-set exactly — including
    // an exact duplicate PLANTED so its two copies land in different
    // micro-batches (cross-batch dedup can only come from the stream's
    // maintained admitted-hash store), and across a kill/resume forced
    // by commit-log truncation (the replayed epoch must not collide
    // with its own prior hash-store write). The kept docs must also
    // have flowed into BM25 lexicon maintenance inside the same stream.
    import graft.llm.Incremental
    val out = Files.createTempDirectory("graft_curstream_fix").toString
    val docs = Tables.documents(spark, dir)
    // plant source: the smallest doc v3 KEEPS on the base fixture —
    // derived from the gate itself, so the plant can't silently rot
    // into a quality-rejected (hence untested) duplicate
    val srcId = SparkEntry.queries("pipeline_curate_incr_v3")(spark, dir)
      .agg(min(col("doc_id"))).head.getLong(0)
    val maxId = docs.agg(max(col("doc_id"))).head.getLong(0)
    val cloneId = (maxId / 4 + 1) * 4 // delta-slot id beyond every real id
    docs.unionByName(docs.where(col("doc_id") === srcId)
        .withColumn("doc_id", lit(cloneId)))
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    val (src, tK, tH, tL, tS) = Incremental.curateStreamSetup(spark, out)
    val ckpt = Files.createTempDirectory("graft_ckpt_curstream").toString
    def runOnce(): Unit = {
      val q = Incremental.curateStream(spark, out, src, tK, tH, tL, tS, ckpt)
      q.awaitTermination()
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (spark.streams.active.exists(_.id == q.id) &&
        System.nanoTime() < deadline) Thread.sleep(50)
    }
    runOnce()
    // crash window: final epoch's sinks written, checkpoint commit lost
    val commits = java.nio.file.Paths.get(ckpt, "commits")
    val latest = java.nio.file.Files.list(commits).toArray.map(_.toString)
      .filter(_.split("/").last.forall(_.isDigit))
      .maxBy(_.split("/").last.toLong)
    java.nio.file.Files.delete(java.nio.file.Paths.get(latest))
    java.nio.file.Files.deleteIfExists(
      commits.resolve("." + latest.split("/").last + ".crc"))
    runOnce()
    spark.catalog.refreshTable(tK)
    val streamKept = spark.table(tK)
    // keep-set EQUALITY with the batch v3 gate on the same corpus
    assertSameRows(
      streamKept.select("doc_id", "lang", "source", "quality"),
      SparkEntry.queries("pipeline_curate_incr_v3")(spark, out))
    // the stream really ran multi-batch: one epoch per staged file
    val epochs = streamKept.select("epoch").distinct()
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(epochs.size === Incremental.curateStreamBatches,
      s"expected ${Incremental.curateStreamBatches} micro-batches, saw $epochs")
    // cross-batch dedup: the clone (last batch, by id order) was
    // dropped; its original (an earlier batch) survived
    val keptIds = streamKept.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(keptIds.contains(srcId), "plant source must survive the gate")
    assert(!keptIds.contains(cloneId),
      "cross-batch exact duplicate must be dropped via the maintained hash store")
    val srcEpoch = streamKept.where(col("doc_id") === srcId)
      .select("epoch").head.getLong(0)
    assert(srcEpoch < epochs.max,
      "plant source must land in an earlier micro-batch than the clone's")
    // admitted docs flowed into lexicon maintenance: per-epoch partials
    // sum to the batch lexicon over exactly the kept docs
    val keptDocs = spark.read.parquet(s"$out/documents.parquet")
      .join(streamKept.select("doc_id"), Seq("doc_id"))
    assertSameRows(
      spark.table(tL).groupBy("term").agg(sum(col("df")).as("df")),
      keptDocs.select(explode(array_distinct(split(col("text"), " ")))
        .as("term")).groupBy("term").agg(count(lit(1)).as("df")))
    val st = spark.table(tS).agg(sum(col("n")), sum(col("sdl"))).head
    assert(st.getLong(0) === keptDocs.count(),
      "lexicon stats n must count exactly the kept docs")
    assert(st.getLong(1) === keptDocs
      .agg(sum(size(split(col("text"), " ")).cast("long"))).head.getLong(0),
      "lexicon stats sdl must sum the kept docs' lengths")
    // half-built recovery (review r13): this test drove the stream by
    // hand, so the sinks exist WITHOUT the done marker — exactly the
    // on-disk state after an interrupted build. The write-once KEY
    // must treat that as unbuilt, drop the partials, re-drain from
    // scratch, and still equal v3 (it must never fast-path a markerless
    // kept table)
    assertSameRows(
      SparkEntry.queries("pipeline_curate_incr_stream")(spark, out),
      SparkEntry.queries("pipeline_curate_incr_v3")(spark, out))
  }
}
