package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan assertions (SURVEY.md §4): the scale posture is only
  * real if the plans show it — filters and projections reaching the
  * parquet scan, dims broadcast, aggregates running partial+final.
  */
class PlanSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  private lazy val spark: SparkSession = GraftSession.local("4")

  private def physical(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("sink_compact: the compaction rewrite plans as Coalesce — no shuffle Exchange") {
    // reproduce the key's rewrite plan shape directly (the key itself
    // executes the write eagerly, so its returned frame is the
    // read-back, not the rewrite)
    val frag = Tables.orders(spark, dir).repartition(8)
    val plan = frag.coalesce(3).queryExecution.executedPlan.toString
    assert(plan.contains("Coalesce"), s"no Coalesce in rewrite plan:\n$plan")
    // the coalesce itself must not introduce a shuffle on top of the
    // (deliberate) fragmentation repartition
    val exchangeAt = plan.indexOf("Exchange")
    assert(exchangeAt >= 0, s"expected the deliberate repartition Exchange in:\n$plan")
    assert(plan.substring(0, exchangeAt).contains("Coalesce"),
      s"a shuffle Exchange sits above Coalesce — bin-packing is shuffling:\n$plan")
  }

  test("join_bloom_persisted: the revived filter probes the fact scan below the join") {
    val plan = physical("join_bloom_persisted")
    assert(plan.contains("bloommightcontain"), s"no bloom probe in plan:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), s"dim not broadcast:\n$plan")
    // the probe must appear BEFORE (deeper than) the join operator line
    val probeAt = plan.indexOf("bloommightcontain")
    val joinAt = plan.indexOf("BroadcastHashJoin")
    assert(probeAt > joinAt,
      s"bloom probe not below the join (probe@$probeAt join@$joinAt):\n$plan")
  }

  test("ann_query_topk: the persisted band store is read as a bucketed scan (no index-side shuffle)") {
    val plan = physical("ann_query_topk")
    assert(plan.contains("Bucketed: true"),
      s"index side not read as bucketed scan:\n$plan")
  }

  test("scan_pruned: predicate and projection reach the parquet scan") {
    val plan = physical("scan_pruned")
    assert(plan.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThanOrEqual(l_quantity,45"),
      s"predicate not pushed:\n$plan")
    assert(plan.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"),
      s"columns not pruned:\n$plan")
  }

  test("selector-compiled predicates push down to the scan") {
    import graft.selector.Selector
    val plan = Tables.events(spark, dir)
      .where(Selector.compileEvents("event_type = 'purchase' AND value > 100"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("EqualTo(event_type,purchase)") &&
      plan.contains("GreaterThan(value,100.0)"),
      s"selector predicates not pushed:\n$plan")
  }

  test("JMS header selectors stay pushable where the column allows") {
    import graft.selector.Selector
    // JMSType maps straight to a stored column — its predicate must
    // reach the scan; JMSTimestamp/JMSPriority are derived expressions
    // (unix_millis / json-extract) that legitimately evaluate above it,
    // and the constant JMSDeliveryMode clause must constant-fold away
    // rather than survive as a runtime filter
    val plan = Tables.events(spark, dir)
      .where(Selector.compileEvents(
        "JMSType = 'purchase' AND JMSDeliveryMode = 'PERSISTENT'"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("EqualTo(event_type,purchase)"),
      s"JMSType predicate not pushed:\n$plan")
    assert(!plan.toLowerCase.contains("persistent"),
      s"constant JMSDeliveryMode clause survived constant folding:\n$plan")
  }

  test("win_funnel: per-stage event_type filters reach the parquet scan") {
    val plan = physical("win_funnel")
    Seq("view", "click", "purchase").foreach { t =>
      assert(plan.contains(s"EqualTo(event_type,$t)"),
        s"stage filter $t not pushed to scan:\n$plan")
    }
  }

  test("sql_recursive executes as a UnionLoop; ts_gapfill grid join is broadcast") {
    assert(physical("sql_recursive").contains("UnionLoop"),
      "recursive CTE did not plan as UnionLoop")
    // the calendar x types grid is metadata-sized — its cross join must
    // be a broadcast nested loop, never a shuffle
    assert(physical("ts_gapfill").contains("BroadcastNestedLoopJoin"),
      "calendar grid cross join not broadcast")
  }

  test("join_broadcast / join_star3: dims are broadcast, fact side never shuffles for the join") {
    assert(physical("join_broadcast").contains("BroadcastHashJoin"))
    val star = physical("join_star3")
    assert(star.contains("BroadcastHashJoin"), s"star dims not broadcast:\n$star")
  }

  test("agg_group: two-phase hash aggregation (map-side partial)") {
    val plan = physical("agg_group")
    assert("HashAggregate".r.findAllIn(plan).size >= 2,
      s"expected partial+final HashAggregate:\n$plan")
  }

  test("partition pruning: filter on a partition column prunes the scan") {
    import org.apache.spark.sql.functions._
    val tmp = java.nio.file.Files.createTempDirectory("graft_part").toString
    Tables.orders(spark, dir)
      .withColumn("oy", year(col("o_orderdate")))
      .write.mode("overwrite").partitionBy("oy").parquet(tmp)
    val pruned = spark.read.parquet(tmp).where(col("oy") === 1996)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("= 1996)"),
      s"partition filter missing:\n$plan")
    assert(pruned.count() > 0)
  }

  test("scan_partitioned: the lang predicate becomes a PartitionFilter (directory pruning)") {
    val plan = physical("scan_partitioned")
    assert(plan.contains("PartitionFilters") && plan.contains("(lang"),
      s"lang not a partition filter:\n$plan")
    assert(!plan.contains("PushedFilters: [IsNotNull(lang)"),
      s"lang should prune directories, not filter rows:\n$plan")
  }

  test("scan_dpp: runtime dim filter prunes fact partitions (dynamicpruning in scan)") {
    val plan = physical("scan_dpp")
    assert(plan.contains("dynamicpruning"),
      s"expected a dynamic partition pruning filter on the fact scan:\n$plan")
  }

  test("join_bucketed: co-located SortMergeJoin with zero Exchange") {
    val plan = physical("join_bucketed")
    assert(plan.contains("SortMergeJoin"), s"expected SMJ over buckets:\n$plan")
    // the join itself must not shuffle either side; the only exchange
    // allowed is the one feeding the final aggregation
    val joinPart = plan.split("SortMergeJoin")(1)
    assert(!joinPart.contains("Exchange hashpartitioning"),
      s"bucketed join should not shuffle its inputs:\n$plan")
    assert(plan.contains("SelectedBucketsCount"), s"bucket scan missing:\n$plan")
  }

  test("topk_per_group_native plans through the custom GroupTopKExec node") {
    val plan = physical("topk_per_group_native")
    assert(plan.contains("GroupTopK"), s"custom exec node missing:\n$plan")
    // exactly one hash exchange below the node (EnsureRequirements), on
    // the group key — plus only the final orderBy's range exchange
    val below = plan.split("GroupTopK")(1)
    assert(below.contains("Exchange hashpartitioning(o_orderstatus"),
      s"expected a single group-key exchange below GroupTopKExec:\n$plan")
  }

  test("GroupTopKPruning: a select above the custom node prunes the scan") {
    import org.apache.spark.sql.graft.GroupTopK
    import org.apache.spark.sql.functions.col
    val plan = GroupTopK.topk(
        Tables.orders(spark, dir), 2,
        Seq("o_orderstatus"), Seq("o_totalprice" -> true))
      .select(col("o_orderkey"))
      .queryExecution.executedPlan.toString
    assert(plan.contains(
      "ReadSchema: struct<o_orderkey:bigint,o_orderstatus:string,o_totalprice:double>"),
      s"columns not pruned through GroupTopKPlan:\n$plan")
  }

  test("topk_global plans as TakeOrderedAndProject (no full sort)") {
    val plan = physical("topk_global")
    assert(plan.contains("TakeOrderedAndProject"), s"top-k not streamed:\n$plan")
  }

  test("sample_temperature: stratum rates reach the corpus via broadcast, not shuffle") {
    // the 5-row rate table must broadcast back onto documents — a
    // corpus-side hashpartitioning on lang would shuffle the whole
    // table to serve 5 rows of stratum metadata
    // (the lang exchanges further down feed the stratum groupBy and
    // carry post-combine partials — 5 rows per map partition — which
    // is the correct shape, not a corpus shuffle)
    val plan = physical("sample_temperature")
    assert(plan.contains("BroadcastHashJoin [lang"),
      s"rates join not broadcast on lang:\n$plan")
    val corpusSide = plan.split("BroadcastHashJoin")(0)
    assert(!corpusSide.contains("Exchange hashpartitioning"),
      s"corpus side shuffled above the rates join:\n$plan")
  }

  test("graph_pagerank: the persisted edge artifact joins with zero edge-side exchange") {
    // the link graph is a src-bucketed table; all 5 iteration joins
    // (and the degree distinct) must consume the bucket partitioning —
    // any hashpartitioning(src…) exchange means the corpus-scale edge
    // side reshuffles per round. Only the node-grain rank side and the
    // dst contribution agg may exchange.
    val plan = physical("graph_pagerank")
    assert(!plan.contains("hashpartitioning(src"),
      s"edge side reshuffled despite the bucketed artifact:\n$plan")
    assert(plan.contains("Exchange hashpartitioning(dst"),
      s"expected the per-round contribution exchanges on dst:\n$plan")
  }

  test("join_interval_overlap: equi join on the customer key, never a cross product") {
    // the interval predicate must ride as a residual condition on an
    // ordinary hash/merge join keyed by o_custkey — a nested-loop or
    // cartesian here would be n^2 over the whole orders table at scale
    val plan = physical("join_interval_overlap")
    assert(!plan.contains("CartesianProduct") && !plan.contains("NestedLoop"),
      s"interval overlap degenerated to a cross product:\n$plan")
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin")
      || plan.contains("BroadcastHashJoin"),
      s"expected an equi join keyed on o_custkey:\n$plan")
  }

  test("edit family: keys read the verified-pair artifact; the miner is a banded equi join") {
    // the miner (runs once per fingerprint inside editPairsTable):
    // equi join on the length band + thresholded levenshtein verify
    val mine = graft.llm.Dedup.editPairsMine(Tables.documents(spark, dir))
      .queryExecution.executedPlan.toString
    assert(!mine.contains("CartesianProduct") && !mine.contains("NestedLoop"),
      s"edit-distance miner degenerated to a cross product:\n$mine")
    assert(mine.contains("levenshtein"),
      s"thresholded levenshtein verify missing from the miner plan:\n$mine")
    // both serving keys amortize the verify through the artifact
    // (VERDICT r08 item 1a): no levenshtein re-evaluation in either
    // plan, and the artifact scan is present
    for (k <- Seq("dedup_edit_near", "dedup_edit_banded")) {
      val plan = physical(k)
      assert(!plan.contains("levenshtein"),
        s"$k re-runs the levenshtein verify instead of reading the artifact:\n$plan")
      assert(plan.contains("edit_pairs_"),
        s"$k does not scan the persisted verified-pair artifact:\n$plan")
    }
  }

  test("ngram family: consumers scan the shared counts artifact, never re-mine") {
    for (k <- Seq("dedup_ngram_jaccard", "dedup_containment",
        "dedup_weighted_jaccard", "dedup_retention_curve")) {
      val plan = physical(k)
      assert(plan.contains("ngram_counts_"),
        s"$k does not scan the persisted shared-counts artifact:\n$plan")
      // the mining fingerprint: the capped posting aggregate
      // (TopKByScore over xxhash64 ngram keys) must not appear in a
      // consumer plan
      assert(!plan.contains("topkbyscore") && !plan.contains("xxhash64"),
        s"$k re-runs the posting aggregate instead of reading the artifact:\n$plan")
    }
  }

  test("curate_incr family: the shared head reads the persisted artifact, never re-executes") {
    // incr / v2 / v3 compose the identical quality→sha→jaccard head;
    // each must scan the curate_head_ artifact — a sha2 or posting
    // probe in a consumer plan means the head re-executed
    for (k <- Seq("pipeline_curate_incr", "pipeline_curate_incr_v2",
        "pipeline_curate_incr_v3")) {
      val plan = physical(k)
      assert(plan.contains("curate_head_"),
        s"$k does not scan the persisted head artifact:\n$plan")
      assert(!plan.contains("sha2"),
        s"$k re-runs the exact-dedup hash stage instead of reading the artifact:\n$plan")
    }
  }

  test("round-10 artifacts: every family consumer scans its persisted table, never re-mines") {
    // incremental edit pairs (VERDICT r09 item 1a): both consumers
    // read incr_edit_pairs_; a levenshtein in either plan means the
    // quadratic band probe re-ran
    for (k <- Seq("dedup_incr_edit", "pipeline_curate_incr_v2")) {
      val plan = physical(k)
      assert(plan.contains("incr_edit_pairs_"),
        s"$k does not scan the persisted incremental edit-pair artifact:\n$plan")
      assert(!plan.contains("levenshtein"),
        s"$k re-runs the levenshtein verify instead of reading the artifact:\n$plan")
    }
    // DSIR featurization (VERDICT r09 item 5): both scorers read the
    // per-(doc, bucket) artifact; a Generate (token explode) in a
    // scorer plan means the corpus was re-featurized
    for (k <- Seq("sample_dsir", "sample_dsir_incr")) {
      val plan = physical(k)
      assert(plan.contains("dsir_b_"),
        s"$k does not scan the persisted DSIR featurization:\n$plan")
      assert(!plan.contains("Generate"),
        s"$k re-explodes the corpus instead of reading the featurization:\n$plan")
    }
    // redelivery disposition ledger: all three reports read it
    for (k <- Seq("stream_redelivery", "stream_dlq_ageout",
        "stream_redelivery_backoff")) {
      val plan = physical(k)
      assert(plan.contains("redeliver_"),
        s"$k does not scan the persisted disposition ledger:\n$plan")
    }
    // dup-span flag census: detector and scrubber read the same table;
    // the detector must not re-hash windows (its n_windows is map-side
    // arithmetic, its flags are the artifact)
    for (k <- Seq("text_dup_spans", "text_dup_spans_scrub")) {
      val plan = physical(k)
      assert(plan.contains("dup_spans_"),
        s"$k does not scan the persisted flag census:\n$plan")
    }
    assert(!physical("text_dup_spans").contains("xxhash64"),
      "the detector re-hashes windows instead of reading the census")
    // maximal-span merge (round 12): same artifact read, one
    // doc_id-keyed window, nothing corpus-keyed and no re-mining
    val es = physical("text_exact_substr")
    assert(es.contains("dup_spans_"),
      s"text_exact_substr does not scan the persisted flag census:\n$es")
    assert(!es.contains("xxhash64") && !es.contains("Join"),
      s"text_exact_substr must merge the artifact, not re-mine:\n$es")
  }

  test("stream_consumer_flow: permit gate is map-side arithmetic — no window, broadcast passes only") {
    val cf = physical("stream_consumer_flow")
    assert(!cf.contains("Window"),
      s"flow control must not rank with a window:\n$cf")
    assert(!cf.contains("CartesianProduct") &&
      !cf.contains("SortMergeJoin"),
      s"flow control: cursor joins must broadcast:\n$cf")
    assert("Exchange hashpartitioning".r.findAllIn(cf).size <= 1,
      s"flow control: expected at most the census exchange:\n$cf")
  }

  test("stream_publish_throttle: map-side slot arithmetic — no window, no join, bounded censuses") {
    val pt = physical("stream_publish_throttle")
    assert(!pt.contains("Window") && !pt.contains("Join"),
      s"publish throttle must be slot arithmetic, not ranking:\n$pt")
    assert("Exchange hashpartitioning".r.findAllIn(pt).size <= 2,
      s"publish throttle: unexpected corpus-keyed exchange:\n$pt")
    assert(pt.contains("partial_count") || pt.contains("partial_sum") ||
      pt.contains("HashAggregate"),
      s"publish throttle: slot census must partial-aggregate map-side:\n$pt")
  }

  test("source_seek_replay: the by-id cursor pushes into the scan; the by-time cursor broadcasts") {
    val plan = physical("source_seek_replay")
    assert(plan.contains("GreaterThanOrEqual(event_id,500)"),
      s"the literal message-id cursor must reach PushedFilters:\n$plan")
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"the resolved 1-row by-time cursor must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"cursor replay degenerated to a cartesian product:\n$plan")
  }

  test("obs_sub_backlog: broadcast inequality join, no corpus-keyed exchange before the 3-group agg") {
    val plan = physical("obs_sub_backlog")
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"the 3-row cursor table must broadcast through the inequality join:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"cursor join degenerated to a cartesian product:\n$plan")
    // the only shuffle is the 3-key final aggregate (plus the 1-row max)
    assert("Exchange hashpartitioning".r.findAllIn(plan).size <= 1,
      s"unexpected corpus-keyed exchange before the tiny aggregate:\n$plan")
  }

  test("source_topic_pattern: the regex subscription is partition pruning on the topic layout") {
    val plan = physical("source_topic_pattern")
    // the pattern must land in PartitionFilters (non-matching topics'
    // files are never opened) and the scan must read ONLY ts — the
    // provenance column is the partition value, not a data column
    assert(plan.contains("PartitionFilters: [isnotnull(topic") &&
      plan.contains("RLIKE(topic"),
      s"topic pattern did not reach PartitionFilters:\n$plan")
    assert(plan.contains("ReadSchema: struct<ts:timestamp>"),
      s"scan reads more than the ts column:\n$plan")
  }

  test("stream_producer_dedup: one producer-keyed shuffle feeds both windows") {
    // fixture rank + dedup watermark share the (producer, publish
    // order) partitioning — a second hash exchange would mean the
    // windows stopped sharing it
    val plan = physical("stream_producer_dedup")
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1,
      s"expected exactly one producer-keyed exchange:\n$plan")
    assert("Window ".r.findAllIn(plan).size == 2,
      s"expected the rank + high-watermark window pair:\n$plan")
  }

  test("filter_chunked_reassembly: map-side split, one (producer,seq) shuffle, partial object agg") {
    val plan = physical("filter_chunked_reassembly")
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1,
      s"expected exactly one reassembly-key exchange:\n$plan")
    // the bounded collect_list must combine map-side (partial_) before
    // the shuffle — per-group state is total_chunks-bounded
    assert(plan.contains("partial_collect_list"),
      s"chunk merge is not map-side partial:\n$plan")
    assert(plan.contains("Generate explode"),
      s"chunk split is not a map-side generate:\n$plan")
  }

  test("stream_msg_expiry: broadcast inequality passes only, no corpus-keyed exchange") {
    val plan = physical("stream_msg_expiry")
    assert(!plan.contains("CartesianProduct"),
      s"expiry join degenerated to a cartesian product:\n$plan")
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"the moved-cursor table must broadcast through the inequality joins:\n$plan")
    // the only hash exchanges are the two ≤4-group aggregates (expiry
    // count + post-expiry backlog); the moved-cursor subtree is
    // localCheckpoint-pinned so its corpus aggregates run once
    assert("Exchange hashpartitioning".r.findAllIn(plan).size <= 2,
      s"unexpected corpus-keyed exchange:\n$plan")
  }

  test("obs_ack_holes / obs_retention_trim: broadcast inequality passes, tiny aggregates only") {
    for (k <- Seq("obs_ack_holes", "obs_retention_trim")) {
      val plan = physical(k)
      assert(!plan.contains("CartesianProduct"),
        s"$k degenerated to a cartesian product:\n$plan")
      assert(plan.contains("BroadcastNestedLoopJoin"),
        s"$k: the cursor/trim table must broadcast through the inequality join:\n$plan")
      assert("Exchange hashpartitioning".r.findAllIn(plan).size <= 2,
        s"$k: unexpected corpus-keyed exchange:\n$plan")
    }
  }

  test("source_schema_evolution: map-side decode, one census exchange, no join") {
    val plan = physical("source_schema_evolution")
    assert(!plan.contains("Join"), s"decode must not join:\n$plan")
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1,
      s"expected exactly the census exchange:\n$plan")
    assert(plan.contains("from_json"), s"the evolved-schema decode is gone:\n$plan")
  }

  test("source_geo_replicated: union + one id-keyed dedup window + census, no cartesian") {
    val plan = physical("source_geo_replicated")
    assert(!plan.contains("CartesianProduct") && !plan.contains("Join"),
      s"the replication mesh must be a union, not a join:\n$plan")
    assert(plan.contains("Union"), s"missing the two-cluster union:\n$plan")
    assert("Exchange hashpartitioning".r.findAllIn(plan).size <= 2,
      s"expected the dedup window + census exchanges only:\n$plan")
  }

  test("filter_subscription_modes / source_partitioned_topic: map-side routing, census exchanges only") {
    // dispatch/routing is per-message map work — a join or a
    // corpus-keyed shuffle before the census would not survive broker
    // message rates
    for (k <- Seq("filter_subscription_modes", "source_partitioned_topic")) {
      val plan = physical(k)
      assert(!plan.contains("Join") || plan.contains("BroadcastNestedLoopJoin"),
        s"$k: routing must not join (1-row max broadcast excepted):\n$plan")
      assert(!plan.contains("CartesianProduct"),
        s"$k: routing degenerated to a cartesian product:\n$plan")
      assert("Exchange hashpartitioning".r.findAllIn(plan).size <= 2,
        s"$k: unexpected corpus-keyed exchange before the census:\n$plan")
    }
  }

  test("filter_txn_read_committed: the coordinator-ledger lookup is an equi join") {
    // read-committed visibility joins the txn ledger on txn_id — at
    // broker scale that join must be co-partitionable, never a
    // nested-loop over the message stream
    val plan = physical("filter_txn_read_committed")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"ledger lookup degenerated to a non-equi join:\n$plan")
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin")
      || plan.contains("BroadcastHashJoin"),
      s"expected an equi ledger join:\n$plan")
  }

  test("ts_ohlc / agg_histogram: one two-phase aggregation, no extra exchange") {
    for (k <- Seq("ts_ohlc", "agg_histogram")) {
      val plan = physical(k)
      assert("HashAggregate".r.findAllIn(plan).size >= 2,
        s"$k: expected partial+final HashAggregate:\n$plan")
      assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1,
        s"$k: expected exactly one agg exchange:\n$plan")
    }
  }

  test("graph_triangles: wedge joins are equi joins, never a cross product") {
    // the edge-iterator census must plan as ordinary hash/merge joins
    // on u and v (adjacency fetch per edge) — a nested-loop over the
    // edge set is n^2 at link-graph scale; the only CartesianProduct
    // allowed is the final 1-row × 1-row census assembly
    val plan = physical("graph_triangles")
    assert(!plan.contains("CartesianProduct"),
      s"wedge join degenerated to a cartesian product:\n$plan")
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin")
      || plan.contains("BroadcastHashJoin"),
      s"expected equi wedge joins:\n$plan")
    // the only nested-loop joins allowed are the 1-row census
    // assemblies (IdentityBroadcastMode over global aggregates)
    assert("BroadcastNestedLoopJoin".r.findAllIn(plan).size
      == "BroadcastExchange IdentityBroadcastMode".r.findAllIn(plan).size,
      s"nested-loop join outside the 1-row census assembly:\n$plan")
  }

  test("agg_ttest / agg_chi2: one corpus-wide shuffle; marginals broadcast back") {
    for (k <- Seq("agg_ttest", "agg_chi2")) {
      val plan = physical(k)
      // the only exchanges may carry post-combine partials (two-phase
      // agg) — the dimension-sized moment/marginal joins must broadcast
      assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
        s"$k: moment/marginal join not broadcast:\n$plan")
      assert("HashAggregate".r.findAllIn(plan).size >= 2,
        s"$k: expected partial+final HashAggregate:\n$plan")
    }
  }

  test("agg_corr_matrix: integer-partial reduction — bucket exchange + 1-row merge only") {
    // level 1 = LONG partials per hash bucket (two-phase), level 2 =
    // decimal merge of the ≤4096 partials (two-phase to one row); the
    // corpus is shuffled only as 4096-bucket partials, never as rows
    val plan = physical("agg_corr_matrix")
    val exchanges = "Exchange [A-Za-z]+".r.findAllIn(plan).toSeq
    assert(exchanges.size == 2 && exchanges.count(_.contains("SinglePartition")) == 1,
      s"expected the bucket exchange + the final 1-row exchange, got $exchanges:\n$plan")
    assert("HashAggregate".r.findAllIn(plan).size == 4,
      s"expected two two-phase HashAggregates:\n$plan")
  }

  test("text_repetition: every exchange is keyed by doc_id — nothing corpus-global") {
    val plan = physical("text_repetition")
    val exchanges = "Exchange hashpartitioning\\(([a-z0-9_]+)".r
      .findAllMatchIn(plan).map(_.group(1)).toSet
    assert(exchanges.subsetOf(Set("doc_id")),
      s"unexpected non-doc_id exchange keys $exchanges:\n$plan")
  }

  test("ts_anomaly_time: the rolling window partitions by (type, chunk), not type alone") {
    // the chunk key is what turns 5-series parallelism into
    // corpus-proportional parallelism; a window partitioned by
    // event_type alone would re-create the 5-task bottleneck
    val plan = physical("ts_anomaly_time")
    assert(plan.contains("windowspecdefinition(event_type") && plan.contains("chunk"),
      s"expected the (event_type, chunk) window partitioning:\n$plan")
  }

  test("filter_subscriptions: all selectors evaluate in one scan, no join, no hash shuffle") {
    val plan = physical("filter_subscriptions")
    assert("FileScan parquet".r.findAllIn(plan).size == 1,
      s"expected exactly one events scan for all subscriptions:\n$plan")
    assert(!plan.contains("Join"),
      s"the subscription table must be plan-compiled, never joined:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"fan-out must be map-side (only the output sort may exchange):\n$plan")
  }

  test("pipeline_dataset_card: per-doc signals map-side; post-reduction joins broadcast") {
    val plan = physical("pipeline_dataset_card")
    // no explode anywhere (token counts via size(split), not unnest)
    assert(!plan.contains("Generate explode"),
      s"dataset card should never explode the token stream:\n$plan")
    // the langs + corpus-total joins onto the source-grain base must
    // be broadcast — sources are dimension-sized
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 1
      && plan.contains("BroadcastNestedLoopJoin"),
      s"post-reduction joins not broadcast:\n$plan")
  }

  test("text_vocab_coverage: the single-partition window runs over the reduced vocab") {
    // the corpus-wide token stream must be reduced by a two-phase
    // groupBy BEFORE the rank window's single-partition exchange
    val plan = physical("text_vocab_coverage")
    val singleIdx = plan.indexOf("Exchange SinglePartition")
    assert(singleIdx >= 0, s"expected the vocab rank window:\n$plan")
    val below = plan.substring(singleIdx)
    assert("HashAggregate".r.findAllIn(below).size >= 2,
      s"rank window not fed by the reduced vocab aggregate:\n$plan")
  }

  test("agg_gini: the rank window partitions by (priority, bucket), offsets broadcast") {
    // the two-phase rank's parallelism claim is only real if the sort
    // exchange carries the bucket key — a priority-only partitioning
    // would be the 5-task ceiling the rewrite exists to remove
    val plan = physical("agg_gini")
    assert(plan.contains("hashpartitioning(o_orderpriority") &&
      plan.matches("(?s).*hashpartitioning\\(o_orderpriority[^)]*bkt.*"),
      s"rank window not partitioned by (priority, bucket):\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"prefix offsets not broadcast:\n$plan")
  }

  test("agg_mad_ranked: hot-bucket pruning broadcasts; no per-group value buffer aggregate") {
    val plan = physical("agg_mad_ranked")
    // the only joins against the corpus are broadcast (hot buckets +
    // the two dimension-sized median frames)
    assert(plan.contains("BroadcastHashJoin"),
      s"hot-bucket prune not broadcast:\n$plan")
    assert(!plan.contains("percentile"),
      s"buffering percentile aggregate leaked into the bufferless twin:\n$plan")
  }

  test("sql_tpch_q2/q11 read the persisted derived-partsupp artifact, never lineitem") {
    // VERDICT r07 item 4: Catalyst re-derived the partsupp CTE per
    // reference (2 lineitem aggregations per query); both consumers
    // must now scan the bucketed tpch_ps_ table exclusively
    for (key <- Seq("sql_tpch_q2", "sql_tpch_q11")) {
      val plan = physical(key)
      assert(plan.contains("tpch_ps_"),
        s"$key does not scan the persisted partsupp artifact:\n$plan")
      assert(!plan.contains("lineitem"),
        s"$key still aggregates lineitem per consumer:\n$plan")
    }
  }

  test("pipeline_curate_v2 reads the persisted curated-reps artifact, not the curate chain") {
    val plan = physical("pipeline_curate_v2")
    assert(plan.contains("curate_reps_"),
      s"not reading the persisted artifact:\n$plan")
    // the curate head's signature ops must be absent: no sha2 exact
    // dedup, no posting-list aggregation — those ran in the one-time
    // artifact build, not per query
    assert(!plan.contains("sha2"), s"curate head recomputed:\n$plan")
  }

  test("dedup_cross_source reads the persisted pair table and stays dimension-sized") {
    val plan = physical("dedup_cross_source")
    assert(plan.contains("dup_pairs_"),
      s"not reading the persisted pair table:\n$plan")
    assert(!plan.contains("collect_list"),
      s"pair mining recomputed in the report query:\n$plan")
  }

  test("sql_tpch_q2: the correlated scalar-MIN decorrelates to a two-phase aggregate join") {
    val plan = physical("sql_tpch_q2")
    assert(!plan.contains("CartesianProduct"),
      s"decorrelation failed — cartesian in plan:\n$plan")
    // the per-part MIN must run partial+final, and the kept prefix must
    // be the deterministic top-100 (total ORDER BY → TakeOrdered)
    assert(plan.contains("partial_min"), s"min not two-phase:\n$plan")
    assert(plan.contains("TakeOrderedAndProject(limit=100"),
      s"top-100 not a TakeOrdered:\n$plan")
  }

  test("sql_tpch_q21: EXISTS and NOT EXISTS plan as semi/anti equi joins on the order key") {
    val plan = physical("sql_tpch_q21")
    assert(plan.contains("LeftSemi"), s"EXISTS not a semi join:\n$plan")
    assert(plan.contains("LeftAnti"), s"NOT EXISTS not an anti join:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("NestedLoop"),
      s"self-correlation fell off the equi-join path:\n$plan")
  }

  test("sql_tpch_q16: NOT IN plans as an anti join; distinct supplier count is two-phase") {
    val plan = physical("sql_tpch_q16")
    assert(plan.contains("LeftAnti"), s"NOT IN not an anti join:\n$plan")
    assert(plan.contains("partial_count(distinct"),
      s"count-distinct not two-phase:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("NestedLoop"),
      s"NOT IN fell back to a nested loop:\n$plan")
  }

  test("sample_dsir: the bucket census broadcasts; top-100 is a TakeOrdered, not a full sort") {
    val plan = physical("sample_dsir")
    assert(plan.contains("BroadcastHashJoin"),
      s"the 64-row importance table must broadcast, never shuffle-join:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-100 selection not a TakeOrdered:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"a corpus-side sort-merge join crept into the selection path:\n$plan")
  }

  test("text_classifier_score: the weight table broadcasts; the logit agg is two-phase") {
    val plan = physical("text_classifier_score")
    assert(plan.contains("BroadcastHashJoin"),
      s"the 2^k weight vector must broadcast to the token stream:\n$plan")
    assert(plan.contains("partial_sum"),
      s"logit aggregation not map-side partial:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"weight lookup fell off the broadcast path:\n$plan")
  }

  test("dedup_semantic / sim_knn_graph read the persisted kNN-graph artifact, not the scoring pass") {
    // the curatePairsTable discipline: the graph is a materialized
    // product; consumers must scan it, never re-run the scoring pass.
    // dedup_semantic's FINAL plan shows checkpointed component labels
    // (Cluster.components materializes eagerly), so the table-scan
    // check applies to the graph report; the no-rescoring check
    // applies to both.
    val graphPlan = physical("sim_knn_graph")
    assert(graphPlan.contains("knn_graph_exact"),
      s"sim_knn_graph does not scan the persisted graph:\n$graphPlan")
    for (key <- Seq("dedup_semantic", "sim_knn_graph")) {
      val plan = physical(key)
      assert(!plan.toLowerCase.contains("dotproduct"),
        s"$key recomputes the scoring pass:\n$plan")
    }
  }

  test("join_asof_nearest: bidirectional carry is windows over ONE exchange — no join at all") {
    // nearest-as-of via a range join would enumerate |Δ| ≤ tolerance
    // pairs; the carry form unions the kinds into one sorted stream,
    // so the physical plan must contain window operators and exactly
    // one hash exchange on user_id — and NO join operator
    val plan = physical("join_asof_nearest")
    assert(plan.contains("Window"), s"carry windows missing:\n$plan")
    assert(!plan.contains("Join"),
      s"nearest-as-of fell back to a join:\n$plan")
    assert("Exchange hashpartitioning\\(user_id".r.findAllIn(plan).size == 1,
      s"expected exactly one user_id exchange:\n$plan")
  }

  test("filter_keyshared: hash-range routing is map-side — one scan, no join") {
    val plan = physical("filter_keyshared")
    assert("FileScan parquet".r.findAllIn(plan).size == 1,
      s"expected exactly one events scan:\n$plan")
    assert(!plan.contains("Join"),
      s"consumer ranges must be plan-compiled, never joined:\n$plan")
  }

  test("text_bm25_topk: scoring is shuffle-free — stats broadcast back, top-k as TakeOrdered") {
    val plan = physical("text_bm25_topk")
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-10 must be a TakeOrderedAndProject, not a global sort:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"the 1-row stats side must broadcast, never shuffle-join:\n$plan")
    // the only shuffle allowed is the 1-row stats aggregate's
    // partial→final exchange (SinglePartition)
    val exchanges = "Exchange [a-z]+".r.findAllIn(plan).toSeq
    assert(exchanges.forall(_.contains("Exchange SinglePartition")),
      s"corpus-side shuffle in a map-side scorer: $exchanges\n$plan")
  }

  test("text_bm25_incr: probe reads BOTH lexicon artifacts; delta side broadcast-joins the stats row") {
    val plan = physical("text_bm25_incr")
    assert(plan.contains("bm25_lexidx_"),
      s"term df must come from the persisted lexicon:\n$plan")
    assert(plan.contains("bm25_statidx_"),
      s"corpus stats must come from the persisted stats table:\n$plan")
    // the literal-key equi join constant-folds to a nested-loop over
    // the 1-row broadcast build side — either broadcast form is the
    // right plan; a shuffle join is not
    assert(plan.contains("BroadcastHashJoin")
        || plan.contains("BroadcastNestedLoopJoin"),
      s"the folded stats row must broadcast onto the delta scan:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"nothing in the ingest scorer may shuffle-join:\n$plan")
  }

  test("ann_query_rrf: vector list rides the persisted SRP serving index") {
    val plan = physical("ann_query_rrf")
    assert(plan.contains("ann_embidx_"),
      s"served candidates must come from the persisted SRP index artifacts:\n$plan")
  }

  test("pipeline_shard_sized: corpus cumsum partitions by bucket; offsets broadcast") {
    // the two-phase prefix sum's parallelism claim: the corpus-sized
    // window must carry the bucket key (64-way), the only
    // SinglePartition stage is the 64-row bucket-offset window, and
    // the offsets rejoin the corpus as a broadcast
    val plan = physical("pipeline_shard_sized")
    assert(plan.contains("hashpartitioning(bkt"),
      s"corpus window not partitioned by bucket:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"bucket offsets not broadcast:\n$plan")
    val singleIdx = plan.indexOf("Exchange SinglePartition")
    assert(singleIdx >= 0, s"expected the 64-row offset window:\n$plan")
    assert(plan.substring(singleIdx).contains("HashAggregate"),
      s"the SinglePartition window must sit over the 64-row bucket aggregate, not the corpus:\n$plan")
  }

  test("sample_neyman: the 5-row allocation broadcasts; rank window partitions by stratum") {
    val plan = physical("sample_neyman")
    assert(plan.contains("BroadcastHashJoin"),
      s"allocation table must broadcast onto the corpus:\n$plan")
    assert(plan.contains("hashpartitioning(lang"),
      s"rank window must partition by stratum:\n$plan")
  }

  test("text_bpe_compression: vocab segments once and broadcasts; corpus shuffles only for the lang agg") {
    val plan = physical("text_bpe_compression")
    // the replace cascade runs on the DISTINCT vocab (tok-keyed
    // exchange), which then broadcasts onto the exploded corpus
    assert(plan.contains("hashpartitioning(tok"),
      s"vocab distinct must be tok-keyed:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"segmented vocab must broadcast onto the corpus:\n$plan")
    // corpus side: explode → join → two-phase lang agg; no other
    // corpus-sized exchange
    assert(plan.contains("partial_count") && plan.contains("hashpartitioning(lang"),
      s"lang aggregate must be two-phase:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"corpus must not shuffle for the vocab join:\n$plan")
  }

  test("fn_sql_udtf: the LATERAL table function decorrelates to joins, never a per-row subquery") {
    val plan = physical("fn_sql_udtf")
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"lateral call must not plan as a nested loop:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"decorrelated lateral must be an equi join:\n$plan")
    assert(plan.contains("partial_sum"),
      s"the per-order aggregate must run two-phase over lineitem:\n$plan")
  }

  test("dedup_weighted_jaccard: tf join consumes admitted pairs only; minsum is two-phase") {
    val plan = physical("dedup_weighted_jaccard")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"weighted rescoring must never cross-join:\n$plan")
    // the set-Jaccard >= 0.3 admission must sit BELOW (deeper than)
    // the token-frequency join, so the tf stream is the near-dup
    // pairs, never the full candidate set (the measured 35-67s trap)
    val tfJoinAt = plan.indexOf("tok#")
    val admissionAt = plan.indexOf(">= 0.3")
    assert(tfJoinAt >= 0 && admissionAt >= 0,
      s"expected both the tf join and the admission predicate:\n$plan")
    assert(admissionAt > tfJoinAt,
      s"admission filter must be a child of the tf join, not above it:\n$plan")
    assert(plan.contains("partial_sum(least(tfa"),
      s"the min-tf sum must run partial+final:\n$plan")
  }

  test("wave-4 broker keys: broadcast inequality passes, bounded exchanges, pruned scans") {
    // stream_batch_index_ack: corpus work happens once behind the
    // eager entry-frame checkpoint; the visible plan is the 1-row
    // markDelete broadcast + single-partition final aggregate
    val bia = physical("stream_batch_index_ack")
    assert(bia.contains("BroadcastNestedLoopJoin") &&
      !bia.contains("CartesianProduct"), s"batch_index_ack:\n$bia")
    assert(!bia.contains("Exchange hashpartitioning"),
      s"batch_index_ack: corpus-keyed exchange leaked past the entry frame:\n$bia")

    // obs_backlog_quota / stream_dispatch_throttle: the cursor table
    // broadcasts through the inequality join (no corpus-keyed shuffle),
    // the only hash exchange is the ≤4-group census, and the corpus
    // scan prunes to the position column alone
    for (k <- Seq("obs_backlog_quota", "stream_dispatch_throttle")) {
      val plan = physical(k)
      assert(plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"), s"$k:\n$plan")
      assert("Exchange hashpartitioning".r.findAllIn(plan).size <= 1,
        s"$k: unexpected corpus-keyed exchange:\n$plan")
      assert(plan.contains("ReadSchema: struct<event_id:bigint>"),
        s"$k: the drain pass must scan positions only:\n$plan")
    }

    // source_tiered_offload: map-side tiering off a 1-row broadcast
    // max; the countDistinct pair of exchanges is partial-aggregated
    // to ~n_ledgers rows before shuffling
    val to = physical("source_tiered_offload")
    assert(to.contains("BroadcastNestedLoopJoin") &&
      !to.contains("CartesianProduct"), s"tiered_offload:\n$to")
    assert("Exchange hashpartitioning".r.findAllIn(to).size <= 2,
      s"tiered_offload: unexpected exchange:\n$to")
    assert(to.contains("partial_count(distinct"),
      s"tiered_offload: ledger count must partial-aggregate map-side:\n$to")

    // obs_bundle_split: everything after the 5-group census runs on
    // checkpointed ≤5-row broadcast frames
    val bs = physical("obs_bundle_split")
    assert(!bs.contains("CartesianProduct"), s"bundle_split:\n$bs")
    assert("Exchange hashpartitioning".r.findAllIn(bs).size <= 1,
      s"bundle_split: unexpected exchange:\n$bs")

    // stream_consumer_priority: the rank window partitions by tick,
    // never globally
    val cp = physical("stream_consumer_priority")
    assert(cp.contains("Window"), s"consumer_priority:\n$cp")
    assert(!cp.contains("SinglePartition"),
      s"consumer_priority: no global single-partition stage belongs here:\n$cp")

    // stream_ack_timeout: the whole ladder is map-side arithmetic —
    // no loop, no join, one census exchange
    val at = physical("stream_ack_timeout")
    assert(!at.contains("Join"), s"ack_timeout must not join:\n$at")
    assert("Exchange hashpartitioning".r.findAllIn(at).size == 1,
      s"ack_timeout: expected exactly the census exchange:\n$at")

    // obs_cumulative_ack: same ledger shape as obs_ack_holes —
    // broadcast inequality passes, tiny aggregates only; the range
    // census is row-local arithmetic (no self-join, no window)
    val ca = physical("obs_cumulative_ack")
    assert(ca.contains("BroadcastNestedLoopJoin") &&
      !ca.contains("CartesianProduct"), s"cumulative_ack:\n$ca")
    assert(!ca.contains("Window"),
      s"cumulative_ack: the run census must not need a window:\n$ca")
    assert("Exchange hashpartitioning".r.findAllIn(ca).size <= 2,
      s"cumulative_ack: unexpected corpus-keyed exchange:\n$ca")

    // quality_threshold_curve (r12 single-pass form): ONE scan, 14
    // conditional aggregates to a single row, literal reshape — no
    // grid join, no corpus-keyed exchange at all
    val qc = physical("quality_threshold_curve")
    assert(!qc.contains("Join"), s"threshold_curve must not join:\n$qc")
    assert("Scan parquet".r.findAllIn(qc).size == 1,
      s"threshold_curve: expected exactly one scan:\n$qc")
    assert("Exchange hashpartitioning".r.findAllIn(qc).isEmpty,
      s"threshold_curve: unexpected corpus-keyed exchange:\n$qc")

    // obs_topic_stats: one scan, no join; the countDistinct pair
    // partial-aggregates before shuffling
    val ts = physical("obs_topic_stats")
    assert(!ts.contains("Join"), s"topic_stats must not join:\n$ts")
    assert("Exchange hashpartitioning".r.findAllIn(ts).size <= 2,
      s"topic_stats: unexpected exchange:\n$ts")

    // dedup_epoch_interaction: the dedup side shuffles hash-keyed with
    // map-side partials; the plan arithmetic joins ≤5-row frames
    val de = physical("dedup_epoch_interaction")
    assert(!de.contains("CartesianProduct"), s"epoch_interaction:\n$de")
    assert(de.contains("partial_min") || de.contains("partial_sum"),
      s"epoch_interaction: dedup census must partial-aggregate map-side:\n$de")
  }

  test("sample_cluster_balanced: the cap prunes map-side via WindowGroupLimit; window partitions by cell") {
    val plan = physical("sample_cluster_balanced")
    assert(plan.contains("WindowGroupLimit"),
      s"rank<=cap must push into a group limit (map-side top-cap pruning):\n$plan")
    assert(plan.contains("hashpartitioning(cell"),
      s"the rank window must partition by cell, never globally:\n$plan")
    assert(!plan.contains("SinglePartition"),
      s"no global single-partition stage belongs in this plan:\n$plan")
  }
}
