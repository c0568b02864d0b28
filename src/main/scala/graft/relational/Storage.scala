package graft.relational

import graft.{QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Physical-layout operators — the storage-side half of the 100 TB
  * story: partition pruning (a filter on the partition column prunes
  * whole directories before any I/O) and bucketed co-located joins (two
  * tables pre-bucketed on the join key join with ZERO shuffle — the
  * layout a 1000-executor fact-fact join needs). PlanSpec asserts both
  * plan shapes: PartitionFilters on the pruned scan, no Exchange under
  * the bucketed SortMergeJoin.
  *
  * Both keys write their layout once per (layout, sfDir) — guarded like
  * the csv/json roundtrips — so repeated bench invocations only read.
  */
object Storage extends QueryPack {

  // no dots: the key is also used in table identifiers
  private def key(dir: String): String = Tables.pathKey(dir)

  /** documents re-written as lang-partitioned parquet, once per
    * (sfDir, source fingerprint) — regenerated fixtures invalidate. */
  private[relational] def partitionedDocs(s: SparkSession, dir: String): String = {
    val path = s"/tmp/graft_part_docs_${key(dir)}_${Tables.fingerprint(dir, "documents")}"
    if (!Files.exists(Paths.get(path, "_SUCCESS"))) {
      Tables.documents(s, dir)
        .write.mode("overwrite").partitionBy("lang").parquet(path)
    }
    path
  }

  /** orders+customer saved as parquet tables bucketed on the join key,
    * once per session catalog (in-memory catalog → once per process; a
    * fresh process finds the catalog empty but the managed location
    * still on disk, so stale locations are removed before rewriting). */
  private[relational] def bucketedTables(s: SparkSession, dir: String): (String, String) = {
    // both source fingerprints in the key: a regenerated customer.parquet
    // (orders unchanged) must invalidate the cached layout too
    val fp = key(Tables.fingerprint(dir, "orders") + "_" + Tables.fingerprint(dir, "customer"))
    val (ot, ct) = (s"orders_b_${key(dir)}_$fp", s"customer_b_${key(dir)}_$fp")
    if (!s.catalog.tableExists(ot)) {
      val wh = java.net.URI.create(s.conf.get("spark.sql.warehouse.dir")) match {
        case u if u.getScheme == "file" => Paths.get(u)
        case u if u.getScheme == null => Paths.get(u.getPath)
        case u => Paths.get(u.getPath)
      }
      Seq(ot, ct).map(wh.resolve).filter(Files.exists(_)).foreach { p =>
        import scala.jdk.CollectionConverters._
        Files.walk(p).sorted(java.util.Comparator.reverseOrder())
          .iterator().asScala.foreach(Files.delete)
      }
      Tables.orders(s, dir).write.mode("overwrite")
        .bucketBy(8, "o_custkey").sortBy("o_custkey")
        .format("parquet").saveAsTable(ot)
      Tables.customer(s, dir).write.mode("overwrite")
        .bucketBy(8, "c_custkey").sortBy("c_custkey")
        .format("parquet").saveAsTable(ct)
    }
    (ot, ct)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // partition pruning: the lang predicate selects directories, not
    // rows — PushedFilters never even sees it (PlanSpec "scan_partitioned")
    "scan_partitioned" -> ((s, dir) => {
      val path = partitionedDocs(s, dir)
      graft.Tables.cachedParquet(s, path)
        .where(col("lang") === "en")
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .orderBy("doc_id")
    }),

    // dynamic partition pruning: the fact side is lang-partitioned; the
    // dim filter (grp = 1) is only known at runtime, yet the fact scan
    // still skips non-matching lang directories — Catalyst turns the
    // broadcast build side into a runtime IN-filter on the partition
    // column (PlanSpec asserts the dynamicpruning expression in the
    // scan). At 100 TB this is the difference between scanning every
    // partition of a fact table and scanning the two the dims select.
    "scan_dpp" -> ((s, dir) => {
      import s.implicits._
      val path = partitionedDocs(s, dir)
      // the dim must be a real datasource: over a LocalRelation the
      // grp filter constant-folds into the relation and DPP's
      // selective-predicate check never sees it. Path keyed on the row
      // content (ADVICE r04: a fixed version suffix would silently keep
      // serving stale parquet if the rows were ever edited).
      val dimRows = Seq(("en", 1), ("fr", 2), ("zh", 2))
      val dimPath = s"/tmp/graft_dpp_dims_${Integer.toHexString(dimRows.hashCode)}"
      if (!Files.exists(Paths.get(dimPath, "_SUCCESS"))) {
        Tables.dropStalePaths("graft_dpp_dims_")
        dimRows.toDF("lang", "grp")
          .coalesce(1).write.mode("overwrite").parquet(dimPath)
      }
      graft.Tables.cachedParquet(s, path)
        .join(graft.Tables.cachedParquet(s, dimPath).where(col("grp") === 1), Seq("lang"))
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .orderBy("doc_id")
    }),

    // dynamic partition overwrite — the production "replace one day's
    // partitions, leave the rest" sink: write the full lang-partitioned
    // table, then OVERWRITE only the 'en' partition with transformed
    // rows (partitionOverwriteMode=dynamic as a WRITE option, so only
    // partitions present in the incoming frame are replaced). The read-
    // back must show exactly en-updated + others-intact, which is what
    // the oracle checks. Both writes rerun per call — the key IS the
    // sink behavior, not a cached layout.
    "sink_dynamic_overwrite" -> ((s, dir) => {
      val path = s"/tmp/graft_dynover_${key(dir)}"
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("n_chars"), col("lang"))
      docs.write.mode("overwrite").partitionBy("lang").parquet(path)
      docs.where(col("lang") === "en")
        .withColumn("n_chars", col("n_chars") + 1000L)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("lang").parquet(path)
      s.read.parquet(path)
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .orderBy("doc_id")
    }),

    // upsert (MERGE) into a parquet table, composed from primitives —
    // vanilla parquet has no MERGE INTO, so the engine expresses it as
    // base ⟗ updates with per-column coalesce, rewritten atomically:
    // updates win on matched keys, inserts append, untouched rows ride
    // through. One shuffle on the merge key; at 100 TB the rewrite
    // scopes to the partitions the updates touch (the sink above).
    "sink_upsert" -> ((s, dir) => {
      val path = s"/tmp/graft_upsert_${key(dir)}"
      val base = Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
      val upserts = base.where(col("c_custkey") % 10 === 0)
        .select(col("c_custkey"), col("c_name"),
          (col("c_acctbal") + 100d).as("c_acctbal"))
        // insert keys live in a namespace DISJOINT from any possible
        // base key (custkeys are non-negative at every SF): a fixed
        // positive offset would collide once the table reaches it
        .unionByName(base.where(col("c_custkey") < 5)
          .select((-col("c_custkey") - 1L).as("c_custkey"),
            concat(col("c_name"), lit("_new")).as("c_name"), col("c_acctbal")))
      base.join(upserts
            .select(col("c_custkey"), col("c_name").as("u_name"),
              col("c_acctbal").as("u_acctbal")),
          Seq("c_custkey"), "full_outer")
        .select(col("c_custkey"),
          coalesce(col("u_name"), col("c_name")).as("c_name"),
          coalesce(col("u_acctbal"), col("c_acctbal")).as("c_acctbal"))
        .write.mode("overwrite").parquet(path)
      s.read.parquet(path).orderBy("c_custkey")
    }),

    // Small-file compaction (VERDICT r04 next item 7): bin-pack a
    // fragmented table into ~target-size files, results unchanged —
    // the first operational fix a 100 TB pipeline needs once streaming
    // and dynamic-partition sinks accumulate thousands of tiny files.
    // The fragmented state (64 shards) is a write-once fixture layout;
    // the compaction itself re-runs per call: list file sizes (driver
    // metadata only, no data read), nOut = ceil(bytes/target), then
    // scan → coalesce(nOut) → rewrite. coalesce concatenates input
    // partitions WITHOUT a shuffle — exactly what OPTIMIZE-style
    // bin-packing wants, since there is no key to place rows by; at
    // cluster scale the same job runs per partition-directory.
    "sink_compact" -> ((s, dir) => {
      import scala.jdk.CollectionConverters._
      val fragPfx = s"graft_frag_orders_${key(dir)}_"
      val frag = s"/tmp/$fragPfx${Tables.fingerprint(dir, "orders")}"
      if (!Files.exists(Paths.get(frag, "_SUCCESS"))) {
        Tables.dropStalePaths(fragPfx)
        Tables.orders(s, dir).repartition(64)
          .write.mode("overwrite").parquet(frag)
      }
      val target = 256L * 1024 // fixture-scaled stand-in for ~256 MB
      val bytes = {
        val st = Files.list(Paths.get(frag))
        try st.iterator().asScala
          .filter(_.getFileName.toString.endsWith(".parquet"))
          .map(Files.size(_)).sum
        finally st.close()
      }
      val scan = s.read.parquet(frag)
      // coalesce can only REDUCE partition count: the scan's own file
      // packing may already bin the small files into fewer (larger-
      // than-target) partitions, in which case that packing IS the
      // compaction granularity and coalesce is a no-op — so the real
      // output count is min(ceil(bytes/target), scan partitions)
      val nOut = math.max(1, math.min(
        math.ceil(bytes.toDouble / target).toInt,
        scan.rdd.getNumPartitions))
      val out = s"/tmp/graft_compact_orders_${key(dir)}"
      scan.coalesce(nOut)
        .write.mode("overwrite").parquet(out)
      s.read.parquet(out)
        .select(col("o_orderkey"), col("o_custkey"),
          col("o_orderstatus"), col("o_totalprice"))
        .orderBy("o_orderkey")
    }),

    // Snapshot-isolated versioned table (time travel) — the lakehouse
    // metadata pattern (the Iceberg/Delta snapshot model) composed
    // from primitives, since vanilla parquet has no versions: data
    // files are IMMUTABLE, each version is a MANIFEST (a
    // metadata-sized file list), and a writer commits by writing NEW
    // files for only the partitions it touches plus a manifest that
    // references every untouched file unchanged (copy-on-write).
    // Readers resolve a version by loading its manifest (driver-side,
    // metadata-sized — never the data) and scanning exactly the
    // listed files, so old versions stay readable after any commit
    // and a reader can never observe a half-commit (the _COMMITTED
    // marker lands last). Here: v0 = orders snapshotted into three
    // status partitions; v1 = copy-on-write of the 'O' partition only
    // (5 % price adjustment) — the F and P data files are SHARED
    // bytes between the two manifests. The key reads BOTH versions
    // through their manifests and emits the per-(version, status)
    // report; the oracle recomputes both version states from the
    // original table, so a hash match proves v0 is untouched by the
    // v1 commit AND v1 rewrote exactly the 'O' partition. At 100 TB
    // the same commit touches one partition's files out of thousands
    // and the manifest swap is O(metadata).
    "sink_time_travel" -> ((s, dir) => {
      val pfx = s"graft_tt_orders_${key(dir)}_"
      val root = s"/tmp/$pfx${Tables.fingerprint(dir, "orders")}"
      if (!Files.exists(Paths.get(root, "_COMMITTED"))) {
        Tables.dropStalePaths(pfx)
        val base = Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        for (st <- Seq("O", "F", "P"))
          base.where(col("o_orderstatus") === st)
            .write.mode("overwrite").parquet(s"$root/data/v0_$st")
        base.where(col("o_orderstatus") === "O")
          .withColumn("o_totalprice", col("o_totalprice") * 0.95)
          .write.mode("overwrite").parquet(s"$root/data/v1_O")
        Files.writeString(Paths.get(root, "manifest_v0.txt"),
          Seq("data/v0_O", "data/v0_F", "data/v0_P").mkString("\n"))
        Files.writeString(Paths.get(root, "manifest_v1.txt"),
          Seq("data/v1_O", "data/v0_F", "data/v0_P").mkString("\n"))
        Files.createFile(Paths.get(root, "_COMMITTED"))
      }
      def atVersion(v: Int): DataFrame = {
        val entries = Files.readString(Paths.get(root, s"manifest_v$v.txt"))
          .split("\n").toSeq
        s.read.parquet(entries.map(e => s"$root/$e"): _*)
      }
      // integer-cents accumulation (Stable.lsumTerm): the v1 prices
      // carry a *0.95 product whose DECIMAL(28,2) cast lands on a
      // half-rounding boundary the two engines resolve differently
      // (measured: one cent per ~500 rows) — floor(x·100 + 0.5) is the
      // same IEEE expression on both
      def report(v: Int): DataFrame = atVersion(v)
        .groupBy(col("o_orderstatus").as("status"))
        .agg(count(lit(1)).as("cnt"),
          sum(Stable.lsumTerm(col("o_totalprice"), 2)).as("price_cents"))
        .select(lit(v).as("version"), col("status"),
          col("cnt"), col("price_cents"))
      report(0).unionByName(report(1)).orderBy("version", "status")
    }),

    // bucketed co-located join: both sides pre-bucketed on the key, so
    // the SortMergeJoin reads bucket i against bucket i — no Exchange
    // anywhere in the plan (PlanSpec "join_bucketed"). The merge hint
    // keeps the small fixture side from broadcasting, which would hide
    // the layout being demonstrated.
    "join_bucketed" -> ((s, dir) => {
      val (ot, ct) = bucketedTables(s, dir)
      s.table(ot).hint("merge")
        .join(s.table(ct).hint("merge"), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"),
          Stable.dsum(col("o_totalprice")).as("sum_price"))
        .orderBy("c_mktsegment")
    })
  )

  val oracleSql: Map[String, String] = Map(
    // oracle reads the ORIGINAL documents table: partitioning must not
    // change results, only plan shape
    "scan_partitioned" ->
      """SELECT doc_id, lang, n_chars FROM documents
        |WHERE lang = 'en' ORDER BY doc_id""".stripMargin,

    "scan_dpp" ->
      """SELECT doc_id, lang, n_chars
        |FROM documents
        |JOIN (VALUES ('en', 1), ('fr', 2), ('zh', 2)) AS dims(lang, grp) USING (lang)
        |WHERE grp = 1
        |ORDER BY doc_id""".stripMargin,

    // expected state after the partial overwrite: en rows transformed,
    // every other lang untouched
    "sink_dynamic_overwrite" ->
      """SELECT doc_id, lang,
        |  CASE WHEN lang = 'en' THEN n_chars + 1000 ELSE n_chars END AS n_chars
        |FROM documents ORDER BY doc_id""".stripMargin,

    // expected merged state: updates win on matched keys, inserts
    // append, the rest ride through
    // compaction must be invisible to readers: oracle is the source table
    "sink_compact" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "sink_upsert" ->
      """SELECT c_custkey, c_name,
        |  CASE WHEN c_custkey % 10 = 0 THEN c_acctbal + 100 ELSE c_acctbal END
        |    AS c_acctbal
        |FROM customer
        |UNION ALL
        |SELECT -c_custkey - 1, c_name || '_new', c_acctbal
        |FROM customer WHERE c_custkey < 5
        |ORDER BY c_custkey""".stripMargin,

    "join_bucketed" ->
      """SELECT c_mktsegment, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS sum_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    // both version states recomputed from the original table: v0 must
    // be byte-equivalent to the pre-commit snapshot (the v1 commit
    // can't have leaked into shared files), v1 must show the 'O'
    // rewrite and nothing else
    "sink_time_travel" ->
      """SELECT 0 AS version, o_orderstatus AS status, COUNT(*) AS cnt,
        |  CAST(SUM(CAST(FLOOR(o_totalprice * 1.0E2 + 0.5) AS BIGINT)) AS BIGINT)
        |    AS price_cents
        |FROM orders GROUP BY 2
        |UNION ALL
        |SELECT 1, o_orderstatus, COUNT(*),
        |  CAST(SUM(CAST(FLOOR((CASE WHEN o_orderstatus = 'O'
        |                            THEN o_totalprice * 0.95
        |                            ELSE o_totalprice END) * 1.0E2 + 0.5)
        |               AS BIGINT)) AS BIGINT)
        |FROM orders GROUP BY 2
        |ORDER BY version, status""".stripMargin
  )
}
