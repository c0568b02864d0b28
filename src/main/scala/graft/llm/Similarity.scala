package graft.llm

import graft.{QueryPack, Tables}
import graft.functions.DotProduct.dot
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over the embedding column (SURVEY.md §2.11).
  *
  * The exact pairwise/top-k queries are the correctness baseline: a
  * pruned pair join where the inner loop is the native codegen'd
  * DotProduct expression with norms precomputed once per vector (the
  * naive zip_with/aggregate form profiled ~40 µs/pair — minutes at n²).
  *
  * The 100 TB path is sim_lsh_ann: sign-random-projection LSH (the
  * cosine-distance LSH family) — L tables × b sign bits per table,
  * candidates from a bucket equi-join, exact cosine re-check after. At
  * cluster scale the bucket join shuffles each vector L times instead
  * of enumerating n² pairs; an IVF layout would be the same shape with
  * learned centroids instead of random planes.
  */
object Similarity extends QueryPack {

  /** Embeddings as double arrays with precomputed norms, re-spread from
    * the single-file fixture so self-joins parallelize. */
  private def vecs(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .repartition(col("vec_id"))
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))

  /** cosine from precomputed norms — same FP sequence as the oracles'
    * dot/(sqrt·sqrt) formula. */
  private def cosOf(va: Column, na: Column, vb: Column, nb: Column): Column =
    dot(va, vb) / (na * nb)

  private def sides(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val e = vecs(s, dir)
    (e.select(col("vec_id").as("id_a"), col("v").as("va"), col("nrm").as("na")),
      e.select(col("vec_id").as("id_b"), col("v").as("vb"), col("nrm").as("nb")))
  }

  /** All-pairs scored frame (id_a, id_b, cos) — the exact O(n²)
    * oracle-twin feed for the kNN-graph family. */
  private def scoredExact(s: SparkSession, dir: String): DataFrame = {
    val (a, b) = sides(s, dir)
    a.join(b, col("id_a") =!= col("id_b"))
      .select(col("id_a"), col("id_b"),
        cosOf(col("va"), col("na"), col("vb"), col("nb")).as("cos"))
  }

  /** SRP-candidate scored frame — the corpus-scale feed: only bucket
    * cohabitants are scored, both orientations of each candidate pair
    * off one scan via a 2-row explode (a union would re-execute the
    * bucket join). */
  private def scoredAnn(s: SparkSession, dir: String): DataFrame = {
    val e = vecs(s, dir)
    val cand = srpCandidatesIndexed(s, dir)
    val sym = cand.select(explode(array(
        struct(col("id_a"), col("id_b")),
        struct(col("id_b").as("id_a"), col("id_a").as("id_b")))).as("p"))
      .select(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"))
    val a = e.select(col("vec_id").as("id_a"), col("v").as("va"), col("nrm").as("na"))
    val b = e.select(col("vec_id").as("id_b"), col("v").as("vb"), col("nrm").as("nb"))
    sym.join(a, Seq("id_a")).join(b, Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        cosOf(col("va"), col("na"), col("vb"), col("nb")).as("cos"))
  }

  /** Directed top-5 artifact (id_a, id_b, cos) per (kind, embeddings
    * fingerprint) — the SCORING product. Round 8: materialized
    * separately from the mutual graph because two consumer families
    * read it: the mutual-edge derivation below, and the neighbor-set
    * aggregators (embed_label_purity / _ann), which need directed
    * neighbor lists, not mutual edges. The scoring pass is the
    * expensive half of every consumer, so it runs once per
    * fingerprint; the former per-run localCheckpoint is gone (the
    * artifact read feeds both sides of the mutual join). */
  private def knnDirectedTable(s: SparkSession, dir: String,
      ann: Boolean): String = {
    import graft.functions.TopKByScore.topk
    val kind = if (ann) "ann" else "exact"
    val pfx = s"knn_dir_${kind}_${Tables.pathKey(dir)}_"
    val t = s"$pfx${Tables.pathKey(Tables.fingerprint(dir, "embeddings"))}"
    if (!s.catalog.tableExists(t)) {
      Tables.dropStaleTables(s, pfx)
      (if (ann) scoredAnn(s, dir) else scoredExact(s, dir))
        .groupBy(col("id_a"))
        .agg(topk(col("cos"), col("id_b"), 5).as("top"))
        .select(col("id_a"), explode(col("top")).as("t"))
        .select(col("id_a"), col("t.payload").as("id_b"),
          col("t.score").as("cos"))
        .write.mode("overwrite").format("parquet").saveAsTable(t)
    }
    t
  }

  /** Directed top-5 neighbor feed (id_a, id_b) off the persisted
    * artifact — consumed by the label-purity keys (Embeddings). */
  private[llm] def directedTop5(s: SparkSession, dir: String,
      ann: Boolean): DataFrame =
    s.table(knnDirectedTable(s, dir, ann)).select(col("id_a"), col("id_b"))

  /** Directed top-5 → mutual edges (id_a < id_b, with the a→b cos
    * attached). ONE definition under sim_knn_graph, sim_knn_graph_ann,
    * and both semantic-dedup keys, so the graph semantics can never
    * fork. */
  private def mutualFromDirected(directed: DataFrame): DataFrame = {
    val reverse = directed.select(col("id_b").as("id_a"),
      col("id_a").as("id_b"))
    directed.join(reverse, Seq("id_a", "id_b"))
      .where(col("id_a") < col("id_b"))
  }

  /** The mutual-kNN edge table, MATERIALIZED once per (sfDir,
    * embeddings fingerprint) — the curatePairsTable discipline applied
    * to the graph: in production the kNN graph is a product that the
    * graph report AND the semantic-dedup resolver both read, not a
    * view each recomputes (the scoring pass is the expensive half of
    * all four consumer keys). Regenerated fixtures invalidate via the
    * fingerprint key. */
  private def knnPairsTable(s: SparkSession, dir: String,
      ann: Boolean): String = {
    val kind = if (ann) "ann" else "exact"
    val pfx = s"knn_graph_${kind}_${Tables.pathKey(dir)}_"
    val t = s"$pfx${Tables.pathKey(Tables.fingerprint(dir, "embeddings"))}"
    if (!s.catalog.tableExists(t)) {
      Tables.dropStaleTables(s, pfx)
      mutualFromDirected(s.table(knnDirectedTable(s, dir, ann)))
        .select(col("id_a"), col("id_b"), col("cos"))
        .write.mode("overwrite").format("parquet").saveAsTable(t)
    }
    t
  }

  /** The top-P IVF cell assignment (vec_id → cell, P rows per vector),
    * MATERIALIZED once per (sfDir, embeddings fingerprint, P) — the
    * knnPairsTable discipline applied to the IVF index's coarse layer
    * (VERDICT r11: sim_ivf_ann re-scored the n×K assignment every run
    * while every other serving key reads a persisted artifact; in
    * production the assignment is written by the index build, not by
    * each query). K and the sub-bucket geometry derive from n, which
    * the fingerprint pins, so (fingerprint, P) keys the artifact
    * fully. Consumers: sim_ivf_ann (P = 5) and dedup_semantic_cells
    * (P = cellsProbes, default 3). */
  private def ivfAssignTable(s: SparkSession, dir: String, p: Int): String = {
    val pfx = s"ivf_assign_p${p}_${Tables.pathKey(dir)}_"
    val t = s"$pfx${Tables.pathKey(Tables.fingerprint(dir, "embeddings"))}"
    if (!s.catalog.tableExists(t)) {
      Tables.dropStaleTables(s, pfx)
      val n = Tables.rowCount(s, dir, "embeddings")
      val k = ivfCells(n)
      assignCells(vecs(s, dir), learnedCentroids(s, dir, k), p,
        viaBroadcast = assignViaBroadcast(k))
        .write.mode("overwrite").format("parquet").saveAsTable(t)
    }
    t
  }

  /** Percolation guard (VERDICT r07 item 7 — the deployment rule the
    * round-7 stability measurement derived, now ENFORCED, not just
    * documented): global component keep-decisions are trustworthy only
    * while the τ-graph is sparse. The statistic is the mean τ-degree,
    * 2·|mutual edges at cos ≥ τ| / n — two aggregates over the
    * persisted graph artifact and the embeddings footer, never the
    * corpus. Measured values (graft.DebugGuard, round 8): healthy
    * fixtures 0.028 (sf0.001) / 0.142 (sf0.1); the rotated-copy probe
    * corpus where exact-vs-ANN keep agreement collapsed to 0.64 and
    * the resolver over-dropped 39 % measured **0.818**. The guard
    * trips at 0.5 — half the random-graph giant-component onset (mean
    * degree 1), 3.5× above the worst healthy measurement and well
    * below the measured-unstable one — and names the remedy
    * (dedup_semantic_cells) rather than silently switching semantics:
    * the semantic keys' OUTPUT is defined as global components, so an
    * auto-switch would be a silent answer change. */
  val percolationMeanDegreeMax = 0.5
  private def percolationGuard(s: SparkSession, dir: String,
      mutual: DataFrame): Unit = {
    // conscious operator override for measurement harnesses
    // (RecallProbe must score the global resolver ON a percolated
    // corpus to quantify the instability the guard prevents): set
    // graft.semantic.percolationGuard=warn to log instead of refuse.
    val mode = s.conf.get("graft.semantic.percolationGuard", "enforce")
    val n = Tables.rowCount(s, dir, "embeddings")
    val e = mutual.where(col("cos") >= 0.45).count()
    val deg = 2.0 * e / n
    if (mode == "warn") {
      if (deg >= percolationMeanDegreeMax)
        println(f"WARN percolation guard overridden: mean tau-degree $deg%.3f")
      return
    }
    require(deg < percolationMeanDegreeMax,
      f"semantic-dedup percolation guard: mean tau-degree $deg%.3f >= " +
        f"$percolationMeanDegreeMax%.1f (edges at tau: $e, n: $n) — the " +
        "tau=0.45 graph percolates, so global component keep-decisions " +
        "are unstable (measured on the rotated-copy probe: agreement " +
        "0.64, over-drop 39% at mean degree 0.82); resolve within cells " +
        "instead (dedup_semantic_cells) or re-check sim_edge_histogram")
  }

  /** Mutual-edge cosine histogram in 0.05 bins over a graph artifact —
    * one definition for the exact and ANN pre-flight keys. */
  private def edgeHistogram(pairs: DataFrame): DataFrame =
    pairs
      .select(floor(col("cos") * 20).cast("long").as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("n_edges"))
      .select((col("bin").cast("double") / 20).as("cos_lo"), col("n_edges"))
      .orderBy("cos_lo")

  /** Semantic-cluster keep/drop: mutual edges at cos ≥ 0.45 →
    * connected components → keep the min-id member per cluster.
    * Components run on (id, id) label pairs — tiny next to the corpus
    * (the pipeline_curate_v2 posture). Guarded: refuses to resolve a
    * percolated graph (percolationGuard above). */
  private def semanticKeep(s: SparkSession, dir: String,
      mutual: DataFrame): DataFrame = {
    percolationGuard(s, dir, mutual)
    val m = mutual.where(col("cos") >= 0.45).select(col("id_a"), col("id_b"))
    val edges = m.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(m.select(col("id_b").as("src"), col("id_a").as("dst")))
    val labels = Cluster.components(edges)
    Tables.embeddings(s, dir).select(col("vec_id"))
      .join(labels.select(col("node").as("vec_id"), col("lbl")),
        Seq("vec_id"), "left")
      .withColumn("cluster_id", coalesce(col("lbl"), col("vec_id")))
      .select(col("vec_id"), col("cluster_id"),
        (col("vec_id") === col("cluster_id")).as("keep"))
      .orderBy("vec_id")
  }

  /** SRP-LSH geometry: L tables × B(n) sign bits, 64-dim planes, seed
    * 42, emitted by the fused SrpSignature expression (one codegen loop
    * instead of L×B dot-product sub-expressions; VERDICT r01 item 2).
    *
    * Geometry is CORPUS-ADAPTIVE in BOTH dimensions — see srpGeometry:
    * with uniform occupancy the bucket join produces ≈ L·n²/2^(B+1)
    * candidate pairs, so a fixed B is quadratic in disguise (measured
    * directly on the 10× ScaleGen probe, where B=3 took sim_lsh_ann
    * from ~2.5 s to 134 s), and a fixed L lets recall decay as B grows.
    * L and B below are the floor values the fixtures see (B=3 through
    * n ≈ 2 k — the sf0.001 recall tests are unchanged). */
  private[graft] val L = 12
  private[llm] val B = 3

  /** Learned IVF centroids: seeded MLlib k-means (k-means|| init) over
    * the corpus, persisted once per (sfDir, fixture fingerprint) like
    * the bucketed-table layouts — the coarse quantizer is an INDEX
    * artifact, built by a one-time job, not per query. (Round 3 used
    * "first K vectors" as a stand-in, which degrades recall on clustered
    * data — VERDICT r03 missing-capability 3.) Training runs on a
    * bounded sample (≤50 k rows, seeded) so the index-build job stays
    * O(sample·K·dim) however big the corpus is — the standard IVF
    * training recipe; the centroid table stays K×dim and either rides
    * as a plan literal or broadcasts (see assignCells). */
  private[graft] def learnedCentroids(s: SparkSession, dir: String, k: Int): DataFrame = {
    import java.nio.file.{Files, Paths}
    // prefix excludes k: when a regenerated fixture changes n (and so
    // K = ivfCells(n)), the old K's centroid dirs must be swept too —
    // every caller derives the same single active k per fingerprint
    val pfx = s"graft_ivf_cents_${Tables.pathKey(dir)}_"
    val path = s"/tmp/$pfx${k}_${Tables.fingerprint(dir, "embeddings")}"
    if (!Files.exists(Paths.get(path, "_SUCCESS"))) {
      Tables.dropStalePaths(pfx)
      import org.apache.spark.ml.clustering.KMeans
      import org.apache.spark.ml.functions.array_to_vector
      val all = Tables.embeddings(s, dir)
        .select(array_to_vector(col("embedding").cast("array<double>")).as("features"))
      val n = Tables.rowCount(s, dir, "embeddings")
      val data = if (n > 50000) all.sample(50000.0 / n, 42L) else all
      val model = new KMeans().setK(k).setSeed(42L).setMaxIter(20).fit(data)
      import s.implicits._
      model.clusterCenters.toSeq.zipWithIndex
        .map { case (c, i) => (i, c.toArray) }
        .toDF("cent_id", "cv")
        .write.mode("overwrite").parquet(path)
    }
    graft.Tables.cachedParquet(s, path)
  }

  /** Standard IVF sizing: K ∝ √n coarse cells. (Round 4 sized
    * K ∝ n² to cap the candidate join, which silently moved the blow-up
    * into assignment — n·K·dim ∝ n³ flops — and into a K×dim driver
    * literal ∝ n²; VERDICT r04 item 1. With K = √n the assignment is
    * n^1.5·dim and the candidate bound is recovered by SRP sub-bucketing
    * inside cells instead — see ivfSubBits.) */
  private[graft] def ivfCells(n: Long): Int =
    math.max(16, math.ceil(math.sqrt(n.toDouble)).toInt)

  /** Second-level SRP bits inside IVF cells. The cell join alone yields
    * ≈ P²·n²/(2K) expected candidate pairs; once that exceeds ~4e7 the
    * pairs are further required to share an SRP bucket in ≥1 of the L
    * tables, which divides the bound by 2^bits per table. 2^bits is
    * sized so L·P²·n²/(2K·2^bits) ≈ 4e7 at any n — the same
    * corpus-adaptive rule as adaptiveBits, with the learned cells
    * standing in for the first ~log2(2K/P²) random bits (an IVF+LSH
    * hybrid: better recall than pure SRP at equal candidate budget,
    * because the first-level split follows the data). 0 through the
    * fixtures (n ≤ 2 k) and the 10×-probe scale — the recall gates see
    * the pure multi-probe cell join. */
  private[graft] def ivfSubBits(n: Long, k: Int, p: Int): Int = {
    val pairs = p.toDouble * p * n * n / (2.0 * k)
    math.max(0, math.min(30,
      math.ceil(math.log(L.toDouble * pairs / 4e7) / math.log(2)).toInt))
  }

  /** Crossover between the two assignCells shapes, measured (round 6,
    * same-JVM A/B, min-of-3): at K = 448 the literal path's per-row
    * array_sort over K structs costs 4.8 s warm vs 1.4 s for the
    * broadcast + TopKByScore shape (59 s vs 2.4 s cold — the K-struct
    * comparator never reaches codegen); at K = 142 they tie. The
    * literal shape only pays off at small K where plan-constant
    * scoring beats the n×K row explosion. */
  private[graft] def assignViaBroadcast(k: Int): Boolean = k > 128

  /** Top-P cell assignment per vector against pre-normalized centroids
    * (cos(v, ĉ) = dot(v, ĉ)/|v|; ties broken by cell id ascending).
    * Two physical shapes, bit-identical results:
    *  - literal (small K — see assignViaBroadcast): the centroid matrix
    *    rides as one codegen constant and a single transform lambda
    *    scores all K cells per row — no join, no shuffle, no n×K
    *    materialization.
    *  - broadcast: a K×dim literal bloats the plan and the driver
    *    (VERDICT r04 item 1) and its array_sort comparator dominates at
    *    mid-K (measured — assignViaBroadcast), so the centroid frame
    *    broadcasts through a nested-loop join and the fused TopKByScore
    *    aggregate reduces the n×K scores to P rows per vector on the
    *    map side before any shuffle. */
  private[graft] def assignCells(e: DataFrame, cents: DataFrame, p: Int,
                               viaBroadcast: Boolean): DataFrame = {
    // normalize in-frame with the same op sequence both paths compile
    // to: ĉ = cv / sqrt(dot(cv, cv)), then score = dot(v, ĉ) / |v|
    val normed = cents.select(col("cent_id").cast("long").as("cell"),
      transform(col("cv"), x => x / sqrt(dot(col("cv"), col("cv")))).as("cv"))
    if (!viaBroadcast) {
      val centRows = normed.orderBy("cell").collect().map(_.getSeq[Double](1))
      val centLit = typedlit(centRows.toSeq)
      val scored = transform(centLit, (c, i) =>
        struct((lit(0.0) - dot(col("v"), c) / col("nrm")).as("na"),
          i.cast("long").as("cell")))
      e.select(col("vec_id"),
        explode(transform(slice(array_sort(scored), 1, p),
          t => t.getField("cell"))).as("cell"))
    } else {
      import graft.functions.TopKByScore.topk
      e.crossJoin(broadcast(normed))
        .select(col("vec_id"), col("cell"),
          (dot(col("v"), col("cv")) / col("nrm")).as("aff"))
        .groupBy("vec_id")
        .agg(topk(col("aff"), col("cell"), p).as("top"))
        .select(col("vec_id"),
          explode(transform(col("top"), t => t.getField("payload"))).as("cell"))
    }
  }

  /** Corpus-adaptive SRP geometry (tables, bits). Bits keep the
    * candidate budget: B = ⌈log2(L·n²/4e7)⌉ caps expected bucket-join
    * pairs ≈ 2e7 at any n (capped at 30 — SrpSignature packs the
    * signature in an Int). Tables hold RECALL: growing B alone prunes
    * true pairs too — the textbook P(candidate) = 1-(1-p^B)^L at the
    * production near-dup threshold (cos 0.9, p = 1-acos(0.9)/π ≈ 0.856)
    * falls to ~0.77 by B = 14 (n ≈ 200 k) with L = 12. So L doubles
    * (12 → 24 → 48) until that recall clears 0.93, with B re-derived
    * from the same budget each step — candidates stay ≈ budget because
    * doubling L adds one bit. Fixture and 10×-probe scales are
    * unchanged (L = 12 through n ≈ 6e4); n ≈ 2e5 lands on (48, 16),
    * predicted recall 0.985 at cos 0.9 / 0.9997 at cos 0.95 — measured
    * empirically on planted twins by graft.RecallProbe (BASELINE.md).
    * Low-similarity targets (cos 0.4, p = 0.63) still degrade at large
    * n: no LSH family can keep that radius while pruning (the trade
    * documented above, now with measured numbers). */
  private[graft] def srpGeometry(n: Long): (Int, Int) = {
    val p = 1 - math.acos(0.9) / math.Pi
    def bitsFor(l: Int): Int = math.min(30, math.max(B,
      math.ceil(math.log(l.toDouble * n * n / 4e7) / math.log(2)).toInt))
    var l = L
    while (l < 48 && 1 - math.pow(1 - math.pow(p, bitsFor(l)), l) < 0.93) l *= 2
    (l, bitsFor(l))
  }

  /** (vec_id, tbl, sig) bucket assignments — ids only, no vector
    * payload, so the bucket self-join shuffles ~L ints per vector
    * instead of L copies of the 64-double embedding. */
  private[graft] def srpBuckets(e: DataFrame, tables: Int, bits: Int): DataFrame = {
    import graft.functions.SrpSignature.srpSignature
    e.select(col("vec_id"),
      posexplode(srpSignature(col("v"), tables, bits, 64, 42L)).as(Seq("tbl", "sig")))
  }

  /** Distinct candidate id pairs (id_a < id_b) that share ≥1 SRP bucket.
    * `nRows` sizes the geometry — callers count the RAW embeddings table
    * (a parquet metadata-only count), not the repartitioned/normed plan,
    * so the sizing action costs no shuffle or norm work. */
  private[graft] def srpCandidates(e: DataFrame, nRows: Long): DataFrame = {
    val (tables, bits) = srpGeometry(nRows)
    val sigs = srpBuckets(e, tables, bits)
    sigs.select(col("vec_id").as("id_a"), col("tbl"), col("sig"))
      .join(sigs.select(col("vec_id").as("id_b"), col("tbl"), col("sig")),
        Seq("tbl", "sig"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** srpCandidates off the PERSISTED full-corpus band store
    * (Incremental.annIndex) instead of re-signing the corpus per
    * query: the store is built with the same geometry rule (raw-count
    * srpGeometry) and the same plane seed, so the candidates are
    * IDENTICAL rows — but the self-join rides the (tbl, sig) bucket
    * layout with zero exchange, and the signing cost is amortized
    * into the write-once artifact already shared with the ann_query_*
    * serving keys (round 9; measured 2.02 → ~0.6 s for sim_lsh_ann
    * at sf0.1). */
  private[graft] def srpCandidatesIndexed(s: SparkSession, dir: String): DataFrame = {
    val (st, _, _, _) = Incremental.annIndex(s, dir)
    val sigs = s.table(st)
    sigs.select(col("idx_id").as("id_a"), col("tbl"), col("sig"))
      .join(sigs.select(col("idx_id").as("id_b"), col("tbl"), col("sig")),
        Seq("tbl", "sig"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** One-time bucketed IVF inverted-list table (cell, idx_id) with
    * redundant top-2 assignment: each vector lands in its top-2 cells —
    * a 2x index that buys multiplicative recall at cell boundaries (the
    * textbook cure for flat/weakly-clustered spaces, where a neighbor's
    * nearest cell often isn't yours). Shared by ann_query_ivf and the
    * IVF-PQ composition (Quantize.ann_query_ivfpq); definition shared
    * with the streaming maintainer (Incremental.maintainIvfIndex) —
    * delta vectors append under the same bucketed spec; re-train
    * policy = ivfRetrainDue. */
  private[llm] def ivfIndexTable(s: SparkSession, dir: String,
      cents: DataFrame, k: Int): String = {
    val idxAssign = 2 // cells per indexed vector (redundant assignment)
    val pfx = s"ann_ivfidx${idxAssign}_${Tables.pathKey(dir)}_"
    val ct = s"$pfx${Tables.pathKey(Tables.fingerprint(dir, "embeddings"))}"
    if (!s.catalog.tableExists(ct)) {
      Tables.dropStaleTables(s, pfx)
      Incremental.buildIvfIndex(Tables.embeddings(s, dir), ct, cents, k,
        epoch = None)
    }
    ct
  }

  /** Pinned O(1) query batch (the sim_range_search convention). */
  private[llm] def probeBatch(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir).where(col("vec_id") < 16)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))

  /** Shared serving head: multi-probe (Hamming ≤ `radius`) candidate
    * (id_q, idx_id) pairs for the pinned probe batch against the
    * persisted SRP band store — only the probe side shuffles; see
    * ann_query_topk for the multi-probe rationale. The radius is the
    * per-key recall/candidate knob: probe rows grow ≈ B^radius/radius!
    * per table while the index is untouched. Returns (candidates,
    * probe frame, vector-store table). */
  private[llm] def servingCandidates(s: SparkSession, dir: String,
      radius: Int): (DataFrame, DataFrame, String) = {
    val (st, vt, tables, bits) = Incremental.annIndex(s, dir)
    val probes = probeBatch(s, dir)
    val masks: Seq[Int] = (0 to radius).flatMap {
      case 0 => Seq(0)
      case r => (0 until bits).combinations(r)
        .map(_.map(1 << _).reduce(_ | _)).toSeq
    }
    val psig = srpBuckets(probes, tables, bits)
      .select(col("vec_id").as("id_q"), col("tbl"),
        explode(array(masks.map(m => col("sig").bitwiseXOR(lit(m))): _*)).as("sig"))
    val cand = psig.join(s.table(st), Seq("tbl", "sig"))
      .where(col("idx_id") =!= col("id_q"))
      .select("id_q", "idx_id").distinct()
    (cand, probes, vt)
  }

  /** Smallest query-side multi-probe radius whose PREDICTED recall at
    * the range contract's cos ≥ 0.3 boundary clears 0.95: per-bit
    * agreement p = 1 − acos(0.3)/π ≈ 0.597, one-table hit =
    * Σ_{i≤r} C(B,i)·p^(B−i)·(1−p)^i, across-tables 1−(1−hit)^L.
    * Fixture/10× geometries (B ≤ 8) stay at radius 2 (probing is
    * cheap-wide there anyway); the 100× geometry (L=48, B=16) needs
    * radius 3 — prediction 0.994, measured 0.974 (DebugServe,
    * BASELINE.md round-7). Capped at 3: mask count C(B,3) ≈ B³/6 is
    * the practical ceiling before the probe side stops being narrow. */
  private[graft] def rangeRadius(tables: Int, bits: Int): Int = {
    val p = 1 - math.acos(0.3) / math.Pi
    def comb(n: Int, k: Int): Double =
      (0 until k).map(i => (n - i).toDouble / (i + 1)).product
    def hit(r: Int): Double =
      (0 to r).map(i =>
        comb(bits, i) * math.pow(p, bits - i) * math.pow(1 - p, i)).sum
    (1 to 3).find(r => 1 - math.pow(1 - hit(r), tables) >= 0.95).getOrElse(3)
  }

  /** ann_query_range body; radius ≤ 0 derives the geometry-adaptive
    * radius (the production path), explicit radius is the DebugServe
    * ladder hook. */
  private[graft] def rangeServe(s: SparkSession, dir: String,
      radius: Int): DataFrame = {
    val r = if (radius > 0) radius else {
      val (_, _, tables, bits) = Incremental.annIndex(s, dir)
      rangeRadius(tables, bits)
    }
    val (cand, probes, vt) = servingCandidates(s, dir, r)
    val pv = probes.select(col("vec_id").as("id_q"), col("v").as("vq"),
      col("nrm").as("nq"))
    cand.join(broadcast(pv), Seq("id_q"))
      .join(s.table(vt), Seq("idx_id"))
      .withColumn("cos", dot(col("vq"), col("v")) / (col("nq") * col("nrm")))
      .where(round(col("cos"), 6) >= 0.3)
      .select(col("id_q"), col("idx_id").as("id_m"),
        round(col("cos"), 4).as("cos_sim"))
      .orderBy("id_q", "id_m")
  }

  /** Serving probe-width scale — ONE constant for the whole IVF
    * serving family (ann_query_ivf AND ann_query_ivfpq), chosen by the
    * measured DebugServe recall ladder at 100× (BASELINE.md round 7:
    * the √K floor served 0.64 ALL-band, 4·√K recovered 0.963). Review
    * r12: ann_query_ivfpq had kept a private copy of the pre-ladder
    * √K formula, silently serving ~0.63-class recall while its
    * scaladoc claimed parity with the widened IVF key. */
  private[graft] val servePScale = 4.0

  /** Serving probe width: P = max(10, ⌈pScale·√K⌉) cells per query —
    * shared by ivfServe and the IVF-PQ composition so the two keys'
    * cell-probing recall is identical by construction. */
  private[graft] def ivfProbeWidth(k: Int, pScale: Double = servePScale): Int =
    math.max(10, math.ceil(pScale * math.sqrt(k.toDouble)).toInt)

  /** ann_query_ivf body, probe-width scale parameterized (DebugServe
    * ladder): P = ivfProbeWidth(K, pScale) cells probed per query. */
  private[graft] def ivfServe(s: SparkSession, dir: String,
      pScale: Double): DataFrame = {
    val n = Tables.rowCount(s, dir, "embeddings")
    val K = ivfCells(n)
    val cents = learnedCentroids(s, dir, K)
    val ct = ivfIndexTable(s, dir, cents, K)
    val (_, vt, _, _) = Incremental.annIndex(s, dir) // shared vector store
    val probes = probeBatch(s, dir)
    val P = ivfProbeWidth(K, pScale)
    val pcells = assignCells(probes, cents, P, viaBroadcast = assignViaBroadcast(K))
      .select(col("vec_id").as("id_q"), col("cell"))
    val cand = pcells.join(s.table(ct), Seq("cell"))
      .where(col("idx_id") =!= col("id_q"))
      .select("id_q", "idx_id").distinct()
    val pv = probes.select(col("vec_id").as("id_q"), col("v").as("vq"),
      col("nrm").as("nq"))
    rerankTopK(s, cand, pv, vt)
  }

  /** Shared serving tail: exact cosine re-rank of (id_q, idx_id)
    * candidates against the bucketed vector store, fused map-side
    * top-5 per probe. */
  private[llm] def rerankTopK(s: SparkSession, cand: DataFrame, pv: DataFrame,
      vt: String, filter: Option[Column] = None): DataFrame = {
    import graft.functions.TopKByScore.topk
    filter.foldLeft(
        cand.join(broadcast(pv), Seq("id_q")).join(s.table(vt), Seq("idx_id")))(
        _.where(_))
      .select(col("id_q"),
        (dot(col("vq"), col("v")) / (col("nq") * col("nrm"))).as("cos"),
        col("idx_id"))
      .groupBy("id_q")
      .agg(topk(col("cos"), col("idx_id"), 5).as("top"))
      .select(col("id_q"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("id_q"), (col("pos") + 1).as("rn"),
        col("t.payload").as("id_b"), round(col("t.score"), 4).as("cos_sim"))
      .orderBy("id_q", "rn")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // exact pairwise cosine above threshold
    "sim_cosine_pairs" -> ((s, dir) => {
      val (a, b) = sides(s, dir)
      a.join(b, col("id_a") < col("id_b"))
        .withColumn("cos", cosOf(col("va"), col("na"), col("vb"), col("nb")))
        .where(col("cos") > 0.4)
        .select(col("id_a"), col("id_b"), round(col("cos"), 4).as("cos_sim"))
        .orderBy("id_a", "id_b")
    }),

    // exact kNN: top-5 neighbors per vector by cosine. The O(n²)
    // scoring + fused TopKByScore reduction runs once per fingerprint
    // inside knnDirectedTable (the artifact every graph/purity
    // consumer already reads — VERDICT r08 item 1 discipline); the key
    // reconstructs rn from the artifact rows with a 5-row-per-group
    // window in TopKByScore's own deterministic (cos DESC, id_b ASC)
    // order, so the rows are identical to the inline form's.
    "sim_topk" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("id_a").orderBy(col("cos").desc, col("id_b"))
      s.table(knnDirectedTable(s, dir, ann = false))
        .withColumn("rn", row_number().over(w))
        .select(col("id_a"), col("rn"), col("id_b"),
          round(col("cos"), 4).as("cos_sim"))
        .orderBy("id_a", "rn")
    }),

    // Mutual k-NN graph (round 7): undirected edge (a, b) iff b is in
    // a's top-5 AND a is in b's top-5 — the substrate semantic
    // clustering / SemDeDup-style pruning builds on. Directed edges
    // come from the same map-side TopKByScore reduction as sim_topk
    // (k rows per vector leave the map side, never the full candidate
    // set); mutuality is then an n·k-row self equi join on the (a, b)
    // key — scale-safe past the scoring stage. The O(n²) exact scoring
    // is this key's declared oracle-twin role (sim_topk precedent); at
    // corpus scale the candidate feed swaps to the SRP/IVF ANN path
    // (sim_lsh_ann / sim_ivf_ann) with the same mutual join on top.
    "sim_knn_graph" -> ((s, dir) =>
      s.table(knnPairsTable(s, dir, ann = false))
        .select(col("id_a"), col("id_b"), round(col("cos"), 4).as("cos_sim"))
        .orderBy("id_a", "id_b")),

    // Mutual k-NN graph, ANN-fed (round 7): the corpus-scale path the
    // exact key's scaladoc promises — directed top-5 is computed over
    // SRP bucket candidates only (≈ L·n²/2^(B+1) pairs by geometry,
    // not n²), then the same TopKByScore reduction and n·k mutual equi
    // join. Both orientations of each candidate pair come off one scan
    // via a 2-row explode (a union would re-execute the bucket join).
    // Approximate in BOTH directions (a missed true neighbor can both
    // drop a real edge and promote a 6th-closest into a top-5), so no
    // SQL oracle: LlmSpec measures edge recall AND precision vs the
    // exact sim_knn_graph.
    "sim_knn_graph_ann" -> ((s, dir) =>
      s.table(knnPairsTable(s, dir, ann = true))
        .select(col("id_a"), col("id_b"), round(col("cos"), 4).as("cos_sim"))
        .orderBy("id_a", "id_b")),

    // the pre-flight check the semantic-dedup stability lesson
    // prescribes (BASELINE.md): the mutual-edge cosine histogram in
    // 0.05 bins — if mass sits AT the dedup threshold, the τ-graph
    // percolates and component keep-decisions are unstable; a corpus
    // owner reads this BEFORE trusting dedup_semantic at scale. Reads
    // the persisted graph artifact; output is bin-count-sized. The
    // key reads the exact artifact (its oracle-able twin role); at
    // corpus scale the identical query runs over the ANN artifact —
    // the graph you actually have — by swapping the table (ann=true).
    "sim_edge_histogram" -> ((s, dir) =>
      edgeHistogram(s.table(knnPairsTable(s, dir, ann = false)))),

    // the SAME pre-flight over the ANN graph artifact — the histogram
    // a corpus owner actually has at scale, where the exact graph was
    // never built (round 8; previously only promised by the exact
    // key's scaladoc). The percolationGuard reads the same artifact,
    // so this key IS the guard's statistic at bin granularity.
    // Exempt (ANN edges) — LlmSpec asserts the τ-region mass agrees
    // with the exact histogram within the kNN-edge recall the graph
    // gate already measures.
    "sim_edge_histogram_ann" -> ((s, dir) =>
      edgeHistogram(s.table(knnPairsTable(s, dir, ann = true)))),

    // the CELL-BOUNDED semantic resolver — SemDeDup's actual form
    // (Abbas et al. 2023 resolve within k-means clusters, not
    // globally) and the remedy the measured stability boundary
    // prescribes: mutual-kNN edges are kept only when both endpoints
    // share one of their top-P learned IVF cells. With P = 1 a
    // component could never outgrow a cell population; multi-probe
    // (needed for boundary-pair recall, below) lets a component
    // chain transitively across cells in principle, so the blast
    // radius is EMPIRICALLY bounded, not structural — the LlmSpec
    // gate asserts max component ≤ 4× mean cell population and the
    // stability tables measured 13 at 10× (P=2) and 17 at 100× (P=3)
    // vs the global resolver's 37 / 68 097. True duplicates co-locate (a
    // near-identical pair lands in the same nearest-centroid cell
    // with high probability — measured: planted-twin dedup recall at
    // 10× in BASELINE), so the bound costs little recall where it
    // matters. Approximate twice over (ANN edges + learned cells) —
    // no SQL oracle; LlmSpec gates agreement vs the global resolver
    // on the non-percolated fixture AND the structural bound.
    "dedup_semantic_cells" -> ((s, dir) => {
      // Multi-probe assignment: an edge survives if the endpoints
      // share ANY of their top-P cells. P = 1 home cells bound
      // components hardest but cut true pairs straddling a cell
      // boundary (measured at 10×: twin recall 0.81 in the 0.90-0.95
      // band); extra probes recover boundary pairs while the blast
      // radius stays cell-local. Default P = 3 from the measured
      // 100× ladder (BASELINE round-8 table: at 470 cells / 220 k
      // vectors, P=2 twin recall fell to 0.958/0.866/0.772 per band;
      // P=3 recovers 0.994/0.960/0.906 — round-7 10× quality — with
      // max component 17 vs 12, still cell-sized, while P=4 buys
      // 0.999/0.987/0.958 at max 26). Overridable for measurement
      // via graft.semantic.cellsProbes (DebugCells runs the ladder).
      val pProbes = s.conf.get("graft.semantic.cellsProbes", "3").toInt
      val cells = s.table(ivfAssignTable(s, dir, pProbes))
      val m = s.table(knnPairsTable(s, dir, ann = true))
        .where(col("cos") >= 0.45).select("id_a", "id_b")
      val mcell = m
        .join(cells.select(col("vec_id").as("id_a"), col("cell")), Seq("id_a"))
        .join(cells.select(col("vec_id").as("id_b"), col("cell")),
          Seq("id_b", "cell"))
        .select("id_a", "id_b").distinct()
      val edges = mcell.select(col("id_a").as("src"), col("id_b").as("dst"))
        .union(mcell.select(col("id_b").as("src"), col("id_a").as("dst")))
      val labels = Cluster.components(edges)
      Tables.embeddings(s, dir).select(col("vec_id"))
        .join(labels.select(col("node").as("vec_id"), col("lbl")),
          Seq("vec_id"), "left")
        .withColumn("cluster_id", coalesce(col("lbl"), col("vec_id")))
        .select(col("vec_id"), col("cluster_id"),
          (col("vec_id") === col("cluster_id")).as("keep"))
        .orderBy("vec_id")
    }),

    // SemDeDup-shaped semantic dedup (Abbas et al. 2023 family): prune
    // semantically redundant embeddings, not just near-identical ones —
    // mutual-kNN edges at cos ≥ 0.45 (the dedup_embed threshold),
    // resolved into connected components (Cluster.components, the same
    // solver every dedup_clusters key verifies), keep = the min-id
    // member of each semantic cluster. The exact O(n²) scoring is the
    // declared oracle-twin role; _ann below is the corpus-scale path.
    "dedup_semantic" -> ((s, dir) =>
      semanticKeep(s, dir, s.table(knnPairsTable(s, dir, ann = false)))),

    // corpus-scale semantic dedup: same mutual-kNN + components +
    // representative chain over SRP bucket candidates (≈ L·n²/2^(B+1)
    // scored pairs by geometry, not n²). Approximate in both
    // directions, so no SQL oracle; LlmSpec gates keep-decision
    // agreement vs the exact twin. MEASURED stability boundary
    // (BASELINE.md "Semantic keep-decision stability"): component
    // keep decisions are only as stable as the τ-graph is sparse —
    // on a probe corpus whose edge-cos histogram has mass AT the
    // threshold, the graph percolates and agreement collapses (0.64
    // at 10×); the check is ENFORCED — percolationGuard (round 8)
    // refuses to resolve a graph whose mean τ-degree crosses the
    // measured boundary and names the cell-bounded remedy.
    "dedup_semantic_ann" -> ((s, dir) =>
      semanticKeep(s, dir, s.table(knnPairsTable(s, dir, ann = true)))),

    // IVF-style ANN: coarse-quantize each vector to its top-P cells
    // (learned, seeded k-means centroids — a persisted index artifact,
    // K = √n cells, trained on a bounded sample), candidates share a
    // cell — and, past the scale where the cell join alone would exceed
    // the ~4e7-pair budget, an SRP sub-bucket within the cell
    // (ivfSubBits) — then an exact cosine re-check. At cluster scale
    // the cell id is the partition key, so each probe touches P cells
    // instead of the corpus. Probabilistic — recall vs the exact twin
    // asserted in LlmSpec (the sub-bucketing is inactive at fixture and
    // 10×-probe sizes, so the gate sees the pure multi-probe join).
    //
    // Every per-row cost is ≤ n·√n: assignment scores K = √n cells per
    // vector (literal or broadcast — assignCells), the probe frame is
    // P (or P·L) ids-only rows per vector, and the candidate join is
    // budget-capped. Round 4's K ∝ n² sizing — which made assignment
    // n³ and the centroid literal n² (VERDICT r04 item 1) — is gone.
    // localCheckpoint pins the ids-only probe frame so the self-join's
    // two sides don't score the corpus twice (no ReusedExchange when
    // one side broadcasts — round-2 dedup_simhash finding).
    "sim_ivf_ann" -> ((s, dir) => {
      val P = 5 // probes (recall at the low-similarity 0.4 threshold
                // needs a wide probe: see the LlmSpec gate)
      val n = Tables.rowCount(s, dir, "embeddings") // metadata-only count
      val K = ivfCells(n)
      val bits2 = ivfSubBits(n, K, P)
      // coarse assignment comes from the persisted index artifact
      // (ivfAssignTable) — the query pays probe-join cost only; the
      // SRP sub-bucket layer (inactive below ~4e7 candidate pairs)
      // still composes on top at scale
      val assigned = s.table(ivfAssignTable(s, dir, P))
      val probe =
        if (bits2 == 0) assigned
        else assigned.join(srpBuckets(vecs(s, dir), L, bits2), Seq("vec_id"))
          .localCheckpoint()
      val keys = if (bits2 == 0) Seq("cell") else Seq("cell", "tbl", "sig")
      val cands = probe.select(col("vec_id").as("id_a") +: keys.map(col): _*)
        .join(probe.select(col("vec_id").as("id_b") +: keys.map(col): _*), keys)
        .where(col("id_a") < col("id_b"))
        .select("id_a", "id_b").distinct()
      val (a, b) = sides(s, dir)
      cands
        .join(a, Seq("id_a"))
        .join(b, Seq("id_b"))
        .withColumn("cos", cosOf(col("va"), col("na"), col("vb"), col("nb")))
        .where(col("cos") > 0.4)
        .select(col("id_a"), col("id_b"), round(col("cos"), 4).as("cos_sim"))
        .orderBy("id_a", "id_b")
    }),

    // ANN as kNN SERVING, not pair enumeration (VERDICT r04 missing
    // item 3 — the shape a real user hits daily): top-5 neighbors for a
    // pinned O(1) query batch (vec_id < 16, the sim_range_search probe
    // convention) against the PERSISTED full-corpus two-artifact SRP
    // index (Incremental.annIndex — band store probed bucket-to-bucket
    // so only the 16-row query side shuffles; vectors fetched from the
    // bucketed vector store for candidate ids only, never re-signed).
    // Query cost ∝ probes × bucket occupancy, not corpus — the index
    // build is the one-time fingerprint-keyed job. Probabilistic
    // (SRP buckets can miss a neighbor) — recall vs the exact sim_topk
    // twin on the same probe ids asserted in LlmSpec.
    //
    // MULTI-PROBE (Lv et al., VLDB'07): the query side also probes
    // every bucket within Hamming distance ≤ 2 of its signature —
    // 1 + B + B(B-1)/2 buckets per table, QUERY SIDE ONLY (the index
    // stores one row per vector per table, unchanged). This is the
    // serving-shape lever the pair keys can't afford: per-query
    // candidates stay ≈ probes·L·masks·occupancy (occupancy is held
    // ~constant by the adaptive geometry), while kNN recall at
    // mid-similarity radii — where single-bucket probing collapses as
    // B grows (measured 0.25 at cos 0.4–0.55, 10× corpus) — recovers
    // to ≈0.9+ (RecallProbe, BASELINE.md).
    "ann_query_topk" -> ((s, dir) => {
      val (cand, probes, vt) = servingCandidates(s, dir, radius = 2)
      val pv = probes.select(col("vec_id").as("id_q"), col("v").as("vq"),
        col("nrm").as("nq"))
      rerankTopK(s, cand, pv, vt)
    }),

    // FILTERED kNN serving (round 8): top-5 among corpus vectors
    // matching a per-query metadata predicate (label = id_q % 10 —
    // each probe carries its own filter), the standard production
    // vector-search shape ("nearest docs in MY collection"). Served
    // as post-filter ANN: the filter column RIDES the vector-store
    // artifact (round-8 schema — predicate evaluated during the
    // bucketed candidate fetch, a pushdown, never a corpus join), and
    // the candidate head is the WIDE probe ring (radius 3, the range-
    // serving ring) because a ~10%-selective predicate decimates the
    // pool a top-5 needs — the standard over-retrieve trade of
    // post-filtered ANN. Exempt (candidates can miss) — LlmSpec
    // asserts recall ≥ 0.9 vs the exact filtered top-5 and the
    // predicate itself on every served row.
    "ann_query_filtered" -> ((s, dir) => {
      val (cand, probes, vt) = servingCandidates(s, dir, radius = 3)
      val pv = probes.select(col("vec_id").as("id_q"), col("v").as("vq"),
        col("nrm").as("nq"))
      rerankTopK(s, cand, pv, vt,
        filter = Some(col("label") === col("id_q") % 10))
    }),

    // radius-search SERVING — the range twin of ann_query_topk over the
    // same persisted SRP index and multi-probe candidate head: every
    // indexed vector within cosine ≥ 0.3 of each pinned probe (the
    // sim_range_search radius + round(cos, 6) threshold convention),
    // candidates from the band store, exact cosine re-check against the
    // bucketed vector store. The exact re-check means the output can
    // only MISS (never fabricate) matches, so LlmSpec asserts both
    // recall ≥ 0.9 vs the exact sim_range_search twin and that the
    // result is a strict subset of it. Exempt — no SQL oracle.
    // GEOMETRY-ADAPTIVE multi-probe (round 7): a range query wants
    // EVERY member of the cos ≥ 0.3 neighborhood, a much harder recall
    // target than top-5 — at the radius boundary per-bit agreement is
    // p ≈ 0.6, so at the 100× geometry (B=16) Hamming ≤ 2 probing
    // finds a boundary member in one table with prob ~0.03 (measured
    // ALL-band 0.66). rangeRadius picks the smallest probe ring whose
    // predicted boundary recall clears 0.95 — radius 2 at fixture
    // B ≤ 8, radius 3 at B=16 (measured 0.974 — DebugServe ladder in
    // BASELINE.md). Query side only; the index is untouched.
    "ann_query_range" -> ((s, dir) => rangeServe(s, dir, radius = -1)),

    // kNN serving against a persisted IVF index — the learned-quantizer
    // twin of ann_query_topk: the index assigns each corpus vector to
    // its SINGLE nearest cell (a bucketed (cell, idx_id) table — the
    // standard IVF inverted-list layout); the query side multi-probes
    // its top-P cells, fetches those cells' lists bucket-to-bucket, and
    // exact-cosine re-ranks. Per-probe candidates ≈ P·n/K = P·√n —
    // sublinear in corpus; index build (k-means + one assignment pass)
    // is the one-time fingerprint-keyed job. Exempt (cell probing can
    // miss a neighbor) — recall vs sim_topk asserted in LlmSpec.
    // query-side probe width P = max(10, ⌈pScale·√K⌉): per-probe
    // candidates P·(n/K)·idxAssign ≈ 2·pScale·n^(3/4) — sublinear at
    // any pScale constant. pScale chosen by the measured DebugServe
    // recall ladder at 100× (BASELINE.md round-7): the √K floor
    // (pScale 1) served 0.64 ALL-band; wider probing buys the
    // remaining recall at the same complexity class.
    "ann_query_ivf" -> ((s, dir) => ivfServe(s, dir, pScale = servePScale)),

    // approximate pairs (cos > 0.4) via SRP-LSH bucket join + exact
    // re-check. Probabilistic (recall ≈ 1-(1-p^B)^L, ~0.97 at cos 0.4) —
    // no SQL oracle; recall vs the exact twin asserted in LlmSpec.
    // Candidates-then-verify: the bucket self-join carries ids only,
    // the embedding arrays are fetched once per DISTINCT candidate pair
    // (two key joins on vec_id) — at cluster scale that's the shape that
    // keeps the LSH shuffle narrow instead of shipping L copies of every
    // vector through the candidate join.
    "sim_lsh_ann" -> ((s, dir) => {
      val (a, b) = sides(s, dir)
      srpCandidatesIndexed(s, dir)
        .join(a, Seq("id_a"))
        .join(b, Seq("id_b"))
        .withColumn("cos", cosOf(col("va"), col("na"), col("vb"), col("nb")))
        .where(col("cos") > 0.4)
        .select(col("id_a"), col("id_b"), round(col("cos"), 4).as("cos_sim"))
        .orderBy("id_a", "id_b")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "sim_cosine_pairs" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |       ROUND(list_cosine_similarity(a.v, b.v), 4) AS cos_sim
        |FROM e a JOIN e b ON a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(a.v, b.v) > 0.4
        |ORDER BY id_a, id_b""".stripMargin,

    "sim_topk" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
        |SELECT a.vec_id AS id_a,
        |       row_number() OVER (PARTITION BY a.vec_id
        |                          ORDER BY list_cosine_similarity(a.v, b.v) DESC,
        |                                   b.vec_id) AS rn,
        |       b.vec_id AS id_b,
        |       ROUND(list_cosine_similarity(a.v, b.v), 4) AS cos_sim
        |FROM e a JOIN e b ON a.vec_id <> b.vec_id
        |QUALIFY rn <= 5
        |ORDER BY id_a, rn""".stripMargin,

    "sim_knn_graph" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |d AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |         list_cosine_similarity(a.v, b.v) AS cos,
        |         row_number() OVER (PARTITION BY a.vec_id
        |                            ORDER BY list_cosine_similarity(a.v, b.v) DESC,
        |                                     b.vec_id) AS rn
        |  FROM e a JOIN e b ON a.vec_id <> b.vec_id
        |  QUALIFY rn <= 5)
        |SELECT x.id_a, x.id_b, ROUND(x.cos, 4) AS cos_sim
        |FROM d x JOIN d y ON x.id_a = y.id_b AND x.id_b = y.id_a
        |WHERE x.id_a < x.id_b
        |ORDER BY x.id_a, x.id_b""".stripMargin,

    "sim_edge_histogram" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |d AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |         list_cosine_similarity(a.v, b.v) AS cos,
        |         row_number() OVER (PARTITION BY a.vec_id
        |                            ORDER BY list_cosine_similarity(a.v, b.v) DESC,
        |                                     b.vec_id) AS rn
        |  FROM e a JOIN e b ON a.vec_id <> b.vec_id
        |  QUALIFY rn <= 5),
        |m AS (
        |  SELECT x.cos
        |  FROM d x JOIN d y ON x.id_a = y.id_b AND x.id_b = y.id_a
        |  WHERE x.id_a < x.id_b)
        |SELECT CAST(FLOOR(cos * 20) AS DOUBLE) / 20 AS cos_lo,
        |       COUNT(*) AS n_edges
        |FROM m GROUP BY 1 ORDER BY cos_lo""".stripMargin,

    // the knn-graph CTE + the transitive-closure component labeling of
    // the pipeline_curate_v2 oracle, applied to mutual edges at
    // cos >= 0.45
    "dedup_semantic" ->
      """WITH RECURSIVE e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |d AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |         list_cosine_similarity(a.v, b.v) AS cos,
        |         row_number() OVER (PARTITION BY a.vec_id
        |                            ORDER BY list_cosine_similarity(a.v, b.v) DESC,
        |                                     b.vec_id) AS rn
        |  FROM e a JOIN e b ON a.vec_id <> b.vec_id
        |  QUALIFY rn <= 5),
        |m AS (
        |  SELECT x.id_a, x.id_b
        |  FROM d x JOIN d y ON x.id_a = y.id_b AND x.id_b = y.id_a
        |  WHERE x.id_a < x.id_b AND x.cos >= 0.45),
        |edges AS (SELECT id_a AS a, id_b AS b FROM m
        |          UNION SELECT id_b, id_a FROM m),
        |reach(a, b) AS (
        |  SELECT a, b FROM edges
        |  UNION
        |  SELECT r.a, g.b FROM reach r JOIN edges g ON r.b = g.a),
        |lbl AS (
        |  SELECT e.vec_id,
        |         CAST(COALESCE(LEAST(MIN(r.b), e.vec_id), e.vec_id) AS BIGINT)
        |           AS cluster_id
        |  FROM e LEFT JOIN reach r ON r.a = e.vec_id
        |  GROUP BY e.vec_id)
        |SELECT vec_id, cluster_id, vec_id = cluster_id AS keep
        |FROM lbl ORDER BY vec_id""".stripMargin
  )
}
