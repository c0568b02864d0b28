package graft.llm

import graft.{QueryPack, Tables}
import graft.functions.DotProduct.dot
import graft.relational.Stable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** User-facing corpus clustering: the topic-structure primitives a
  * curation pipeline runs BEFORE deciding what to keep — per-cluster
  * profiles (how is the corpus distributed over semantic regions?) and
  * cluster-balanced selection (cap every region's contribution so the
  * dominant topic cannot crowd out the tail — the prototypes/SemDeDup
  * curation family, Abbas et al. 2023 / Sorscher et al. 2022 shape).
  *
  * Reuses the IVF coarse quantizer wholesale: `learnedCentroids` (the
  * seeded, bounded-sample k-means index artifact, persisted write-once
  * per fixture fingerprint) and `assignCells` (the measured
  * literal-vs-broadcast assignment shapes). Clustering here is not a
  * new engine — it is the index-build job already proven at the ANN
  * keys, exposed as an operator. 100 TB posture: centroid training is
  * O(sample·K·dim) regardless of corpus size, assignment is one
  * map-side pass against a K×dim broadcast, the profile reduces to K
  * rows, and the balanced sample adds one rank window PARTITIONED BY
  * cell (per-partition work is cell-sized, never corpus-sized).
  *
  * Exempt keys (MLlib k-means centroids have no SQL twin): LlmSpec
  * gates assignment optimality against a brute-force argmax over the
  * same centroid table, profile mass conservation, and the per-cell
  * cap/top-affinity properties of the balanced sample.
  */
object Clustering extends QueryPack {

  /** Same vector frame as Similarity: doubles + precomputed norm,
    * re-spread from the single-file fixture. */
  private def vecs(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .repartition(col("vec_id"))
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
      // exclude zero-norm vectors (ADVICE r08, mirroring sample_kcenter):
      // aff = dot/0 would be NaN and silently poison cohesion / PSI /
      // the balanced-sample ranking instead of failing loudly
      .where(col("nrm") > 0)

  /** Assign an arbitrary (vec_id, v, nrm) frame to `dir`'s learned
    * cells, carrying the cosine affinity. Affinity is recomputed by a
    * K×dim broadcast join-back rather than widening assignCells'
    * contract — one extra map-side pass, no shuffle beyond the vec_id
    * equi-join. Per-row affinity is a fused sequential dot product
    * (geometry-independent by construction). */
  private[graft] def assignTo(s: SparkSession, dir: String,
                              e: DataFrame): DataFrame = {
    val n = Tables.rowCount(s, dir, "embeddings")
    val k = Similarity.ivfCells(n)
    val cents = Similarity.learnedCentroids(s, dir, k)
    val normed = cents.select(col("cent_id").cast("long").as("cell"),
      transform(col("cv"), x => x / sqrt(dot(col("cv"), col("cv")))).as("cv"))
    Similarity.assignCells(e, cents, 1, Similarity.assignViaBroadcast(k))
      .join(e, Seq("vec_id"))
      .join(broadcast(normed), Seq("cell"))
      .select(col("vec_id"), col("cell"),
        (dot(col("v"), col("cv")) / col("nrm")).as("aff"))
  }

  /** The whole-corpus home-cell assignment (vec_id, cell, aff),
    * MATERIALIZED once per (sfDir, embeddings fingerprint) — the
    * ivfAssignTable discipline with the affinity attached (review r12:
    * profile, drift, and the balanced sample each re-scored the n×K
    * assignment per run; in production the assignment is the
    * clustering job's output, every report reads it). */
  private def homeCellsTable(s: SparkSession, dir: String): String = {
    val pfx = s"cluster_home_${Tables.pathKey(dir)}_"
    val t = s"$pfx${Tables.pathKey(Tables.fingerprint(dir, "embeddings"))}"
    if (!s.catalog.tableExists(t)) {
      Tables.dropStaleTables(s, pfx)
      assignTo(s, dir, vecs(s, dir))
        .write.mode("overwrite").format("parquet").saveAsTable(t)
    }
    t
  }

  /** (vec_id, cell, aff): nearest-centroid (home cell, P = 1)
    * assignment of the whole corpus — an artifact read. */
  private[graft] def homeCells(s: SparkSession, dir: String): DataFrame =
    s.table(homeCellsTable(s, dir))

  /** Per-cell PSI terms between two sub-corpora assigned to the SAME
    * learned cells — the population-stability report. Laplace-smoothed
    * shares over all K declared cells (empty cells included: a topic
    * appearing from nothing is exactly the drift to surface). The
    * day-1 side's counts would be a recorded day-0 statistic at scale
    * (the text_bpe_drift precedent); the delta side is one assignment
    * pass + a K-row reduce. */
  private[graft] def driftReport(s: SparkSession, dir: String,
                                 day1: DataFrame, delta: DataFrame): DataFrame = {
    def cellCounts(e: DataFrame, name: String): DataFrame =
      assignTo(s, dir, e).groupBy("cell")
        .agg(count(lit(1)).as(name))
    psiFromCounts(s, dir, cellCounts(day1, "c_day1"),
      cellCounts(delta, "c_delta"))
  }

  /** The PSI arithmetic over two per-cell count frames — ONE
    * definition shared by [[driftReport]] (arbitrary frames, pays the
    * assignment pass) and the embed_cluster_drift key (fixture splits,
    * reads the persisted home-cell artifact), so the smoothing and
    * term formula can never fork between them. */
  private def psiFromCounts(s: SparkSession, dir: String,
                            c1: DataFrame, cd: DataFrame): DataFrame = {
    val n = Tables.rowCount(s, dir, "embeddings")
    val k = Similarity.ivfCells(n)
    val allCells = Similarity.learnedCentroids(s, dir, k)
      .select(col("cent_id").cast("long").as("cell"))
    val joined = allCells
      .join(c1, Seq("cell"), "left")
      .join(cd, Seq("cell"), "left")
      .na.fill(0L, Seq("c_day1", "c_delta"))
    // totals ride a 1-row broadcast off the K-row frame (the census
    // pattern), never a global window
    val tots = joined.agg(sum(col("c_day1")).as("n1"),
      sum(col("c_delta")).as("nd"))
    val p1 = (col("c_day1") + 0.5) / (col("n1") + 0.5 * k)
    val pd = (col("c_delta") + 0.5) / (col("nd") + 0.5 * k)
    joined.crossJoin(broadcast(tots))
      .select(col("cell"), col("c_day1"), col("c_delta"),
        round((pd - p1) * log(pd / p1), 8).as("psi_term"))
      .orderBy("cell")
  }

  /** Selection budget for the balanced sample: 25 % of the corpus,
    * capped uniformly across the K declared cells (not the nonempty
    * ones — the cap must not depend on the data distribution, or a
    * skew shift silently changes every cell's quota). */
  private[graft] def balancedCap(n: Long, k: Int): Long =
    math.max(1L, math.ceil(math.ceil(n / 4.0) / k).toLong)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Per-cluster corpus profile: population, decimal-stable mean
    // cosine-to-centroid (cohesion — how tight the topic is), and the
    // weakest member's affinity (the cell's effective radius). The
    // report every balancing decision reads first: a huge low-cohesion
    // cell is a candidate for re-clustering, a tiny tight one for
    // upsampling. K rows out; the reduction is a plain hash groupBy on
    // cell.
    "embed_cluster_profile" -> ((s, dir) =>
      homeCells(s, dir)
        .groupBy("cell")
        .agg(count(lit(1)).as("cnt"),
          Stable.davg(col("aff"), 4).as("cohesion"),
          round(min(col("aff")), 4).as("aff_min"))
        .orderBy("cell")),

    // Embedding-distribution drift monitor — the vector-side sibling
    // of dq_drift_psi and text_bpe_drift: assign yesterday's corpus
    // and today's delta to the SAME learned cells and report the
    // per-cell PSI terms (Laplace-smoothed over all K declared cells,
    // so a topic appearing from nothing is loud). Day-1/delta split is
    // the incremental family's vec_id % 4 convention. Total PSI =
    // Σ terms; the LlmSpec gate asserts the in-distribution split
    // stays quiet AND a crafted half-negated delta (the ScaleGen
    // decorrelation isometry — same norms, scrambled directions)
    // trips loud.
    "embed_cluster_drift" -> ((s, dir) => {
      // both sides are fixture splits, so their cells come from the
      // persisted home-cell artifact (one scan, two filters) — no
      // re-scoring; crafted foreign deltas go through driftReport
      val hc = homeCells(s, dir)
      psiFromCounts(s, dir,
        hc.where(col("vec_id") % 4 =!= 0).groupBy("cell")
          .agg(count(lit(1)).as("c_day1")),
        hc.where(col("vec_id") % 4 === 0).groupBy("cell")
          .agg(count(lit(1)).as("c_delta")))
    }),

    // Cluster-balanced prototype selection: within each home cell keep
    // the `cap` most prototypical members (highest cosine to the
    // centroid — the SSL-prototypes keep rule; Sorscher et al. 2022
    // measure prototypicality exactly this way), so no topic exceeds
    // budget/K rows however skewed the corpus. Ties broken by vec_id
    // for total order (partition-geometry independence). The window
    // partitions BY CELL, so per-task state is one cell's members —
    // the same bounded-window discipline as giniRanked, never a global
    // single-partition sort.
    "sample_cluster_balanced" -> ((s, dir) => {
      val n = Tables.rowCount(s, dir, "embeddings")
      val cap = balancedCap(n, Similarity.ivfCells(n))
      homeCells(s, dir)
        .withColumn("rk", row_number().over(
          Window.partitionBy("cell")
            .orderBy(col("aff").desc, col("vec_id"))))
        .where(col("rk") <= cap)
        .select(col("vec_id"), col("cell"),
          round(col("aff"), 4).as("aff"))
        .orderBy("vec_id")
    })
  )

  val oracleSql: Map[String, String] = Map.empty
}
