package graft.llm

import graft.{QueryPack, Tables}
import graft.functions.DotProduct.dot
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Product quantization (PQ) over the embedding column — the memory
  * face of the 100 TB ANN story, complementing Similarity's candidate
  * pruning: 64 float32 dims (256 B) compress to M = 8 sub-space codes
  * (8 B, 32×), and top-k serving scans the CODES with per-query lookup
  * tables (ADC — asymmetric distance computation), touching the full
  * vectors only for a bounded re-rank head. IVF prunes WHICH vectors a
  * query scores; PQ shrinks WHAT each scoring touches — at cluster
  * scale the two compose (IVF-PQ), but each is measurable alone and
  * this module keeps PQ pure so its recall/compression trade is
  * isolated.
  *
  * Codebooks: per sub-space k-means (256 centroids × 8 dims), seeded,
  * trained on a bounded sample (≤ 50 k rows) — same one-time
  * fingerprint-keyed index-artifact discipline as
  * Similarity.learnedCentroids. The full codebook is 8×256×8 doubles
  * (~128 KB): it rides as a PLAN LITERAL into every encode/probe
  * expression (unconditionally — unlike IVF's K = √n centroid table,
  * which outgrows the literal shape at K > 128, the PQ book is
  * fixed-size by construction, so the literal path is always the
  * codegen-friendly one; sub-space distances go through the native
  * DotProduct via ||s−c||² = |c|² − 2·dot(s,c) + const).
  *
  * Both keys are probabilistic (k-means codebooks have no SQL twin) —
  * exempt under the SparkEntry escape hatch; LlmSpec gates
  * reconstruction quality, encode determinism, and serving recall vs
  * the exact sim_topk twin.
  */
object Quantize extends QueryPack {

  private[llm] val M = 8        // sub-spaces
  private[llm] val SubDim = 8   // dims per sub-space (M × SubDim = 64)
  private[graft] val Ksub = 256 // codes per sub-space → 8 bits, 8 B/vector (the standard PQ operating point: 4-bit codes measured mean recon cos 0.678 / serving recall 0.66 on the fixture — too coarse)

  /** Train-or-load the per-sub-space codebooks. Returned as driver-side
    * nested Seq (m → code → centroid), hard-capped at 8×256×8 doubles —
    * a plan-literal-sized artifact by construction. */
  private[graft] def codebook(s: SparkSession, dir: String): Seq[Seq[Seq[Double]]] = {
    // prefix excludes Ksub (learnedCentroids convention): a geometry
    // change sweeps the old operating point's artifacts too
    val pfx = s"graft_pq_book_${Tables.pathKey(dir)}_"
    val path = s"/tmp/$pfx${Ksub}_${Tables.fingerprint(dir, "embeddings")}"
    if (!Files.exists(Paths.get(path, "_SUCCESS"))) {
      Tables.dropStalePaths(pfx)
      import org.apache.spark.ml.clustering.KMeans
      import org.apache.spark.ml.functions.array_to_vector
      val all = Tables.embeddings(s, dir)
        .select(col("embedding").cast("array<double>").as("v"))
      val n = Tables.rowCount(s, dir, "embeddings")
      val data = (if (n > 50000) all.sample(50000.0 / n, 42L) else all)
        .localCheckpoint() // 8 fits share one materialization of the sample
      import s.implicits._
      val rows = (0 until M).flatMap { m =>
        val sub = data.select(array_to_vector(
          slice(col("v"), m * SubDim + 1, SubDim)).as("features"))
        val model = new KMeans().setK(Ksub).setSeed(42L + m).setMaxIter(20).fit(sub)
        model.clusterCenters.zipWithIndex.map { case (c, i) => (m, i, c.toArray.toSeq) }
      }
      rows.toDF("m", "code", "cv").coalesce(1).write.mode("overwrite").parquet(path)
      data.unpersist()
    }
    val loaded = s.read.parquet(path).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2)))
    // per-sub-space lists sized by what KMeans actually returned: a
    // heavily-duplicated corpus sample can yield < Ksub distinct
    // centers in a sub-space, and the build writes codes densely
    // 0..k_m−1 (zipWithIndex) — a fixed 0-until-Ksub reconstruction
    // would .get-crash on the persisted artifact forever (review r12)
    val byM = loaded.groupBy(_._1)
    (0 until M).map { m =>
      val rows = byM.getOrElse(m, Array.empty).sortBy(_._2)
      require(rows.nonEmpty, s"PQ codebook sub-space $m is empty: $path")
      require(rows.map(_._2).toSeq == rows.indices.toSeq,
        s"PQ codebook sub-space $m has non-dense codes: $path")
      rows.map(_._3.toSeq).toSeq
    }
  }

  /** Encode v (array<double>[64]) to its M nearest-centroid codes via
    * the fused native PqEncode expression — the composed-builtin form
    * (256 literal dot sub-expressions per sub-space) overflowed janino's
    * 64 KB method limit and fell back to interpreted eval at 5.7 ms/row
    * (the round-1 SrpSignature lesson, re-measured here). */
  private[llm] def encode(v: Column, book: Seq[Seq[Seq[Double]]]): Column =
    graft.functions.PqCodec.pqEncode(v, book)

  /** Reconstruction of a codes array back to the 64-dim centroid
    * concatenation (plan-literal book lookup per sub-space). */
  private[llm] def reconstruct(codes: Column, book: Seq[Seq[Seq[Double]]]): Column =
    concat((0 until M).map { m =>
      element_at(typedlit(book(m)), element_at(codes, m + 1) + 1)
    }: _*)

  /** One-time codes-table artifact: (vec_id, codes array<int>[M], nrm)
    * — the 8 B/vector compressed corpus the ADC scan reads. Laid out as
    * per-job subdirectories (`batch_init` for the bulk build, one
    * `batch_<id>` per streaming micro-batch) so maintenance appends are
    * idempotent overwrites; read it with readCodes below. */
  private[llm] def codesTable(s: SparkSession, dir: String,
      book: Seq[Seq[Seq[Double]]]): String = {
    val pfx = s"graft_pq_codes_${Tables.pathKey(dir)}_"
    val path = s"/tmp/$pfx${Ksub}_${Tables.fingerprint(dir, "embeddings")}"
    if (!Files.exists(Paths.get(path, "batch_init", "_SUCCESS"))) {
      Tables.dropStalePaths(pfx)
      buildPqCodes(Tables.embeddings(s, dir), path, book, "batch_init")
    }
    path
  }

  /** Read the whole codes artifact (bulk build + maintained batches). */
  private[graft] def readCodes(s: SparkSession, path: String): DataFrame =
    s.read.option("recursiveFileLookup", "true").parquet(path)

  /** Encode `vecs` (vec_id, embedding) with a FROZEN codebook and write
    * the (vec_id, codes, nrm) rows to the `part` subdirectory of the
    * codes artifact — an OVERWRITE, so re-running the same part (the
    * at-least-once foreachBatch replay) lands the same bytes instead of
    * appending duplicates into a top-k-scanned artifact. One definition
    * shared by the one-time codesTable job, the streaming maintainer,
    * and the tests. */
  private[graft] def buildPqCodes(vecs: DataFrame, path: String,
      book: Seq[Seq[Seq[Double]]], part: String): Unit =
    vecs
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .select(col("vec_id"), encode(col("v"), book).as("codes"),
        sqrt(dot(col("v"), col("v"))).as("nrm"))
      .write.mode("overwrite").parquet(s"$path/$part")

  /** Streaming maintenance of the PQ codes artifact (the Incremental
    * .maintainIvfIndex pattern, applied to PQ): each micro-batch of
    * newly ingested vectors is encoded against the EXISTING codebook —
    * the learned quantizer is not retrained per batch, exactly like a
    * production PQ index where re-training is a deliberate re-encode
    * job — and the 8 B/vector code rows are APPENDED to the artifact.
    * Encoding is deterministic given the book, so the maintained
    * artifact is bit-identical to a batch re-encode of the union; daily
    * cost = delta · M · Ksub · SubDim encode flops, never a corpus
    * re-scan. Each micro-batch OVERWRITES its own batch_<id>
    * subdirectory, so an at-least-once foreachBatch replay after a
    * crash rewrites the same rows instead of duplicating them — the
    * codes artifact feeds a top-k scan, which (unlike the membership
    * indexes) is not duplicate-tolerant. Re-train policy: pqRetrainDue
    * below. */
  def maintainPqCodes(streamingVecs: DataFrame, path: String,
      book: Seq[Seq[Seq[Double]]], ckpt: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    streamingVecs.writeStream
      .trigger(trigger)
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        buildPqCodes(batch, path, book, s"batch_$id")
        ()
      }
      .start()

  /** Mean reconstruction cosine of a book over a bounded sample
    * (≤ 10 k rows) of `vecs` — the PQ fidelity number both the deploy
    * baseline and the drift check read. */
  private def meanReconCos(vecs: DataFrame,
      book: Seq[Seq[Seq[Double]]]): Double = {
    val base = vecs.select(col("vec_id"),
      col("embedding").cast("array<double>").as("v"))
    val n = base.count()
    // vacuously perfect fidelity on an empty frame: avg over zero rows
    // is NULL and getDouble would NPE (review r12) — an empty delta
    // means "no drift evidence", so the caller's retrain check stays
    // quiet instead of crashing the monitoring job
    if (n == 0) return 1.0
    (if (n > 10000) base.sample(10000.0 / n, 42L) else base)
      .withColumn("r", reconstruct(encode(col("v"), book), book))
      .agg(avg(dot(col("v"), col("r")) /
        (sqrt(dot(col("v"), col("v"))) * sqrt(dot(col("r"), col("r"))))))
      .head().getDouble(0)
  }

  /** Deploy-time fidelity baseline for the book: mean reconstruction
    * cosine over the corpus the book was trained on, persisted once
    * under the same fingerprint key as the book itself. Drift is only
    * meaningful RELATIVE to this number — absolute thresholds misfire,
    * measured directly: the 10×/100× rotated-mixture corpora quantize
    * to ~0.80 mean cos with a book freshly trained on them (richer
    * directional mixture per 8-dim sub-space), so a fixed 0.85 floor
    * would demand a re-train that re-training cannot clear. */
  private[graft] def bookFidelity(s: SparkSession, dir: String,
      book: Seq[Seq[Seq[Double]]]): Double = {
    val pfx = s"graft_pq_fid_${Tables.pathKey(dir)}_"
    val path = s"/tmp/$pfx${Ksub}_${Tables.fingerprint(dir, "embeddings")}"
    if (!Files.exists(Paths.get(path, "_SUCCESS"))) {
      Tables.dropStalePaths(pfx)
      val f = meanReconCos(Tables.embeddings(s, dir), book)
      import s.implicits._
      Seq(f).toDF("fidelity").coalesce(1).write.mode("overwrite").parquet(path)
    }
    s.read.parquet(path).head().getDouble(0)
  }

  /** The documented PQ re-train policy: appends keep the codes CORRECT
    * indefinitely (encoding is deterministic given the book) but their
    * FIDELITY decays if the corpus distribution drifts away from the
    * training sample — the frozen centroids stop covering where the new
    * vectors actually live. Policy: mean reconstruction cosine over a
    * bounded sample of the CURRENT corpus more than `margin` below the
    * book's deploy-time baseline (bookFidelity) → re-train. Relative,
    * not absolute — see bookFidelity for why. Bounded samples on both
    * sides, never a corpus scan. */
  def pqRetrainDue(vecs: DataFrame,
      book: Seq[Seq[Seq[Double]]], baseline: Double,
      margin: Double = 0.05): Boolean =
    meanReconCos(vecs, book) < baseline - margin

  /** One 32-bit half of the 1-bit-per-dim sign code of array column
    * `c` (dims from..from+31, LSB first) — SQL-expression string so
    * the variable-shift `shiftleft(1L, i)` form is available (the
    * Scala DSL wrapper takes literal shift amounts only). Two halves
    * instead of one 64-bit code keep every value positive and
    * overflow-free on BOTH engines (bit 63 would need unsigned). */
  private def bqHalfExpr(c: String, from: Int): String =
    s"aggregate(sequence($from, ${from + 31}), 0L, (acc, i) -> " +
      s"acc + IF(element_at($c, i + 1) >= cast(0 as double), " +
      s"shiftleft(1L, i - $from), 0L))"

  /** Persisted BQ code table (idx_id, lo, hi): 8 B of sign bits per
    * vector — the binary-quantization serving artifact. Fingerprint-
    * keyed write-once like every index. */
  private[llm] def bqCodes(s: SparkSession, dir: String): String = {
    val pfx = s"ann_bqidx_${Tables.pathKey(dir)}_"
    val t = s"$pfx${Tables.pathKey(Tables.fingerprint(dir, "embeddings"))}"
    if (!s.catalog.tableExists(t)) {
      Tables.dropStaleTables(s, pfx)
      Tables.embeddings(s, dir)
        .select(col("vec_id").as("idx_id"),
          col("embedding").cast("array<double>").as("v"))
        .select(col("idx_id"), expr(bqHalfExpr("v", 0)).as("lo"),
          expr(bqHalfExpr("v", 32)).as("hi"))
        .write.mode("overwrite")
        .bucketBy(16, "idx_id").sortBy("idx_id")
        .format("parquet").saveAsTable(t)
    }
    t
  }

  /** Batch-build the epoch-partitioned BQ code store layout the
    * maintainer appends to (bulk = epoch −1). The write-once bqCodes
    * table stays non-partitioned; this variant exists for maintained
    * deployments, mirroring Incremental.buildChunkIndex. */
  private[graft] def buildBqCodeStore(vecs: DataFrame, table: String): Unit =
    vecs.select(col("vec_id").as("idx_id"),
        col("embedding").cast("array<double>").as("v"))
      .select(col("idx_id"), expr(bqHalfExpr("v", 0)).as("lo"),
        expr(bqHalfExpr("v", 32)).as("hi"), lit(-1L).as("epoch"))
      .write.mode("overwrite")
      .partitionBy("epoch")
      .bucketBy(16, "idx_id").sortBy("idx_id")
      .format("parquet").saveAsTable(table)

  /** Streaming maintenance of the BQ code store (round 8 — the last
    * serving index without a maintainer): each micro-batch of newly
    * ingested vectors appends its deterministic sign codes under the
    * same bucketed spec; restart-safe via the shared epoch-partition
    * contract (Incremental.epochInsert — a replayed epoch rewrites
    * identical rows). Daily cost = delta encodes, never a re-scan. */
  def maintainBqCodes(streamingVecs: DataFrame, table: String, ckpt: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    streamingVecs.writeStream
      .trigger(trigger)
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        Incremental.epochInsert(
          batch.select(col("vec_id").as("idx_id"),
              col("embedding").cast("array<double>").as("v"))
            .select(col("idx_id"), expr(bqHalfExpr("v", 0)).as("lo"),
              expr(bqHalfExpr("v", 32)).as("hi")), table, id)
        ()
      }
      .start()

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // BINARY quantization (round 8): 1 sign bit per dimension — 8 B
    // per 64-dim vector, the coarsest useful code and the cheapest to
    // score (Hamming distance = 2×bit_count(xor), pure ALU). Unlike
    // PQ there is nothing learned, so the encode is DETERMINISTIC and
    // fully oracle-able: the code ships as two 32-bit halves (positive
    // and overflow-free on both engines) plus the popcount. The sign
    // convention (>= 0 → 1, IEEE −0.0 included) is identical SQL on
    // both sides.
    "embed_bq" -> ((s, dir) =>
      Tables.embeddings(s, dir)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
        .select(col("vec_id"), expr(bqHalfExpr("v", 0)).as("code_lo"),
          expr(bqHalfExpr("v", 32)).as("code_hi"))
        .withColumn("n_pos",
          (bit_count(col("code_lo")) + bit_count(col("code_hi"))).cast("long"))
        .orderBy("vec_id")),

    // BQ kNN serving: Hamming scan over the persisted 8 B/vector code
    // table (for a unit-ish corpus Hamming ≈ angle: P[bit differs] =
    // θ/π — SRP with identity planes), keep the C Hamming-nearest
    // candidates per probe map-side (TopKByScore on −hamming), then
    // exact-cosine re-rank the head against the vector store. The scan
    // is deliberately LINEAR in codes — that is the BQ serving model
    // (the 8 B/vector sweep costs ~1/32 of a float scan and shards
    // trivially); IVF/LSH remain the sublinear candidate paths.
    // MEASURED operating point (graft.DebugBq ladder, BASELINE.md):
    // 64 bits rank coarsely on this corpus — a fixed head decays per
    // decade (C=200: 0.95 at 1×, 0.58 at 10×) and holding recall
    // needs C ≈ n/10 (0.9375 at 10×, 0.9625 at 100×), i.e. total cost
    // ≈ scan/32 + n/10 exact dots ≈ 0.13× brute force at ~0.95
    // recall. That bounded-but-honest win is the 1-bit/dim trade at
    // 64 dims (production BQ runs ≥ 512 bits where Hamming
    // concentrates); the documented ladder IS the deliverable.
    // Exempt (Hamming ordering is approximate) — LlmSpec gates recall
    // ≥ 0.9 vs exact sim_topk.
    "ann_query_bq" -> ((s, dir) => {
      import graft.functions.TopKByScore.topk
      val codes = s.table(bqCodes(s, dir))
      // corpus-adaptive rescore head, from the measured ladder above;
      // override via graft.ann.bqRescore
      val n = Tables.rowCount(s, dir, "embeddings")
      val c = s.conf.get("graft.ann.bqRescore",
        math.max(200L, n / 10).toString).toInt
      val p = Similarity.probeBatch(s, dir)
        .select(col("vec_id").as("id_q"), col("v").as("vq"),
          col("nrm").as("nq"))
        .withColumn("qlo", expr(bqHalfExpr("vq", 0)))
        .withColumn("qhi", expr(bqHalfExpr("vq", 32)))
      val cand = codes
        .crossJoin(broadcast(p.select("id_q", "qlo", "qhi")))
        .where(col("idx_id") =!= col("id_q"))
        .select(col("id_q"), col("idx_id"),
          (-(bit_count(col("lo").bitwiseXOR(col("qlo"))) +
            bit_count(col("hi").bitwiseXOR(col("qhi"))))).cast("double")
            .as("nham"))
        .groupBy("id_q")
        .agg(topk(col("nham"), col("idx_id"), c).as("top"))
        .select(col("id_q"), explode(col("top.payload")).as("idx_id"))
      val (_, vt, _, _) = Incremental.annIndex(s, dir)
      Similarity.rerankTopK(s, cand,
        p.select("id_q", "vq", "nq"), vt)
    }),

    // PQ encode + reconstruction quality per vector: the codes (csv so
    // no array reaches the output contract) and cos(v, reconstruction)
    // — the per-vector compression-fidelity number a corpus owner
    // monitors. Exempt (k-means codebook) — LlmSpec gates mean
    // reconstruction cosine and encode determinism.
    "embed_pq" -> ((s, dir) => {
      val book = codebook(s, dir)
      Tables.embeddings(s, dir)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
        .withColumn("codes", encode(col("v"), book))
        .withColumn("r", reconstruct(col("codes"), book))
        .select(col("vec_id"),
          concat_ws(",", col("codes")).as("codes"),
          round(dot(col("v"), col("r")) /
            (sqrt(dot(col("v"), col("v"))) * sqrt(dot(col("r"), col("r")))), 4)
            .as("recon_cos"))
        .orderBy("vec_id")
    }),

    // kNN serving by ADC over the compressed codes: each pinned probe
    // (vec_id < 16, the serving-batch convention) carries an M×Ksub
    // lookup table dt[m][c] = dot(q_m, book[m][c]) (~16 KB per query,
    // broadcast with the probe row); the corpus-side scan reads ONLY
    // the codes artifact — approx dot(q, v) ≈ Σ_m dt[m][codes_m] is M
    // array lookups per (probe, vector), 8 B of corpus bytes instead
    // of 256 — then fused map-side top-1024 per probe (TopKByScore — ~200x the
    // k=5 contract, the deep-re-rank end of the standard PQ recipe;
    // 16 probes x 1024 exact dots is noise next to the ADC scan at any
    // corpus size, and the head is a CONSTANT, not corpus-growing), and
    // an exact cosine re-rank of that bounded head down to the top-5
    // contract. The scan is corpus-linear like brute force but 32×
    // narrower; at cluster scale the same codes artifact partitions
    // under the IVF cells for the IVF-PQ composition. Exempt — recall
    // vs exact sim_topk asserted in LlmSpec.
    "ann_query_pq" -> ((s, dir) => {
      import graft.functions.TopKByScore.topk
      val book = codebook(s, dir)
      val codes = readCodes(s, codesTable(s, dir, book))
      val probes = Tables.embeddings(s, dir).where(col("vec_id") < 16)
        .select(col("vec_id").as("id_q"), col("embedding").cast("array<double>").as("vq"))
        .withColumn("nq", sqrt(dot(col("vq"), col("vq"))))
        .withColumn("dt", graft.functions.PqCodec.pqDistTable(col("vq"), book))
      val adc = codes.crossJoin(broadcast(probes.select("id_q", "dt")))
        .where(col("vec_id") =!= col("id_q"))
        .select(col("id_q"),
          (graft.functions.PqCodec.pqAdc(col("codes"), col("dt")) / col("nrm")).as("adc"),
          col("vec_id"))
        .groupBy("id_q")
        .agg(topk(col("adc"), col("vec_id"), 1024).as("head"))
        .select(col("id_q"), explode(col("head")).as("t"))
        .select(col("id_q"), col("t.payload").as("idx_id"))
      // exact re-rank of the constant head: the ONE shared serving
      // tail over the persisted bucketed vector store (review r12 —
      // the previous inline copy re-scanned and re-normed the whole
      // embeddings table per invocation)
      val pv = probes.select(col("id_q"), col("vq"), col("nq"))
      val (_, vt, _, _) = Incremental.annIndex(s, dir)
      Similarity.rerankTopK(s, adc, pv, vt)
    }),

    // IVF-PQ composition — the production serving shape (the FAISS
    // IVFPQ layout): the IVF inverted lists prune WHICH vectors a probe
    // scores (top-P cells of K = √n, candidates ≈ 2·P·n/K per probe),
    // and the PQ codes shrink WHAT the scoring touches; only the
    // constant ADC head reaches the full-vector store for the exact
    // re-rank. The codes artifact CO-PARTITIONS with the inverted
    // lists at index-build time (ivfPqCodesTable — r12 ADVICE item 3:
    // the previous inline ct⋈codes join plus a corpus-sized
    // candidate-distinct made this the bench's first offender under
    // contention), so serving is ONE pass over the cell-keyed codes
    // with the 16·P-row probe frame broadcast into it — candidate
    // fetch, ADC, and the map-side top-k fuse into the scan; the only
    // shuffle is 16 partial heads. The redundant 2× cell assignment
    // can land a candidate twice (both its cells probed), so the head
    // is 2048 WITH duplicates and dedups after explode: any candidate
    // in the old unique top-1024 has < 1024 unique scores above it,
    // hence < 2048 duplicate-rows above it, hence survives — the head
    // the re-rank sees is a superset of the r12 one BY CONSTRUCTION.
    // Recall is IVF-bounded: the probe width is ivfProbeWidth at the
    // shared servePScale — the same cells ann_query_ivf probes — so
    // cell-probing misses are identical (r12 measured at the shared
    // width, 10× twins corpus: ivfpq ALL-band 0.9625 == pure IVF
    // 0.9625, identical per-band hits — the PQ stage lost zero).
    // Exempt — recall vs exact sim_topk asserted in LlmSpec;
    // 10×/100× recall + timing in RecallProbe/BASELINE.md.
    "ann_query_ivfpq" -> ((s, dir) => {
      import graft.functions.TopKByScore.topk
      val book = codebook(s, dir)
      val n = Tables.rowCount(s, dir, "embeddings")
      val K = Similarity.ivfCells(n)
      val cents = Similarity.learnedCentroids(s, dir, K)
      val cellCodes = ivfPqCodesTable(s, dir, book, cents, K)
      val probes = Similarity.probeBatch(s, dir)
        .withColumn("dt", graft.functions.PqCodec.pqDistTable(col("v"), book))
      // probe width SHARED with ann_query_ivf (ivfProbeWidth at the
      // measured servePScale — review r12: a stale private √K copy
      // here probed 4× fewer cells than the widened IVF key while
      // claiming recall parity with it)
      val P = Similarity.ivfProbeWidth(K)
      val pcells = Similarity.assignCells(probes, cents, P,
          viaBroadcast = Similarity.assignViaBroadcast(K))
        .select(col("vec_id").as("id_q"), col("cell"))
      val adcHead = s.table(cellCodes)
        .join(broadcast(pcells), Seq("cell"))
        .where(col("idx_id") =!= col("id_q"))
        .join(broadcast(probes.select(col("vec_id").as("id_q"), col("dt"))),
          Seq("id_q"))
        .select(col("id_q"),
          (graft.functions.PqCodec.pqAdc(col("codes"), col("dt")) / col("nrm")).as("adc"),
          col("idx_id"))
        .groupBy("id_q")
        .agg(topk(col("adc"), col("idx_id"), 2048).as("head"))
        .select(col("id_q"), explode(col("head")).as("t"))
        .select(col("id_q"), col("t.payload").as("idx_id"))
        .distinct() // head-sized (≤ 16×2048 rows): drop the redundant-
                    // assignment duplicates before the exact re-rank
      val pv = probes.select(col("vec_id").as("id_q"), col("v").as("vq"), col("nrm").as("nq"))
      val (_, vt, _, _) = Incremental.annIndex(s, dir)
      Similarity.rerankTopK(s, adcHead, pv, vt)
    })
  )

  /** Cell-co-partitioned PQ codes (cell, idx_id, codes, nrm) — the
    * FAISS IVFPQ on-disk layout: the inverted lists (ivfIndexTable,
    * redundant top-2 assignment) joined with the codes artifact ONCE
    * per (dir, embeddings fingerprint) at index-build time, bucketed
    * by cell so a probe's candidate fetch is a cell-local stripe read.
    * Serving (ann_query_ivfpq) broadcasts the 16·P probe-cell rows
    * into one pass over this table — no corpus×corpus join and no
    * corpus-sized distinct remain on the query path (r12 ADVICE
    * item 3). Epoch-partitioned like every maintainable index (bulk =
    * epoch −1; maintainIvfPqCodes appends per micro-batch). */
  private[graft] def ivfPqCodesTable(s: SparkSession, dir: String,
      book: Seq[Seq[Seq[Double]]], cents: DataFrame, k: Int): String = {
    val pfx = s"graft_ivfpq_${Tables.pathKey(dir)}_"
    val t = s"$pfx${Tables.pathKey(Tables.fingerprint(dir, "embeddings"))}"
    if (!s.catalog.tableExists(t)) {
      Tables.dropStaleTables(s, pfx)
      val ct = Similarity.ivfIndexTable(s, dir, cents, k)
      writeIvfPqCodes(
        s.table(ct)
          .join(readCodes(s, codesTable(s, dir, book))
            .withColumnRenamed("vec_id", "idx_id"), Seq("idx_id"))
          .select("cell", "idx_id", "codes", "nrm"),
        t, epoch = None)
    }
    t
  }

  /** One vector frame → (cell, idx_id, codes, nrm) rows of the IVFPQ
    * layout, derived DIRECTLY (top-2 assignCells against the frozen
    * coarse centroids + frozen-codebook encode) — the definition the
    * streaming maintainer appends with. The bulk builder instead joins
    * the two existing per-fingerprint artifacts (inverted lists ×
    * codes); StreamSpec pins that the two derivations produce
    * identical rows, so they cannot fork silently. */
  private[graft] def ivfPqRowsOf(vecs: DataFrame, cents: DataFrame,
      k: Int, book: Seq[Seq[Seq[Double]]]): DataFrame = {
    val e = vecs
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
    val assigned = Similarity.assignCells(e, cents, 2,
        Similarity.assignViaBroadcast(k))
      .select(col("vec_id").as("idx_id"), col("cell"))
    e.select(col("vec_id").as("idx_id"),
        encode(col("v"), book).as("codes"), col("nrm"))
      .join(assigned, Seq("idx_id"))
      .select("cell", "idx_id", "codes", "nrm")
  }

  private[graft] def writeIvfPqCodes(rows: DataFrame, table: String,
      epoch: Option[Long]): Unit = epoch match {
    case Some(id) => Incremental.epochInsert(rows, table, id)
    case None => rows.withColumn("epoch", lit(-1L))
      .write.mode("overwrite")
      .partitionBy("epoch")
      .bucketBy(16, "cell").sortBy("cell", "idx_id")
      .format("parquet").saveAsTable(table)
  }

  /** Streaming maintenance of the IVFPQ serving layout (completes the
    * maintainer family for the round-13 cell-co-partitioned artifact —
    * sha/postings/SimHash/chunk/SRP/IVF/BQ/PQ/lexicon and now the
    * composed IVF-PQ): each micro-batch of newly ingested vectors is
    * assigned its top-2 cells against the FROZEN coarse centroids and
    * encoded with the FROZEN codebook (ivfPqRowsOf — the FAISS add()
    * semantics: the index grows, the models retrain on their own
    * policies: ivfRetrainDue for the cells, pqRetrainDue for the book),
    * appended under the same bucketed spec so serving probes stay
    * cell-local. Restart-safe via the shared epoch-partition contract
    * (a replayed epoch rewrites its own partition — assignment and
    * encode are deterministic). */
  def maintainIvfPqCodes(streamingVecs: DataFrame, table: String,
      cents: DataFrame, k: Int, book: Seq[Seq[Seq[Double]]], ckpt: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    streamingVecs.writeStream
      .trigger(trigger)
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        writeIvfPqCodes(ivfPqRowsOf(batch, cents, k, book), table, Some(id))
        ()
      }
      .start()

  val oracleSql: Map[String, String] = Map(
    // sign quantization is deterministic — full SQL twin (the PQ keys
    // stay exempt: k-means codebooks have no SQL form)
    "embed_bq" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |c AS (SELECT vec_id,
        |  CAST(list_sum(list_transform(range(0, 32), i ->
        |    CASE WHEN v[i + 1] >= 0 THEN (1::BIGINT << i) ELSE 0 END)) AS BIGINT) AS code_lo,
        |  CAST(list_sum(list_transform(range(32, 64), i ->
        |    CASE WHEN v[i + 1] >= 0 THEN (1::BIGINT << (i - 32)) ELSE 0 END)) AS BIGINT) AS code_hi
        | FROM e)
        |SELECT vec_id, code_lo, code_hi,
        |  CAST(bit_count(code_lo) + bit_count(code_hi) AS BIGINT) AS n_pos
        |FROM c ORDER BY vec_id""".stripMargin
  )
}
