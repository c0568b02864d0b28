package graft

import org.apache.spark.sql.functions._

/** Scratch stage-timing harness for the trigram-Jaccard path (not a
  * driver surface; used to locate the 100× bottleneck). */
object DebugNg {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    val dir = args(0)
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime; val r = f
      println(f"STAGE $label%-24s ${(System.nanoTime - t0) / 1e9}%8.2f s"); r
    }
    if (args.length > 1 && args(1) == "keys") {
      // generic drift-immune instrument: alternate the named SparkEntry
      // keys for 3 rounds in one JVM; compare per-key minima
      // noop-format write, NOT count() — count() lets the optimizer
      // prune cardinality-preserving joins (the round-4 Profile lesson;
      // re-learned here when dedup_embed_lsh "ran" in 0.8 s)
      val keys = args.drop(2)
      for (i <- 1 to 3; k <- keys)
        time(f"$k%-24s r$i")(
          SparkEntry.queries(k)(spark, dir)
            .write.format("noop").mode("overwrite").save())
      spark.stop(); return
    }
    if (args.length > 1 && args(1) == "editchunks") {
      // posting-size distribution + candidate counts for the CDC chunk
      // blocking at several df caps (dedup_edit_banded tuning)
      import graft.llm.Dedup
      val d = Tables.documents(spark, dir)
        .repartition(col("doc_id"))
        .select(col("doc_id"), col("text"), col("n_chars"))
      for (cap <- Seq(20, 40, 100, 200)) {
        val c = time(s"cap=$cap candidates")(
          Dedup.editChunkCandidates(d, 4, cap, 12).count())
        println(s"  cap=$cap candidate pairs = $c")
      }
      spark.stop(); return
    }
    if (args.length > 1 && args(1) == "editstages") {
      // stage decomposition of the chunk-candidate miner (round 9:
      // where do dedup_edit_banded's ~5 s go once the verify is
      // amortized into the artifact?)
      import graft.llm.Dedup
      val d = Tables.documents(spark, dir)
        .repartition(col("doc_id"))
        .select(col("doc_id"), col("text"), col("n_chars"))
      println("docs=" + d.count())
      val ck = Dedup.chunkKeys(d, 4)
      for (i <- 1 to 2) time(s"chunkKeys r$i")(println("  n=" + ck.count()))
      val posting = ck.groupBy("g1", "g2")
        .agg(sort_array(collect_list(struct(col("doc_id"), col("n_chars"))))
          .as("ds"))
        .where(size(col("ds")).between(2, 100))
      for (i <- 1 to 2) time(s"posting r$i")(println("  n=" + posting.count()))
      val cand = Dedup.editChunkCandidates(d, 4, 100, 12)
      for (i <- 1 to 2) time(s"cand r$i")(println("  n=" + cand.count()))
      spark.stop(); return
    }
    if (args.length > 1 && args(1) == "ivfassign") {
      // A/B the two assignCells shapes at the current corpus scale
      import graft.llm.Similarity
      import graft.functions.DotProduct.dot
      val emb = Tables.embeddings(spark, dir)
      val n = emb.count()
      val k = Similarity.ivfCells(n)
      val cents = Similarity.learnedCentroids(spark, dir, k).localCheckpoint()
      val e = emb.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
        .withColumn("nrm", sqrt(dot(col("v"), col("v")))).localCheckpoint()
      for (i <- 1 to 3) {
        time(s"literal-k$k-$i")(println("  rows=" +
          Similarity.assignCells(e, cents, 2, viaBroadcast = false).count()))
        time(s"broadcast-k$k-$i")(println("  rows=" +
          Similarity.assignCells(e, cents, 2, viaBroadcast = true).count()))
      }
      spark.stop(); return
    }
    if (args.length > 1 && args(1) == "ivfkey") {
      // same-JVM A/B of the FULL sim_ivf_ann body under both assignment
      // shapes (the key itself hardwires assignViaBroadcast)
      import graft.llm.Similarity
      import graft.functions.DotProduct.dot
      val emb = Tables.embeddings(spark, dir)
      val n = emb.count()
      val k = Similarity.ivfCells(n)
      val bits2 = Similarity.ivfSubBits(n, k, 5)
      val cents = Similarity.learnedCentroids(spark, dir, k).localCheckpoint()
      def body(viaBroadcast: Boolean): Long = {
        val e = emb.repartition(col("vec_id"))
          .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
          .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
        val assigned = Similarity.assignCells(e, cents, 5, viaBroadcast)
        val probe = (if (bits2 == 0) assigned
          else assigned.join(Similarity.srpBuckets(e, Similarity.L, bits2), Seq("vec_id")))
          .localCheckpoint()
        val keys = if (bits2 == 0) Seq("cell") else Seq("cell", "tbl", "sig")
        val cands = probe.select(col("vec_id").as("id_a") +: keys.map(col): _*)
          .join(probe.select(col("vec_id").as("id_b") +: keys.map(col): _*), keys)
          .where(col("id_a") < col("id_b"))
          .select("id_a", "id_b").distinct()
        val a = e.select(col("vec_id").as("id_a"), col("v").as("va"), col("nrm").as("na"))
        val b = e.select(col("vec_id").as("id_b"), col("v").as("vb"), col("nrm").as("nb"))
        cands.join(a, Seq("id_a")).join(b, Seq("id_b"))
          .withColumn("cos", dot(col("va"), col("vb")) / (col("na") * col("nb")))
          .where(col("cos") > 0.4).count()
      }
      for (i <- 1 to 3) {
        time(s"ivfkey-literal-$i")(println("  rows=" + body(false)))
        time(s"ivfkey-broadcast-$i")(println("  rows=" + body(true)))
      }
      spark.stop(); return
    }
    if (args.length > 1 && args(1) == "dupspans") {
      // same-JVM A/B: hashed 128-bit window keys vs literal strings
      val d = Tables.documents(spark, dir)
      for (i <- 1 to 3) {
        time(s"hashed-$i")(graft.llm.Text3.dupSpans(d, hashed = true)
          .write.format("noop").mode("overwrite").save())
        time(s"string-$i")(graft.llm.Text3.dupSpans(d, hashed = false)
          .write.format("noop").mode("overwrite").save())
      }
      spark.stop(); return
    }
    if (args.length > 1 && args(1) == "pqmaint") {
      // PQ codes maintenance probe: time a pinned 200-vector delta
      // encode-and-append against the frozen codebook at any corpus
      // scale (flat = cost ∝ delta · M · Ksub · SubDim, not corpus)
      import graft.llm.Quantize
      val emb = Tables.embeddings(spark, dir)
      val n = emb.count()
      val book = time("codebook")(Quantize.codebook(spark, dir))
      val path = s"/tmp/pqmaint_probe_${Tables.pathKey(dir)}"
      time(s"codes-build-n$n")(
        Quantize.buildPqCodes(emb, path, book, "batch_init"))
      val delta = emb.where(col("vec_id") < 200)
      time("maint-append-200")(
        Quantize.buildPqCodes(delta, path, book, "batch_delta"))
      val baseline = time("fidelity-baseline")(
        Quantize.bookFidelity(spark, dir, book))
      println(f"  baseline=$baseline%.4f")
      time("retrain-check")(
        println("  retrainDue=" + Quantize.pqRetrainDue(emb, book, baseline)))
      spark.stop(); return
    }
    if (args.length > 1 && args(1) == "ivfmaint") {
      // IVF maintenance probe: time a pinned 200-vector delta append
      // against the persisted quantizer at any corpus scale (flat =
      // cost ∝ delta · K · dim, not corpus)
      import graft.llm.{Incremental, Similarity}
      val emb = Tables.embeddings(spark, dir)
      val n = emb.count()
      val k = Similarity.ivfCells(n)
      val cents = time("kmeans-centroids")(
        Similarity.learnedCentroids(spark, dir, k).localCheckpoint())
      val t = "ivfmaint_probe"
      Tables.dropStaleTables(spark, t)
      time(s"index-build-n$n-k$k")(
        Incremental.buildIvfIndex(emb, t, cents, k, epoch = None))
      val delta = emb.where(col("vec_id") < 200)
      time("maint-append-200")(
        Incremental.buildIvfIndex(delta, t, cents, k, epoch = Some(0L)))
      time("retrain-check")(
        println("  retrainDue=" + Incremental.ivfRetrainDue(spark, t, k)))
      spark.stop(); return
    }
    val docs = Tables.documents(spark, dir)
    if (args.length > 1 && args(1) == "ab") {
      // same-JVM A/B of the full keys, alternating, immune to host drift
      for (i <- 1 to 3) {
        time(s"hashed-full-$i")(println("  rows=" +
          graft.llm.Dedup.ngramJaccardPairs(docs, 0.5).count()))
        time(s"string-full-$i")(println("  rows=" +
          graft.llm.Dedup.ngramJaccardPairsPostings(docs, 0.5).count()))
      }
      spark.stop(); return
    }
    val tg = graft.llm.Dedup.trigrams(docs)
    time("tg-count")(println("  rows=" + tg.count()))
    val posting = tg.groupBy("ng")
      .agg(sort_array(collect_list(col("doc_id"))).as("ds"))
      .where(size(col("ds")) <= 20)
    val p2 = time("posting-agg+checkpoint")(posting.localCheckpoint())
    time("posting-count")(println("  rows=" + p2.count()))
    time("sizes")(println("  rows=" + p2.select(explode(col("ds")).as("doc_id"))
      .groupBy("doc_id").agg(count(lit(1)).as("n")).count()))
    time("minhash-sig")(println("  rows=" + {
      val L = 8
      p2.select(col("ng"), explode(col("ds")).as("doc_id"))
        .groupBy("doc_id").agg(
          min(xxhash64(lit(0), col("ng"))).as("h0"),
          (1 until L).map(t => min(xxhash64(lit(t), col("ng"))).as(s"h$t")): _*)
        .count()
    }))
    time("pair-mine-unfiltered")(println("  rows=" + p2.where(size(col("ds")) >= 2)
      .select(explode(flatten(transform(col("ds"), (a, i) =>
        transform(slice(col("ds"), i + 2, size(col("ds"))),
          b => struct(a.as("id_a"), b.as("id_b")))))).as("p"))
      .groupBy(col("p.id_a"), col("p.id_b")).agg(count(lit(1)))
      .count()))

    // ---- prefiltered (hashed) path, stage by stage -------------------
    import graft.functions.BloomMightContain
    val tgh = tg.select(xxhash64(lit(0), col("ng")).as("g1"),
      xxhash64(lit(1), col("ng")).as("g2"), col("doc_id"))
    val ph = time("H-posting-agg+ckpt")(tgh.groupBy("g1", "g2")
      .agg(sort_array(collect_list(col("doc_id"))).as("ds"))
      .where(size(col("ds")) <= 20)
      .localCheckpoint())
    val L = 8
    val sig = ph.select(col("g1"), col("g2"), explode(col("ds")).as("doc_id"))
      .groupBy("doc_id").agg(
        min(xxhash64(lit(0), col("g1"), col("g2"))).as("h0"),
        (1 until L).map(t =>
          min(xxhash64(lit(t), col("g1"), col("g2"))).as(s"h$t")): _*)
    val banded = sig.select(col("doc_id"),
      explode(array((0 until L).map(t =>
        struct(lit(t).as("tbl"), col(s"h$t").as("h"))): _*)).as("b"))
      .select(col("doc_id"), col("b.tbl").as("tbl"), col("b.h").as("h"))
    val candDocs = time("candDocs+ckpt")(banded
      .join(banded.groupBy("tbl", "h").agg(count(lit(1)).as("c"))
        .where(col("c") >= 2), Seq("tbl", "h"))
      .select("doc_id").distinct()
      .localCheckpoint())
    time("candDocs-count")(println("  rows=" + candDocs.count()))
    val bf = time("bloom-build")(BloomMightContain.buildFor(candDocs, "doc_id"))
    time("pair-mine-filtered")(println("  rows=" + ph
      .select(filter(col("ds"), d => BloomMightContain.prune(d, bf)).as("ds"))
      .where(size(col("ds")) >= 2)
      .select(explode(flatten(transform(col("ds"), (a, i) =>
        transform(slice(col("ds"), i + 2, size(col("ds"))),
          b => struct(a.as("id_a"), b.as("id_b")))))).as("p"))
      .groupBy(col("p.id_a"), col("p.id_b")).agg(count(lit(1)))
      .count()))
    spark.stop()
  }
}
