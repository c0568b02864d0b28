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
        Incremental.buildIvfIndex(emb, t, cents, k, append = false))
      val delta = emb.where(col("vec_id") < 200)
      time("maint-append-200")(
        Incremental.buildIvfIndex(delta, t, cents, k, append = true))
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
