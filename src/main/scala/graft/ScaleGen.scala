package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-up probe data generator (not a driver surface): replicates the
  * sf0.1 fixtures N× into an output dir so the heavy operators can be
  * profiled at ~10× data — the "would this survive a scale-up" check
  * that the 100 TB design claims rest on.
  *
  * Replication is shard-like, not naive copying, so workload STRUCTURE
  * is preserved instead of distorted:
  *  - documents: ids shifted per copy; every token suffixed `_c<copy>`
  *    (copy 0 unchanged) — near-dup structure is identical WITHIN a
  *    copy but trigram/shingle sets are disjoint ACROSS copies, so
  *    dedup candidate counts scale linearly, as independent shards
  *    would, instead of quadratically as naive duplication would force.
  *  - embeddings: ids shifted; the vector is circularly rotated by
  *    copy % 64, and every 64-copy "era" additionally negates the
  *    even-indexed coordinates — within-copy cosine structure is
  *    exactly preserved (rotation and a fixed ±1 diagonal are both
  *    isometries), cross-copy vectors decorrelate: copies 64 apart
  *    share the rotation but differ by the half-negation, giving
  *    cos ≈ (Σodd − Σeven)/|v|² ≈ 0 on random-ish data (a FULL
  *    negation here would make them exactly anti-correlated —
  *    cos = −1 — which is still linear dependence and would leak
  *    n² structure into any |cos|-sensitive key). Known tail
  *    (ADVICE r05): that cross-era cosine has std ≈ 0.18 for 64-dim
  *    data, so at > 64 copies ~1% of same-base cross-era twins land
  *    past |cos| = 0.4 — an O(n) population of spurious near-threshold
  *    pairs. Any ±1 diagonal (random signs included) has the same
  *    tail, so it is documented rather than re-engineered: read 100×
  *    probe deltas at the 0.4 threshold with that floor in mind, and
  *    measure recall against PLANTED pairs (below), not raw pair
  *    counts.
  *
  * With a 4th arg `twins`, embeddings additionally get PLANTED
  * near-duplicate twins for recall measurement at scale (VERDICT r05
  * item 1 — the regime where the corpus-adaptive LSH geometry engages):
  * every 10th vector of every copy gains a perturbed twin at
  * vec_id + 5 000 000 (inside the copy's 1e7 id stripe, so twin pairs
  * are within-copy and survive the isometries by construction). The
  * perturbation is deterministic hash noise x_i + δ·u_i
  * (u_i ~ U[-0.5, 0.5] from xxhash64(vec_id, i)) with δ cycling
  * {0.088, 0.142, 0.21} by vec_id%3, placing twin cosines in three
  * bands ≈ {0.98, 0.95, 0.90} (unit-norm fixture vectors:
  * cos ≈ 1/√(1+(2.31δ)²)). graft.RecallProbe recovers the pairs as
  * (id, id+5e6) and measures per-band recall of the approximate keys.
  *  - events/orders/lineitem/customer: key spaces shifted per copy
  *    (consistent across join keys); dims (nation/region/part/supplier)
  *    stay single-copy, as dims do at real scale. NOTE (ADVICE r11):
  *    the c·1e9 event_id offsets leave gaps between copies, so scaled
  *    events are BENCH-POSTURE-ONLY for the dense-position broker keys
  *    (invariants like pos_checksum = n(n−1)/2 or "every slot holds
  *    exactly R" hold per copy, not across the corpus); runtime
  *    scaling is unaffected — slot/ledger arithmetic costs the same on
  *    sparse ids.
  *
  * Usage: tools/run.sh graft.ScaleGen <srcSfDir> <outDir> <copies> [twins]
  */
object ScaleGen {

  /** The rotated-copy embedding replication (header notes on the
    * isometries and the documented near-threshold cross-copy tail),
    * factored out so main() and the percolation-guard test build the
    * SAME corpus: at enough copies the O(n) spurious tail percolates
    * the τ = 0.45 graph — the regime the guard exists to catch. */
  def embeddingCopies(emb: DataFrame, n: Int, plantTwins: Boolean): DataFrame = {
    val embCopies = (0 until n).map { c =>
      val rot = c % 64
      val rotated = if (rot == 0) col("embedding")
        else concat(slice(col("embedding"), rot + 1, 64 - rot), slice(col("embedding"), 1, rot))
      val signed = if ((c / 64) % 2 == 0) rotated
        else transform(rotated, (x, i) => when(i % 2 === 0, -x).otherwise(x))
      emb.select((col("vec_id") + c * 10000000L).as("vec_id"),
        signed.as("embedding"), col("label"))
    }.reduce(_ unionByName _)
    if (!plantTwins) embCopies else {
      val delta = element_at(
        array(lit(0.088), lit(0.142), lit(0.21)),
        (pmod(col("vec_id"), lit(3)) + 1).cast("int"))
      val twins = embCopies.where(pmod(col("vec_id"), lit(10)) === 0)
        .select((col("vec_id") + 5000000L).as("vec_id"),
          transform(col("embedding").cast("array<double>"), (x, i) =>
            x + delta * (pmod(xxhash64(col("vec_id"), i), lit(100000L)) / 100000.0 - 0.5))
            .cast("array<float>").as("embedding"),
          col("label"))
      embCopies.unionByName(twins)
    }
  }

  def main(args: Array[String]): Unit = {
    val (src, out, nStr) = (args(0), args(1), args(2))
    val plantTwins = args.length > 3 && args(3) == "twins"
    val n = nStr.toInt
    require(n >= 1 && n <= 128, "copies must be in [1, 128] (embedding rotation + era sign)")
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
    spark.sparkContext.setLogLevel("WARN")

    def copies(build: Int => DataFrame): DataFrame =
      (0 until n).map(build).reduce(_ unionByName _)

    val docs = spark.read.parquet(s"$src/documents.parquet")
    copies { c =>
      val text = if (c == 0) col("text")
        else concat_ws(" ", transform(split(col("text"), " "),
          t => concat(t, lit(s"_c$c"))))
      docs.select(
        (col("doc_id") + c * 10000000L).as("doc_id"),
        text.as("text"), col("lang"), col("source"))
        .withColumn("n_chars", length(col("text")).cast("long"))
    }.repartition(32).write.mode("overwrite").parquet(s"$out/documents.parquet")

    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    embeddingCopies(emb, n, plantTwins)
      .repartition(32).write.mode("overwrite").parquet(s"$out/embeddings.parquet")

    // via Tables.events: the ns-timestamp column normalizes to µs
    // TimestampType (raw read refuses TIMESTAMP(NANOS)); the copy is
    // written back as ordinary µs parquet, which Tables.events passes
    // through unchanged
    val ev = Tables.events(spark, src)
    copies { c =>
      ev.select((col("event_id") + c * 1000000000L).as("event_id"), col("ts"),
        (col("user_id") + c * 1000000L).as("user_id"),
        col("event_type"), col("value"), col("props"))
    }.repartition(32).write.mode("overwrite").parquet(s"$out/events.parquet")

    val ord = spark.read.parquet(s"$src/orders.parquet")
    copies { c =>
      ord.select((col("o_orderkey") + c * 1000000000L).as("o_orderkey"),
        (col("o_custkey") + c * 1000000L).as("o_custkey"),
        col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
        col("o_orderpriority"))
    }.repartition(32).write.mode("overwrite").parquet(s"$out/orders.parquet")

    val li = spark.read.parquet(s"$src/lineitem.parquet")
    copies { c =>
      li.withColumn("l_orderkey", col("l_orderkey") + c * 1000000000L)
    }.repartition(32).write.mode("overwrite").parquet(s"$out/lineitem.parquet")

    val cust = spark.read.parquet(s"$src/customer.parquet")
    copies { c =>
      cust.withColumn("c_custkey", col("c_custkey") + c * 1000000L)
    }.repartition(32).write.mode("overwrite").parquet(s"$out/customer.parquet")

    Seq("nation", "region", "part", "supplier").foreach { t =>
      spark.read.parquet(s"$src/$t.parquet")
        .write.mode("overwrite").parquet(s"$out/$t.parquet")
    }
    println(s"wrote ${n}x of $src to $out")
    spark.stop()
  }
}
