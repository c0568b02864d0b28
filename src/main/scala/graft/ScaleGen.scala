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
  *    n² structure into any |cos|-sensitive key).
  *  - events/orders/lineitem/customer: key spaces shifted per copy
  *    (consistent across join keys); dims (nation/region/part/supplier)
  *    stay single-copy, as dims do at real scale.
  *
  * Usage: tools/run.sh graft.ScaleGen <srcSfDir> <outDir> <copies>
  */
object ScaleGen {
  def main(args: Array[String]): Unit = {
    val Array(src, out, nStr) = args
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
    copies { c =>
      val rot = c % 64
      val rotated = if (rot == 0) col("embedding")
        else concat(slice(col("embedding"), rot + 1, 64 - rot), slice(col("embedding"), 1, rot))
      val signed = if ((c / 64) % 2 == 0) rotated
        else transform(rotated, (x, i) => when(i % 2 === 0, -x).otherwise(x))
      emb.select((col("vec_id") + c * 10000000L).as("vec_id"),
        signed.as("embedding"), col("label"))
    }.repartition(32).write.mode("overwrite").parquet(s"$out/embeddings.parquet")

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
