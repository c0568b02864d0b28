package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Scratch sizing for dedup_weighted_jaccard (round 8). */
object DebugWeighted {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    s.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(s, dir)
    def time(tag: String)(f: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val tot = docs.select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("s"))
    // admission = trigram set-Jaccard >= 0.3 off the shared mining
    // pass — the SHIPPED key's predicate (ADVICE r08: an earlier
    // length-ratio stand-in measured a different candidate set)
    def cand = graft.llm.Dedup.ngramSharedCountsPublic(docs)
      .where(col("shared").cast("double") /
        (col("na") + col("nb") - col("shared")) >= 0.3)
      .select(col("id_a"), col("id_b"))
      .join(tot.select(col("doc_id").as("id_a"), col("s").as("sa")), Seq("id_a"))
      .join(tot.select(col("doc_id").as("id_b"), col("s").as("sb")), Seq("id_b"))
    val tf = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    def variantExplodeBcast = cand
      .join(broadcast(tf.select(col("doc_id").as("id_a"), col("tok"), col("tf").as("tfa"))), Seq("id_a"))
      .join(broadcast(tf.select(col("doc_id").as("id_b"), col("tok"), col("tf").as("tfb"))), Seq("id_b", "tok"))
      .groupBy("id_a", "id_b", "sa", "sb")
      .agg(sum(least(col("tfa"), col("tfb"))).as("minsum"))
      .withColumn("wraw", col("minsum").cast("double") / (col("sa") + col("sb") - col("minsum")))
      .where(col("wraw") >= 0.5)
      .select(col("id_a"), col("id_b"), round(col("wraw"), 4).as("wjacc"))
    val tfm = tf.groupBy("doc_id")
      .agg(map_from_entries(collect_list(struct(col("tok"), col("tf")))).as("m"))
    def variantMapBcast = cand
      .join(broadcast(tfm.select(col("doc_id").as("id_a"), col("m").as("ma"))), Seq("id_a"))
      .join(broadcast(tfm.select(col("doc_id").as("id_b"), col("m").as("mb"))), Seq("id_b"))
      .withColumn("minsum", expr(
        "aggregate(map_keys(ma), 0L, (acc, k) -> acc + least(element_at(ma, k), coalesce(element_at(mb, k), 0L)))"))
      .withColumn("wraw", col("minsum").cast("double") / (col("sa") + col("sb") - col("minsum")))
      .where(col("wraw") >= 0.5)
      .select(col("id_a"), col("id_b"), round(col("wraw"), 4).as("wjacc"))
    time("explode+bcast (cold)")(variantExplodeBcast)
    time("explode+bcast (warm)")(variantExplodeBcast)
    time("map+bcast (cold)")(variantMapBcast)
    time("map+bcast (warm)")(variantMapBcast)
    s.stop()
  }
}
