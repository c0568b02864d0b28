package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-dedup stage probe (not a driver surface): decomposes
  * dedup_edit_near's cost into candidate enumeration, text fetch, and
  * thresholded-levenshtein verify, under both the fused (texts ride the
  * band join) and candidates-then-verify shapes, so the restructure
  * decision is measured rather than guessed.
  * Usage: tools/run.sh graft.DebugEdit [sfDir] */
object DebugEdit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    val k = 12
    val width = k + 1
    def time(tag: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val t1 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"$tag%-28s cold=${(t1 - t0) / 1e9}%6.2f warm=${(System.nanoTime() - t1) / 1e9}%6.2f")
    }
    val d = Tables.documents(spark, sfDir)
      .repartition(col("doc_id"))
      .select(col("doc_id"), col("text"), col("n_chars"))
    val bkt = (c: Column) => floor(c / width)
    def bands(idCol: String, lenCol: String, explode3: Boolean) = {
      val base = d.select(col("doc_id").as(idCol), col("text").as(s"t_$idCol"),
        col("n_chars").as(lenCol))
      if (!explode3) base.withColumn("bkt", bkt(col(lenCol)))
      else base.withColumn("bkt", explode(array(
        bkt(col(lenCol)) - 1, bkt(col(lenCol)), bkt(col(lenCol)) + 1)))
    }
    val candFused = bands("id_a", "la", false).join(bands("id_b", "lb", true), Seq("bkt"))
      .where(col("id_a") < col("id_b") && abs(col("la") - col("lb")) <= k)
    println("candidates = " + candFused.count())
    time("cand ids only")(candFused.select("id_a", "id_b"))
    time("cand + texts (fused)")(candFused.select(length(col("t_id_a")) + length(col("t_id_b"))))
    time("fused + lev")(candFused
      .withColumn("dist", levenshtein(col("t_id_a"), col("t_id_b"), k).cast("long"))
      .where(col("dist") >= 0).select("id_a", "id_b", "dist"))
    // (the unthresholded-levenshtein variant was measured here in r6 —
    // full DP over every candidate, ~20× the banded form — and removed
    // so the probe stays minutes-free; thresholded won, permanently)
    // candidates-then-verify: ids-only band join, texts fetched via two
    // broadcast lookups of the (dimension-sized) doc table — the
    // exploded band side never carries text
    val candIds = bands("id_a", "la", false).drop("t_id_a")
      .join(bands("id_b", "lb", true).drop("t_id_b"), Seq("bkt"))
      .where(col("id_a") < col("id_b") && abs(col("la") - col("lb")) <= k)
      .select("id_a", "id_b")
    val ta = d.select(col("doc_id").as("id_a"), col("text").as("ta"))
    val tb = d.select(col("doc_id").as("id_b"), col("text").as("tb"))
    time("cand->bcast fetch + lev")(candIds
      .join(broadcast(ta), Seq("id_a")).join(broadcast(tb), Seq("id_b"))
      .withColumn("dist", levenshtein(col("ta"), col("tb"), k).cast("long"))
      .where(col("dist") >= 0).select("id_a", "id_b", "dist"))
    spark.stop()
  }
}
