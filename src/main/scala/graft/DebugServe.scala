package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.DotProduct.dot

/** ANN-serving recall ladder (not a driver surface; VERDICT r06 item 4):
  * measures ann_query_range recall per multi-probe radius and
  * ann_query_ivf recall per probe-width scale against brute-force
  * ground truth on a ScaleGen corpus, so the serving knobs are chosen
  * from a measured curve instead of the textbook prediction alone.
  * Usage: tools/run.sh graft.DebugServe [scaleDir]
  */
object DebugServe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf10")
    val spark = GraftSession.localProbe(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
    // the pinned serving probe batch (the probeBatch convention)
    val probes = e.where(col("vec_id") < 16)
      .select(col("vec_id").as("id_q"), col("v").as("vq"), col("nrm").as("nq"))
    // brute-force scored corpus for the 16 probes: 16·n dots
    val scored = e.crossJoin(broadcast(probes))
      .where(col("vec_id") =!= col("id_q"))
      .select(col("id_q"), col("vec_id").as("id_m"),
        (dot(col("vq"), col("v")) / (col("nq") * col("nrm"))).as("cos"))
      .localCheckpoint()
    val rangeTruth = scored.where(round(col("cos"), 6) >= 0.3)
      .select("id_q", "id_m").localCheckpoint()
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("id_q").orderBy(col("cos").desc, col("id_m"))
    val topkTruth = scored.withColumn("rn", row_number().over(w))
      .where(col("rn") <= 5).select("id_q", "id_m").localCheckpoint()
    println(s"truth: range=${rangeTruth.count()} topk=${topkTruth.count()}")

    def recall(tag: String, truth: DataFrame, approx: DataFrame): Unit = {
      val t0 = System.nanoTime()
      val a = approx.localCheckpoint()
      val secs = (System.nanoTime() - t0) / 1e9
      val hits = truth.join(a, Seq("id_q", "id_m"), "left_semi").count()
      val tot = truth.count()
      println(f"$tag%-28s recall=${hits.toDouble / tot}%.4f ($hits/$tot) cand_rows=${a.count()} secs=$secs%.1f")
    }
    for (r <- Seq(2, 3))
      recall(s"ann_query_range r=$r", rangeTruth,
        graft.llm.Similarity.rangeServe(spark, dir, r).select("id_q", "id_m"))
    for (ps <- Seq(1.0, 2.0, 4.0))
      recall(s"ann_query_ivf pScale=$ps", topkTruth,
        graft.llm.Similarity.ivfServe(spark, dir, ps)
          .select(col("id_q"), col("id_b").as("id_m")))
    spark.stop()
  }
}
