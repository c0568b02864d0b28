package graft

import org.apache.spark.sql.functions._
import graft.functions.DotProduct.dot
import graft.functions.TopKByScore.topk

/** One-off: BQ serving recall vs exact top-5 across rescore-head sizes.
  * Usage: tools/run.sh graft.DebugBq <dir> <C...> (C=0 → adaptive default) */
object DebugBq {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = GraftSession.localProbe(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
    val probes = e.where(col("vec_id") < 16)
      .select(col("vec_id").as("id_q"), col("v").as("vq"), col("nrm").as("nq"))
    val truth = e.crossJoin(broadcast(probes))
      .where(col("vec_id") =!= col("id_q"))
      .select(col("id_q"),
        (dot(col("vq"), col("v")) / (col("nq") * col("nrm"))).as("cos"),
        col("vec_id"))
      .groupBy("id_q").agg(topk(col("cos"), col("vec_id"), 5).as("top"))
      .select(col("id_q"), explode(col("top.payload")).as("id_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (cArg <- args.drop(1).map(_.toInt)) {
      if (cArg > 0) spark.conf.set("graft.ann.bqRescore", cArg.toString)
      else spark.conf.unset("graft.ann.bqRescore")
      val t0 = System.nanoTime()
      val ann = SparkEntry.queries("ann_query_bq")(spark, dir)
        .select("id_q", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val secs = (System.nanoTime() - t0) / 1e9
      val recall = truth.count(ann.contains).toDouble / truth.size
      println(f"BQ dir=$dir C=$cArg recall=$recall%.4f secs=$secs%.1f")
    }
    spark.stop()
  }
}
