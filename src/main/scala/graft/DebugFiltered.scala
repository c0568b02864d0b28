package graft

import org.apache.spark.sql.functions._
import graft.functions.DotProduct.dot
import graft.functions.TopKByScore.topk

/** One-off: filtered-ANN serving recall vs the exact label-filtered
  * top-5 at scale geometry (the fixture's B=3 ring is exhaustive, so
  * only 10×/100× exercise the real selectivity of the radius-3 probe
  * ring under a ~10%-selective predicate).
  * Usage: tools/run.sh graft.DebugFiltered <dir...> */
object DebugFiltered {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- args) {
      val e = Tables.embeddings(spark, dir)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"),
          col("label").cast("long").as("label"))
        .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
      val probes = e.where(col("vec_id") < 16)
        .select(col("vec_id").as("id_q"), col("v").as("vq"), col("nrm").as("nq"))
      val exact = e.crossJoin(broadcast(probes))
        .where(col("vec_id") =!= col("id_q") &&
          col("label") === col("id_q") % 10)
        .select(col("id_q"),
          (dot(col("vq"), col("v")) / (col("nq") * col("nrm"))).as("cos"),
          col("vec_id"))
        .groupBy("id_q").agg(topk(col("cos"), col("vec_id"), 5).as("top"))
        .select(col("id_q"), explode(col("top.payload")).as("id_b"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val ann = SparkEntry.queries("ann_query_filtered")(spark, dir)
        .select("id_q", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val recall = exact.count(ann.contains).toDouble / exact.size
      println(f"FILTERED dir=$dir exact=${exact.size} ann=${ann.size} recall=$recall%.4f")
    }
    spark.stop()
  }
}
