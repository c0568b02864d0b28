package graft

import org.apache.spark.sql.functions._

/** One-off: mean τ-degree of the mutual-kNN graph per corpus — the
  * measurement behind the percolation-guard threshold. */
object DebugGuard {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.localProbe(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- args) {
      val n = Tables.embeddings(spark, dir).count()
      val edges = SparkEntry.queries("sim_knn_graph_ann")(spark, dir)
        .where(col("cos_sim") >= 0.45).count()
      println(f"RESULT dir=$dir n=$n edgesAtTau=$edges meanDeg=${2.0 * edges / n}%.4f")
    }
    spark.stop()
  }
}
