package graft

import org.apache.spark.sql.functions._
import graft.functions.DotProduct.dot

/** One-off: the cells-resolver P ladder on a twins ScaleGen corpus —
  * twin dedup recall per band, max component, drop count per P.
  * Usage: tools/run.sh graft.DebugCells <twinsDir> <P...> */
object DebugCells {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = GraftSession.localProbe(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
    val twinTruth = e.where(pmod(col("vec_id"), lit(10000000L)) >= 5000000L)
      .select((col("vec_id") - 5000000L).as("id_a"), col("vec_id").as("id_b"),
        col("v").as("vb"), col("nrm").as("nb"))
      .join(e.select(col("vec_id").as("id_a"), col("v").as("va"), col("nrm").as("na")),
        Seq("id_a"))
      .select(col("id_a"), col("id_b"),
        (dot(col("va"), col("vb")) / (col("na") * col("nb"))).as("cos"))
      .localCheckpoint()
    val band = when(col("cos") >= 0.95, "[0.95,1.00]")
      .when(col("cos") >= 0.90, "[0.90,0.95)")
      .when(col("cos") >= 0.70, "[0.70,0.90)").otherwise("lo")
    for (p <- args.drop(1).map(_.toInt)) {
      spark.conf.set("graft.semantic.cellsProbes", p.toString)
      val out = SparkEntry.queries("dedup_semantic_cells")(spark, dir)
        .select(col("vec_id"), col("cluster_id"), col("keep")).localCheckpoint()
      val keep = out.select("vec_id", "keep")
      val rows = twinTruth
        .join(keep.select(col("vec_id").as("id_a"), col("keep").as("keep_a")), Seq("id_a"))
        .join(keep.select(col("vec_id").as("id_b"), col("keep").as("keep_b")), Seq("id_b"))
        .groupBy(band.as("band"))
        .agg(count(lit(1)).as("t"),
          sum(when(col("keep_a") && col("keep_b"), 1).otherwise(0)).as("both"))
        .orderBy(desc("band")).collect()
      val rec = rows.map(r => f"${r.getString(0)}=${(r.getLong(1) - r.getLong(2)).toDouble / r.getLong(1)}%.4f").mkString(" ")
      val mx = out.groupBy("cluster_id").agg(count(lit(1)).as("sz"))
        .agg(max(col("sz"))).head().getLong(0)
      val dropped = out.where(!col("keep")).count()
      println(s"LADDER P=$p recall: $rec max_component=$mx dropped=$dropped of ${out.count()}")
    }
    spark.stop()
  }
}
