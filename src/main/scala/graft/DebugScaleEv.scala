package graft

import org.apache.spark.sql.functions._

/** Scratch: events-only scaled corpora for wave-4 posture probes (the
  * six Broker keys read only the events table). */
object DebugScaleEv {
  def main(args: Array[String]): Unit = {
    val (src, out, n) = (args(0), args(1), args(2).toInt)
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
    spark.sparkContext.setLogLevel("WARN")
    val ev = Tables.events(spark, src)
    (0 until n).map { c =>
      ev.select((col("event_id") + c * 1000000000L).as("event_id"), col("ts"),
        (col("user_id") + c * 1000000L).as("user_id"),
        col("event_type"), col("value"), col("props"))
    }.reduce(_ unionByName _)
      .repartition(32).write.mode("overwrite").parquet(s"$out/events.parquet")
    val docs = spark.read.parquet(s"$src/documents.parquet")
    (0 until n).map { c =>
      docs.select((col("doc_id") + c * 10000000L).as("doc_id"),
        col("text"), col("lang"), col("source"), col("n_chars"))
    }.reduce(_ unionByName _)
      .repartition(32).write.mode("overwrite").parquet(s"$out/documents.parquet")
    println(s"wrote ${n}x events+documents of $src to $out")
    spark.stop()
  }
}
