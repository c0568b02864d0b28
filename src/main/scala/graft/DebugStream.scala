package graft

import graft.streaming.{MessageSource, Pipeline}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** Scratch repro for the StreamSpec file-stream == batch failures. */
object DebugStream {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.001"
    val spark = GraftSession.tuned(
      org.apache.spark.sql.SparkSession.builder()
        .master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val streamDir = Files.createTempDirectory("graft_dbg_stream")
    Files.copy(java.nio.file.Paths.get(s"$dir/events.parquet"),
      streamDir.resolve("events.parquet"))
    val ckpt = Files.createTempDirectory("graft_dbg_ckpt").toString

    val raw = MessageSource.fileStream(spark, streamDir.toString)
    println("stream schema: " + raw.schema.simpleString)

    val q = Pipeline.tumbling(raw)
      .writeStream.outputMode("complete")
      .format("memory").queryName("dbg_tumbling")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = spark.table("dbg_tumbling")
    val batch = Pipeline.tumbling(Tables.events(spark, dir))
    println("streamed rows = " + streamed.count())
    println("batch    rows = " + batch.count())
    println("-- streamed sample --")
    streamed.orderBy("ws", "event_type").show(8, false)
    println("-- batch sample --")
    batch.orderBy("ws", "event_type").show(8, false)

    // raw side-by-side of the source reads
    val batchRaw = Tables.events(spark, dir)
    println("batch events rows=" + batchRaw.count())
    batchRaw.select(min("ts"), max("ts")).show(false)
    val ckpt2 = Files.createTempDirectory("graft_dbg_ckpt2").toString
    val q2 = raw.writeStream.outputMode("append")
      .format("memory").queryName("dbg_raw")
      .option("checkpointLocation", ckpt2)
      .trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination()
    val sr = spark.table("dbg_raw")
    println("stream events rows=" + sr.count())
    sr.select(min("ts"), max("ts")).show(false)
    spark.stop()
  }
}
