package graft

import org.apache.spark.sql.functions._

/** AQE skew-join trigger probe (not a driver surface): reproduces the
  * ExtrasSpec skew shape standalone with adaptive-execution DEBUG logs
  * so the rule's accept/decline reason is visible.
  * Usage: tools/run.sh graft.DebugSkew [sfDir]
  */
object DebugSkew {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local("4")
    spark.sparkContext.setLogLevel("DEBUG")
    val c = spark.conf
    c.set("spark.sql.adaptive.skewJoin.enabled", "true")
    c.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    c.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1KB")
    c.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1KB")
    c.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    c.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // skew-split granularity is MAP OUTPUT BLOCKS: a single-file scan
    // is one mapper, whose one block per reduce partition cannot be
    // split — spread the scan over 8 mappers first (any real cluster
    // input has many)
    val fact = Tables.events(spark, dir).repartition(8)
      .select(when(col("event_id") % 10 =!= 0, lit(0L))
        .otherwise(col("event_id")).as("k"), col("value"))
    val dim = Tables.events(spark, dir)
      .select(col("event_id").as("k"), col("event_type")).distinct()
    val joined = fact.join(dim, Seq("k")).select(col("k"), col("value"))
    joined.collect()
    println("==== FINAL PLAN ====")
    println(joined.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
