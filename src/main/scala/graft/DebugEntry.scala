package graft

/** Scratch: driver-contract smoke — entry() must return rows > 0. */
object DebugEntry {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("4")
    spark.sparkContext.setLogLevel("WARN")
    val n = SparkEntry.entry(spark).count()
    println(s"ENTRY ROWS = $n")
    spark.stop()
  }
}
