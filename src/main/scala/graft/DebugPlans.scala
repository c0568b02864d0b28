package graft

/** Scratch: print the executed plan of the keys named on the command
  * line (plan-audit loop for new queries — SURVEY §4 discipline). */
object DebugPlans {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.localProbe("4")
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty && args.head.startsWith("/")) args.head
              else "/root/testdata/sf0.001"
    val keys = args.filterNot(_.startsWith("/"))
    keys.foreach { k =>
      println(s"===== $k")
      println(SparkEntry.queries(k)(spark, dir)
        .queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
