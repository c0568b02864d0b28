package graft

/** Writes `.explain("formatted")` output for the named keys to
  * plans/<tag>/<key>_<suffix>.txt — the optimization-round evidence
  * files (the judge checks plan claims against these). Usage:
  *   tools/run.sh graft.PlanDump <outDir> <suffix> <key> [key ...]
  * e.g. tools/run.sh graft.PlanDump plans/r14 before sql_tpch_q21
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <outDir> <suffix> <key> [key ...]")
    val (outDir, suffix, keys) = (args(0), args(1), args.drop(2).toSeq)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = GraftSession.localProbe(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    s.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    keys.foreach { k =>
      val df = SparkEntry.queries(k)(s, dir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, s"${k}_$suffix.txt"),
        txt.getBytes("UTF-8"))
      println(s"wrote $outDir/${k}_$suffix.txt (${txt.length} chars)")
    }
    s.stop()
  }
}
