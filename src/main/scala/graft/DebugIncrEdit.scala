package graft
import org.apache.spark.sql.functions._
/** One-off: banded-vs-exact recall for the incremental edit pair on a scale corpus. */
object DebugIncrEdit {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    val q = SparkEntry.queries
    val exact = q("dedup_incr_edit")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val banded = q("dedup_incr_edit_banded")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.count(banded.contains).toDouble / exact.size
    val fp = banded.count(!exact.contains(_))
    println(s"RESULT exact=${exact.size} banded=${banded.size} recall=$recall fp=$fp")
    spark.stop()
  }
}
