package graft

import org.apache.spark.sql.functions._

/** Ranked-statistics scale probe (not a driver surface): times the
  * two-phase distributed-rank Gini (Extras11.giniRanked) against its
  * nb = 1 degenerate — which IS the naive one-window-per-group sort —
  * on a ScaleGen corpus, so the parallelism claim is measured, not
  * argued (VERDICT r06 next-round item 8).
  * Usage: tools/run.sh graft.DebugRank [sfDir] [reps]
  */
object DebugRank {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft_sf10")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def exec(nb: Int): Double = time {
      graft.relational.Extras11.giniRanked(Tables.orders(spark, sfDir), nb)
        .write.format("noop").mode("overwrite").save()
    }
    val n = Tables.orders(spark, sfDir).count()
    println(s"orders rows = $n  dir = $sfDir")
    for (nb <- Seq(1, 64)) {
      val ts = (1 to reps).map(_ => exec(nb))
      println(f"gini nb=$nb%-4d min=${ts.min}%6.2f s  runs=${ts.map(t => f"$t%.2f").mkString(", ")}")
    }
    // the median family: two-phase medianRanked vs the buffering
    // median() aggregate on the events table
    val e = Tables.events(spark, sfDir).select(col("event_type"), col("value"))
    def execMed(two: Boolean): Double = time {
      val df = if (two)
        graft.relational.Extras11.medianRanked(e, "event_type", "value", 64)
      else e.groupBy("event_type").agg(median(col("value")).as("med"))
      df.write.format("noop").mode("overwrite").save()
    }
    println(s"events rows = ${e.count()}")
    for (two <- Seq(false, true)) {
      val ts = (1 to reps).map(_ => execMed(two))
      val tag = if (two) "medianRanked(64)" else "median() buffer"
      println(f"$tag%-17s min=${ts.min}%6.2f s  runs=${ts.map(t => f"$t%.2f").mkString(", ")}")
    }
    spark.stop()
  }
}
