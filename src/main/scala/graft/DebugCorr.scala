package graft

import org.apache.spark.sql.functions._
import graft.relational.Stable

/** Scratch: profile the corr-matrix aggregate shapes. */
object DebugCorr {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("32")
    spark.sparkContext.setLogLevel("WARN")
    val dir = args(0)
    val li = Tables.lineitem(spark, dir)
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime; val r = f
      println(f"STAGE $label%-28s ${(System.nanoTime - t0) / 1e9}%8.2f s"); r
    }
    val ms = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    for (i <- 1 to 2) {
      time(s"count-only-$i")(li.agg(count(lit(1))).collect())
      time(s"4-dsum-$i")(li.agg(count(lit(1)),
        ms.map(m => Stable.dsum(col(m), 6)): _*).collect())
      time(s"15-dsum-$i")(li.agg(count(lit(1)),
        (ms.map(m => Stable.dsum(col(m), 6)) ++
         ms.map(m => Stable.dsum(col(m) * col(m), 6)) ++
         ms.combinations(2).map { case Seq(a, b) =>
           Stable.dsum(col(a) * col(b), 6) }.toSeq): _*).collect())
      time(s"15-lsum-bucketed-$i")(li.groupBy(
          pmod(hash(col("l_orderkey"), col("l_partkey")), lit(4096)).as("bk"))
        .agg(count(lit(1)).as("c"),
          (ms.map(m => sum(Stable.lsumTerm(col(m), 6))) ++
           ms.map(m => sum(Stable.lsumTerm(col(m) * col(m), 4))) ++
           ms.combinations(2).map { case Seq(a, b) =>
             sum(Stable.lsumTerm(col(a) * col(b), 4)) }.toSeq): _*).collect())
      time(s"1-lsum-bucketed-$i")(li.groupBy(
          pmod(hash(col("l_orderkey"), col("l_partkey")), lit(4096)).as("bk"))
        .agg(count(lit(1)).as("c"),
          sum(Stable.lsumTerm(col("l_quantity"), 6))).collect())
      time(s"15-doublesum-$i")(li.agg(count(lit(1)),
        (ms.map(m => sum(col(m))) ++
         ms.map(m => sum(col(m) * col(m))) ++
         ms.combinations(2).map { case Seq(a, b) =>
           sum(col(a) * col(b)) }.toSeq): _*).collect())
    }
    val plan = SparkEntry.queries("agg_corr_matrix")(spark, dir)
      .queryExecution.executedPlan.toString
    println(plan.linesIterator.take(25).mkString("\n"))
    spark.stop()
  }
}
