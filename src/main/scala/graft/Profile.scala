package graft

import org.apache.spark.sql.SparkSession

/** Local profiling harness (not a driver surface): runs every query
  * twice in one JVM and prints cold/warm seconds sorted by warm cost, so
  * genuine plan problems separate from one-time codegen/JIT warmup.
  * Usage: tools/run.sh graft.Profile [sfDir]
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // localProbe: the profiler is the A/B instrument, so it keeps the
    // SPARK_GRAFT_CONF override hook (scoped out of Bench/Verify, r15)
    val spark = GraftSession.localProbe(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val only = args.drop(1).toSet
    // GRAFT_EXPLAIN=1: dump executed plans for the selected queries
    // instead of timing them (plan-shape audits per SURVEY §7)
    if (sys.env.get("GRAFT_EXPLAIN").contains("1")) {
      SparkEntry.queries.toSeq.sortBy(_._1)
        .filter { case (n, _) => only.isEmpty || only.exists(n.startsWith) }
        .foreach { case (name, fn) =>
          println(s"==== $name ====")
          val df = fn(spark, sfDir)
          // collect() executes THIS QueryExecution (count() would build a
          // new one), so AQE's final plan — reuse, coalesce — is shown
          df.collect()
          println(df.queryExecution.executedPlan.toString)
        }
      spark.stop(); return
    }
    // noop-format write, NOT count(): count() lets the optimizer prune
    // every projected column (and the sort), so map-heavy keys would
    // probe as free. The noop sink executes the full declared plan and
    // discards rows — the honest per-query cost.
    def exec(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    // GRAFT_PROFILE_REPS warm reps (default 1), min reported — single
    // warm samples wobble ±0.5 s under host noise (r14), the same
    // min-of-N defense the bench uses. Clamped ≥ 1 and non-numeric →
    // default (ADVICE r14: 0 crashed the empty .min, junk threw NFE).
    val reps = math.max(1,
      sys.env.get("GRAFT_PROFILE_REPS").flatMap(_.toIntOption).getOrElse(1))
    val rows = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.isEmpty || only.exists(n.startsWith) }
      .map { case (name, fn) =>
        val cold = time(exec(fn(spark, sfDir)))
        val warm = (1 to reps).map(_ => time(exec(fn(spark, sfDir)))).min
        (name, cold, warm)
      }
    println(f"${"query"}%-24s ${"cold"}%8s ${"warm"}%8s")
    rows.sortBy(-_._3).foreach { case (n, c, w) => println(f"$n%-24s $c%8.2f $w%8.2f") }
    println(f"TOTAL cold=${rows.map(_._2).sum}%.1f warm=${rows.map(_._3).sum}%.1f n=${rows.size}")
    spark.stop()
  }
}
