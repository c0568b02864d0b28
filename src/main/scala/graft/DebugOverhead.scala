package graft

import org.apache.spark.sql.functions._

/** Round-14 constant-overhead probe (measurement instrument, guide §1):
  * the bench tail — 273 of 385 keys under 0.3 s — sums to ~42 s, so
  * per-invocation fixed costs (parquet schema inference, AQE
  * replanning, geometry count() jobs, final orderBy sampling) are a
  * first-class optimization target. This main times each suspect in
  * isolation. Usage: tools/run.sh graft.DebugOverhead [sfDir]
  */
object DebugOverhead {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = GraftSession.localProbe(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    s.sparkContext.setLogLevel("ERROR")
    def t(n: Int)(f: => Unit): Double = {
      f // warm once
      val t0 = System.nanoTime(); (1 to n).foreach(_ => f)
      (System.nanoTime() - t0) / 1e9 / n
    }
    // 1. reader-builder cost: schema inference per spark.read.parquet
    val inferS = t(20) { s.read.parquet(s"$dir/lineitem.parquet").schema }
    val sch = s.read.parquet(s"$dir/lineitem.parquet").schema
    val explicitS = t(20) { s.read.schema(sch).parquet(s"$dir/lineitem.parquet").schema }
    println(f"read-builder: infer=${inferS * 1000}%.1f ms  explicit-schema=${explicitS * 1000}%.1f ms")
    // 2. geometry count() job vs parquet footer metadata
    val cntS = t(10) { Tables.embeddings(s, dir).count() }
    println(f"embeddings.count() job: ${cntS * 1000}%.1f ms")
    // 3. a representative tail key, AQE on vs off (runtime conf)
    def key(name: String): Unit = {
      SparkEntry.queries(name)(s, dir).count(); ()
    }
    for (k <- Seq("agg_argminmax", "win_rank", "join_inner", "fn_math")) {
      s.conf.set("spark.sql.adaptive.enabled", "true")
      val on = t(8) { key(k) }
      s.conf.set("spark.sql.adaptive.enabled", "false")
      val off = t(8) { key(k) }
      s.conf.set("spark.sql.adaptive.enabled", "true")
      println(f"$k%-16s aqe-on=${on * 1000}%.0f ms  aqe-off=${off * 1000}%.0f ms")
    }
    // 4. final orderBy cost on a tail key shape (range-partitioner sample)
    val li = s.read.schema(sch).parquet(s"$dir/lineitem.parquet")
    val agg = li.groupBy("l_returnflag").agg(count(lit(1)).as("c"))
    val noSort = t(8) { agg.count(); () }
    val sorted = t(8) { agg.orderBy("l_returnflag").count(); () }
    println(f"groupBy tail: no-sort=${noSort * 1000}%.0f ms  with-orderBy=${sorted * 1000}%.0f ms")
    // 5. shuffle-partition width for a tiny shuffle
    for (p <- Seq("32", "8", "1")) {
      s.conf.set("spark.sql.shuffle.partitions", p)
      val v = t(8) { agg.orderBy("l_returnflag").count(); () }
      println(f"shuffle.partitions=$p%-3s  ${v * 1000}%.0f ms")
    }
    s.conf.set("spark.sql.shuffle.partitions", "32")
    s.stop()
  }
}

/** One-off probe: does Observation fire on localCheckpoint()? */
object DebugObserveCkpt {
  def main(args: Array[String]): Unit = {
    val s = GraftSession.localProbe("4")
    s.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.Observation
    import org.apache.spark.sql.functions._
    val obs = Observation()
    val df = s.range(1000).observe(obs, count(lit(1)).as("n")).localCheckpoint()
    val got = obs.getAsJava // blocks; if this prints, the event fired
    println(s"observation after localCheckpoint: $got rows=${df.count()}")
    s.stop()
  }
}

/** Tail-floor breakdown: planning-only vs full count() for cheap keys. */
object DebugTail {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = GraftSession.localProbe(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    s.sparkContext.setLogLevel("ERROR")
    def t(n: Int)(f: => Unit): Double = {
      f; val t0 = System.nanoTime(); (1 to n).foreach(_ => f)
      (System.nanoTime() - t0) / 1e9 / n
    }
    val keys = Seq("fn_math", "fn_string", "filter_arith", "agg_group",
      "win_rank", "join_inner", "sort_multi", "fn_json", "project_select",
      "agg_grouping", "set_except", "scan_pruned")
    println(f"${"key"}%-16s ${"plan_ms"}%8s ${"count_ms"}%9s")
    keys.foreach { k =>
      val fn = SparkEntry.queries(k)
      val p = t(6) { fn(s, dir).queryExecution.executedPlan; () }
      val c = t(6) { fn(s, dir).count(); () }
      println(f"$k%-16s ${p * 1000}%8.0f ${c * 1000}%9.0f")
    }
    s.stop()
  }
}
