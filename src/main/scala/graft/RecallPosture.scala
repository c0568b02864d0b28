package graft

/** Recall-regression harness (VERDICT r13 item 1, not a driver
  * surface): graft.Posture machine-gates TIMING at 1×/10×/100×, but the
  * 37 oracle-exempt keys' recall at scale was measured by hand
  * (RecallProbe → BASELINE.md tables) and nothing automated failed if a
  * geometry tweak quietly cost recall at 10× — the exact risk the r12
  * ivfpq stale-probe-width bug demonstrated. This main re-runs
  * RecallProbe.measure on the 10× twins corpus and diffs every key's
  * ALL-band recall against the floors in `tools/recall_recorded.json`,
  * the same contract shape as the timing registry: measured < floor →
  * DRIFT, ritual fails. Floors are recorded measurements minus a 0.005
  * honesty margin (recall on a fixed corpus is deterministic — the
  * hash-based LSH/IVF geometry has no RNG — so the margin only absorbs
  * truth-set edge rounding, not noise). Keys with a `null` floor are
  * measured and reported so fresh numbers can be pasted in.
  *
  * Usage: tools/run.sh graft.RecallPosture <scale10Dir> <baseDir> <copies>
  * (the scaled dir comes from `graft.ScaleGen <base> <out> 10 twins`)
  */
object RecallPosture {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: RecallPosture <scale10Dir> <baseDir> <copies>")
    val (scaleDir, baseDir, copies) = (args(0), args(1), args(2).toInt)
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    val recPath = Posture.registryPath("tools/recall_recorded.json")
    val rec = spark.read.option("multiLine", true)
      .schema("key STRING, floor DOUBLE")
      .json(recPath)
      .collect()
      .map(r => r.getAs[String]("key") ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap

    val measured = RecallProbe.measure(spark, scaleDir, baseDir, copies,
      docsMode = true)

    val missing = rec.keySet.diff(measured.keySet)
    require(missing.isEmpty,
      s"registry keys not measured by RecallProbe.measure: $missing")

    def s4(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.4f", v)
    val drifts = scala.collection.mutable.ListBuffer[String]()
    val cells = rec.keys.toSeq.sorted.map { key =>
      val m = measured(key)
      val floor = rec(key)
      val drifted = floor.exists(f => m < f)
      if (drifted) drifts += s"$key: ${s4(m)} < floor ${floor.get}"
      println(f"[recall] $key%-22s measured=${s4(m)}%8s " +
        s"floor=${floor.map(_.toString).getOrElse("-")}" +
        (if (drifted) "  <-- DRIFT" else ""))
      s"""{"key":"$key","measured":${s4(m)},""" +
        s""""floor":${floor.map(_.toString).getOrElse("null")}}"""
    }
    val driftsJson = drifts.map(d => s""""$d"""").mkString("[", ",", "]")
    val out = s"""{"recall":[${cells.mkString(",")}],"drifts":$driftsJson}"""
    java.nio.file.Files.write(
      java.nio.file.Paths.get("/tmp/graft_recall.json"),
      (out + "\n").getBytes("UTF-8"))
    println(out)
    if (drifts.nonEmpty)
      System.err.println(s"[recall][DRIFT] ${drifts.mkString("; ")}")
    spark.stop()
  }
}
