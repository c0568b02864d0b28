package graft

import org.apache.spark.sql.functions._

/** Scratch A/B harness for the triangle census (not a driver surface):
  * the shipped wedge-join form (e1 ⋈ e2 on v=u, probe e3 on (x,z))
  * against the edge-iterator form (per-edge |N+(u) ∩ N+(v)| over
  * sorted out-adjacency arrays). Same oriented-edge artifact, same
  * O(m^1.5) work bound — the question is constants: the wedge join
  * materializes every wedge row through a second hash probe, the edge
  * iterator touches du+dv array entries per edge with no intermediate
  * row stream. Alternated 3 rounds in one JVM; compare minima.
  */
object DebugTri {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime; val r = f
      println(f"STAGE $label%-28s ${(System.nanoTime - t0) / 1e9}%8.2f s"); r
    }
    // same artifact the shipped key reads (build cost excluded by a
    // throwaway first call)
    val o = graft.relational.Extras11.triEdges(spark, dir)
    o.count()
    def wedge(): Long =
      o.as("e1").join(o.as("e2"), col("e1.v") === col("e2.u"))
        .select(col("e1.u").as("x"), col("e2.v").as("z"))
        .join(o.as("e3"), col("x") === col("e3.u") && col("z") === col("e3.v"))
        .count()
    def edgeIter(): Long = {
      val adj = o.groupBy(col("u")).agg(sort_array(collect_list(col("v"))).as("ns"))
      o.join(adj.select(col("u"), col("ns").as("nu")), Seq("u"))
        .join(adj.select(col("u").as("v"), col("ns").as("nv")), Seq("v"))
        .agg(sum(size(array_intersect(col("nu"), col("nv")))))
        .head().getLong(0)
    }
    for (i <- 1 to 3) {
      val w = time(s"wedge-join      r$i")(wedge())
      val e = time(s"edge-iterator   r$i")(edgeIter())
      assert(w == e, s"triangle counts diverge: wedge=$w edgeIter=$e")
      println(s"  triangles = $w")
    }
    spark.stop()
  }
}
