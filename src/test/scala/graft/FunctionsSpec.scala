package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unit behavior of the custom expressions/operators added in rounds
  * 1-2: DotProduct's null/shape contract, SrpSignature's equivalence to
  * the unfused form, SimhashAgg's equivalence to the spelled-out 60-sum
  * construction, and the GroupTopK plan node's semantics on edge cases.
  */
class FunctionsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = GraftSession.local("4")

  test("DotProduct: NULL on length mismatch and on null elements; exact on clean input") {
    import graft.functions.DotProduct.dot
    import spark.implicits._
    val df = Seq(
      (1L, Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)), // clean: 32.0
      (2L, Seq(1.0, 2.0), Seq(1.0, 2.0, 3.0))       // length mismatch
    ).toDF("id", "a", "b")
    val rows = df.select(col("id"), dot(col("a"), col("b")).as("d"))
      .orderBy("id").collect()
    assert(rows(0).getDouble(1) === 32.0)
    assert(rows(1).isNullAt(1), "length mismatch must yield NULL")

    // null element → NULL (matches the zip_with/aggregate form)
    val nullElem = Seq((1L, Seq[java.lang.Double](1.0, null, 3.0), Seq[java.lang.Double](1.0, 2.0, 3.0)))
      .toDF("id", "a", "b")
      .select(dot(col("a").cast("array<double>"), col("b").cast("array<double>")).as("d"))
      .collect()
    assert(nullElem(0).isNullAt(0), "null element must yield NULL")
  }

  test("SrpSignature equals the unfused when(dot(v, plane) > 0) construction") {
    import graft.functions.{DotProduct, SrpSignature}
    import DotProduct.dot
    import SrpSignature.srpSignature
    import spark.implicits._
    val vecs = Seq.tabulate(8)(i => (i.toLong, Seq.tabulate(64)(j => math.sin(i * 64 + j))))
      .toDF("id", "v").withColumn("v", col("v").cast("array<double>"))
    val (l, b, dim, seed) = (12, 3, 64, 42L)
    // reference: unfused per-plane dots over the same Gaussian stream
    val flat = SrpSignature.planes(l, b, dim, seed)
    val unfused = vecs.select(col("id"), array((0 until l).map { t =>
      (0 until b).map { j =>
        val plane = typedlit(flat.slice((t * b + j) * dim, (t * b + j + 1) * dim).toSeq)
        when(dot(col("v"), plane) > 0, lit(1 << j)).otherwise(lit(0))
      }.reduce(_ + _)
    }: _*).as("sig")).orderBy("id").collect().map(_.getSeq[Int](1))
    val fused = vecs.select(col("id"), srpSignature(col("v"), l, b, dim, seed).as("sig"))
      .orderBy("id").collect().map(_.getSeq[Int](1))
    assert(fused.toSeq == unfused.toSeq)
  }

  test("SimhashAgg equals the spelled-out 60-sum fold") {
    import graft.functions.SimhashAgg.simhashAgg
    import spark.implicits._
    val toks = Seq((1L, "alpha"), (1L, "beta"), (1L, "gamma"), (2L, "delta"), (2L, "alpha"))
      .toDF("g", "tok").withColumn("m", md5(col("tok")))
    def dv(d: Int) = conv(substring(col("m"), d, 1), 16, 10).cast("long")
    def contrib(i: Int) = shiftright(dv(i / 4 + 1), i % 4) % 2 * 2 - 1
    val sums = toks.groupBy("g")
      .agg((0 until 60).map(i => sum(contrib(i)).as(s"s$i")).head,
        (0 until 60).map(i => sum(contrib(i)).as(s"s$i")).tail: _*)
    val expected = sums.select(col("g"),
      (0 until 60).map(i => when(col(s"s$i") > 0, lit(1L << i)).otherwise(lit(0L)))
        .reduce(_ + _).as("h")).orderBy("g").collect().map(r => (r.getLong(0), r.getLong(1)))
    val fused = toks.groupBy("g").agg(simhashAgg(col("m")).as("h"))
      .orderBy("g").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(fused.toSeq == expected.toSeq)
  }

  test("agg_approx_percentile within 2% relative error of exact percentiles") {
    val dir = "/root/testdata/sf0.01"
    val approx = SparkEntry.queries("agg_approx_percentile")(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val exact = SparkEntry.queries("agg_percentile")(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(4))).toMap
    exact.foreach { case (k, (m, p95)) =>
      val (am, ap95) = approx(k)
      assert(math.abs(am - m) / m <= 0.02, s"$k median: $am vs $m")
      assert(math.abs(ap95 - p95) / p95 <= 0.02, s"$k p95: $ap95 vs $p95")
    }
  }

  test("GroupTopK: k larger than group, ties broken by the declared order, full rows kept") {
    import org.apache.spark.sql.graft.GroupTopK
    import spark.implicits._
    val df = Seq(
      ("a", 3.0, 1L, "x1"), ("a", 3.0, 2L, "x2"), ("a", 1.0, 3L, "x3"),
      ("b", 5.0, 4L, "x4")
    ).toDF("g", "score", "id", "payload")
    val out = GroupTopK.topk(df, 2, Seq("g"), Seq("score" -> true, "id" -> false))
      .orderBy("g", "id").collect()
    assert(out.map(_.getString(3)).toSeq == Seq("x1", "x2", "x4"),
      "ties break on id; group b keeps its single row with k=2")
  }

  test("SrpSignature: null elements contribute 0 (signature == zero-filled vector's)") {
    import graft.functions.SrpSignature.srpSignature
    import spark.implicits._
    val withNull = Seq((1L, Seq[java.lang.Double](0.5, null, -0.25, 1.0)))
      .toDF("id", "v")
      .select(srpSignature(col("v").cast("array<double>"), 4, 3, 4, 7L).as("sig"))
      .collect()(0).getSeq[Int](0)
    val zeroed = Seq((1L, Seq(0.5, 0.0, -0.25, 1.0)))
      .toDF("id", "v")
      .select(srpSignature(col("v"), 4, 3, 4, 7L).as("sig"))
      .collect()(0).getSeq[Int](0)
    assert(withNull == zeroed,
      "a null element must project as 0, not read garbage slot bytes")
  }

  test("SimhashAgg rejects non-md5-shaped input instead of reading out of bounds") {
    import graft.functions.SimhashAgg.simhashAgg
    import spark.implicits._
    val short = Seq("abc").toDF("h")
    val err = intercept[Exception] {
      short.agg(simhashAgg(col("h"))).collect()
    }
    assert(err.getMessage != null)
  }

  test("Stable.lsumTerm: bucketed long-partial sum == decimal dsum at the same scale") {
    import graft.relational.Stable
    import spark.implicits._
    // pseudo-random doubles in the corr-matrix magnitude range; the
    // floor-scaled long path and the decimal cast round identically at
    // a given scale, so the two-level (long partial → decimal merge)
    // reduction must equal the direct decimal sum bit-for-bit
    val vals = (1 to 10000).map(i => ((i * 2654435761L % 1000003).toDouble / 7.0, i))
    val df = vals.toDF("x", "i")
    for (scale <- Seq(2, 4, 6)) {
      val direct = df.agg(Stable.dsum(col("x"), scale)).collect()(0).getDouble(0)
      val bucketed = df
        .groupBy(pmod(col("i"), lit(64)).as("bk"))
        .agg(sum(Stable.lsumTerm(col("x"), scale)).as("p"))
        .agg((sum(col("p").cast(org.apache.spark.sql.types.DecimalType(38, 0)))
          .cast("double") / math.pow(10, scale)).as("t"))
        .collect()(0).getDouble(0)
      assert(bucketed == direct,
        s"scale=$scale: long-partial $bucketed != decimal $direct")
    }
  }

  test("Cluster.components: min label propagates across a 5-node chain (diameter > 1 round)") {
    import spark.implicits._
    // chain 10-11-12-13-14 plus isolated pair 20-21: forces multiple
    // propagation rounds before the fixpoint
    val pairs = Seq((10L, 11L), (11L, 12L), (12L, 13L), (13L, 14L), (20L, 21L))
      .toDF("id_a", "id_b")
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
    val labels = graft.llm.Cluster.components(edges)
      .orderBy("node").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((10L to 14L).forall(labels(_) == 10L), "chain collapses to min id 10")
    assert(labels(20L) == 20L && labels(21L) == 20L, "pair collapses to 20")
  }
}
