package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Cross-implementation invariants for the retrieval keys (all three
  * are ALSO oracle-checked; these tests pin the relationships between
  * them that the per-key oracles can't see).
  */
class RetrievalSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  private lazy val spark: SparkSession = GraftSession.local("4")

  private def q(name: String) = SparkEntry.queries(name)(spark, dir)

  test("bm25 batch qid=1 reproduces the single-query top-5 exactly " +
      "(array-filter tf vs postings-join tf)") {
    val single = q("text_bm25_topk").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
      .filter(_._1 <= 5).toSeq
    val batch = q("text_bm25_batch").collect()
      .filter(_.getInt(0) == 1)
      .map(r => (r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(single.size == 5 && batch.size == 5)
    assert(single == batch,
      s"single=$single\nbatch=$batch")
  }

  test("bm25Prf single-postings-pass == pre-r15 naive form on the fixture corpus") {
    val a = graft.llm.Retrieval.bm25Prf(Tables.documents(spark, dir))
      .collect().map(_.toString).sorted.toSeq
    val b = graft.llm.Retrieval.bm25PrfNaive(Tables.documents(spark, dir))
      .collect().map(_.toString).sorted.toSeq
    assert(a == b, s"restructure diverged:\n new=$a\n old=$b")
  }

  test("bm25Prf == naive form on a planted corpus with ties at BOTH rank cuts") {
    import spark.implicits._
    // docs 1-4 are byte-identical (scores tie exactly → the top-3
    // feedback cut separates ties by doc_id alone); docs 9/15 tie at
    // the bottom of the top-10; doc 13 has no query term (counts only
    // toward n/sdl); doc 14 is empty text (one empty token — stays
    // counted in both forms). Expansion terms (alpha/beta/...) give
    // stage 2 a real term choice, with an es tie between gamma/delta
    // broken by term name.
    val docs = Seq(
      1L  -> "dup spark merge alpha beta",
      2L  -> "dup spark merge alpha beta",
      3L  -> "dup spark merge alpha beta",
      4L  -> "dup spark merge alpha beta",
      5L  -> "dup spark gamma gamma",
      6L  -> "spark merge beta beta alpha",
      7L  -> "merge delta delta",
      8L  -> "dup epsilon",
      9L  -> "spark alpha",
      10L -> "merge beta",
      11L -> "dup gamma delta",
      12L -> "spark delta epsilon",
      13L -> "noise only words here",
      14L -> "",
      15L -> "spark alpha"
    ).toDF("doc_id", "text")
    val a = graft.llm.Retrieval.bm25Prf(docs)
      .collect().map(_.toString).sorted.toSeq
    val b = graft.llm.Retrieval.bm25PrfNaive(docs)
      .collect().map(_.toString).sorted.toSeq
    assert(a.size == 10 && a == b, s"tie corpus diverged:\n new=$a\n old=$b")
  }

  test("hybrid RRF scores decompose into the two ranked lists' contributions") {
    val rows = q("sim_hybrid_rrf").collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      val lex = if (r.isNullAt(2)) 0.0 else 1.0 / (60 + r.getInt(2))
      val vec = if (r.isNullAt(3)) 0.0 else 1.0 / (60 + r.getInt(3))
      val expect = math.round((lex + vec) * 1e6) / 1e6
      assert(math.abs(r.getDouble(4) - expect) < 1e-9,
        s"row $r: rrf ${r.getDouble(4)} != $expect")
    }
    // descending by fused score, rn dense from 1
    assert(rows.map(_.getInt(0)).toSeq == (1 to 10))
    val scores = rows.map(_.getDouble(4)).toSeq
    assert(scores == scores.sorted.reverse)
  }

  test("sim_mmr_rerank: permutation of the hybrid top-10; every pick is " +
      "the step's MMR argmax") {
    import org.apache.spark.sql.functions.col
    val hybrid = q("sim_hybrid_rrf")
      .select("doc_id", "rrf_score").collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
    val reranked = q("sim_mmr_rerank").collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(reranked.map(_._1) == (1 to 10))
    assert(reranked.map(_._2).toSet == hybrid.map(_._1).toSet,
      "rerank must permute the fused candidates, not change them")
    // recompute the objective at every step and assert argmax + ties
    val ids = hybrid.map(_._1)
    val vecs = Tables.embeddings(spark, dir)
      .where(col("vec_id").isin(ids: _*))
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val maxRel = hybrid.map(_._2).max
    val rel = hybrid.map { case (id, r) => id -> r / maxRel }.toMap
    def cos(a: Long, b: Long): Double = (vecs.get(a), vecs.get(b)) match {
      case (Some(va), Some(vb)) =>
        val dot = va.zip(vb).map { case (x, y) => x * y }.sum
        dot / (math.sqrt(va.map(x => x * x).sum) * math.sqrt(vb.map(x => x * x).sum))
      case _ => 0.0
    }
    var selected = List.empty[Long]
    var remaining = hybrid.map(_._1).toSet
    reranked.foreach { case (_, pick) =>
      def obj(c: Long) = 0.7 * rel(c) -
        (1 - 0.7) * (if (selected.isEmpty) 0.0 else selected.map(cos(c, _)).max)
      val best = remaining.map(c => (c, obj(c)))
        .reduceLeft((a, b) =>
          if (b._2 > a._2 || (b._2 == a._2 && b._1 < a._1)) b else a)
      assert(pick == best._1,
        s"step picked $pick but argmax is ${best._1} (selected=$selected)")
      selected ::= pick; remaining -= pick
    }
  }

  test("ann_query_rrf: served top-10 overlaps >= 0.8 with the exact hybrid") {
    val exact = q("sim_hybrid_rrf").collect().map(_.getLong(1)).toSet
    val served = q("ann_query_rrf").collect().map(_.getLong(1)).toSet
    assert(served.size == 10, s"served list has ${served.size} rows")
    val overlap = exact.count(served.contains).toDouble / exact.size
    assert(overlap >= 0.8,
      s"served/exact top-10 overlap $overlap < 0.8 (exact=$exact served=$served)")
  }

  test("embed_label_purity_ann stays within 0.1 per-label of the exact " +
      "purity (the exempt key's deviation gate)") {
    val exact = q("embed_label_purity").collect()
      .map(r => r.getInt(0) -> r.getDouble(2)).toMap
    val ann = q("embed_label_purity_ann").collect()
      .map(r => r.getInt(0) -> r.getDouble(2)).toMap
    assert(exact.keySet == ann.keySet,
      s"label sets differ: ${exact.keySet} vs ${ann.keySet}")
    val worst = exact.map { case (l, p) => math.abs(p - ann(l)) }.max
    assert(worst <= 0.1, s"max per-label purity deviation $worst > 0.1")
  }

  test("the query vector's own doc serves at vector rank 1 with the " +
      "rare lexical term dominating the BM25 list") {
    // vec side: doc 7 is the query vector, cos = 1 -> r_vec = 1 if fused
    val hybrid = q("sim_hybrid_rrf").collect()
      .map(r => (r.getLong(1), if (r.isNullAt(3)) -1 else r.getInt(3))).toMap
    hybrid.get(7L).foreach(rv => assert(rv == 1, s"doc 7 r_vec $rv != 1"))
    // lex side: every top-3 BM25 doc must actually contain the rare term
    val top = q("text_bm25_topk").collect().map(_.getLong(1)).take(3).toSet
    val withDup = Tables.documents(spark, dir)
      .where(org.apache.spark.sql.functions.col("text").contains("dup"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(top.subsetOf(withDup),
      s"top-3 BM25 docs $top not all contain the rare query term")
  }
}
