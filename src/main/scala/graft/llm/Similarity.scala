package graft.llm

import graft.{QueryPack, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.ml.feature.BucketedRandomProjectionLSH
import org.apache.spark.ml.functions.array_to_vector

/** Similarity search over the embedding column (SURVEY.md §2.11).
  *
  * Scale story: the exact pairwise/top-k queries are the correctness
  * baseline (O(n²) — fine at fixture scale, and the brute-force inner
  * loop is codegen'd higher-order functions, no UDF). The 100 TB path is
  * sim_lsh_ann: MLlib random-projection LSH buckets candidates so the
  * join is per-bucket, plus the banded SimHash/MinHash variants in
  * Dedup. A production IVF layout would pre-partition by coarse
  * centroid id — same bucket-join shape as the LSH variant here.
  */
object Similarity extends QueryPack {

  private def vecs(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // exact pairwise cosine above threshold
    "sim_cosine_pairs" -> ((s, dir) => {
      val a = vecs(s, dir).select(col("vec_id").as("id_a"), col("v").as("va"))
      val b = vecs(s, dir).select(col("vec_id").as("id_b"), col("v").as("vb"))
      a.join(b, col("id_a") < col("id_b"))
        .withColumn("cos", Dedup.cosine(col("va"), col("vb")))
        .where(col("cos") > 0.4)
        .select(col("id_a"), col("id_b"), round(col("cos"), 4).as("cos_sim"))
        .orderBy("id_a", "id_b")
    }),

    // exact kNN: top-5 neighbors per vector by cosine
    "sim_topk" -> ((s, dir) => {
      val a = vecs(s, dir).select(col("vec_id").as("id_a"), col("v").as("va"))
      val b = vecs(s, dir).select(col("vec_id").as("id_b"), col("v").as("vb"))
      val w = Window.partitionBy(col("id_a"))
        .orderBy(col("cos").desc, col("id_b"))
      a.join(b, col("id_a") =!= col("id_b"))
        .withColumn("cos", Dedup.cosine(col("va"), col("vb")))
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= 5)
        .select(col("id_a"), col("rn"), col("id_b"), round(col("cos"), 4).as("cos_sim"))
        .orderBy("id_a", "rn")
    }),

    // approximate NN at scale: random-projection LSH bucket join.
    // Probabilistic — no SQL oracle; recall vs sim_topk asserted in
    // LlmSpec on sf0.001.
    "sim_lsh_ann" -> ((s, dir) => {
      val e = vecs(s, dir).withColumn("features", array_to_vector(col("v")))
      val lsh = new BucketedRandomProjectionLSH()
        .setInputCol("features").setOutputCol("hashes")
        .setBucketLength(4.0).setNumHashTables(4).setSeed(42L)
      val model = lsh.fit(e)
      model.approxSimilarityJoin(e, e, 10.0, "eucl_dist")
        .select(col("datasetA.vec_id").as("id_a"), col("datasetB.vec_id").as("id_b"),
          round(col("eucl_dist"), 4).as("dist"))
        .where(col("id_a") < col("id_b"))
        .orderBy("id_a", "id_b")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "sim_cosine_pairs" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |       ROUND(list_cosine_similarity(a.v, b.v), 4) AS cos_sim
        |FROM e a JOIN e b ON a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(a.v, b.v) > 0.4
        |ORDER BY id_a, id_b""".stripMargin,

    "sim_topk" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
        |SELECT a.vec_id AS id_a,
        |       row_number() OVER (PARTITION BY a.vec_id
        |                          ORDER BY list_cosine_similarity(a.v, b.v) DESC,
        |                                   b.vec_id) AS rn,
        |       b.vec_id AS id_b,
        |       ROUND(list_cosine_similarity(a.v, b.v), 4) AS cos_sim
        |FROM e a JOIN e b ON a.vec_id <> b.vec_id
        |QUALIFY rn <= 5
        |ORDER BY id_a, rn""".stripMargin
  )
}
