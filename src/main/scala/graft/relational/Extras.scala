package graft.relational

import graft.{QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Round-1 widening beyond the core survey rows: exact percentiles,
  * bitwise ops, the salted-skew-join pattern, and non-parquet source
  * round-trips (CSV/JSON).
  */
object Extras extends QueryPack {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // exact percentiles (linear interpolation — matches quantile_cont)
    "agg_percentile" -> ((s, dir) =>
      Tables.orders(s, dir)
        .groupBy(col("o_orderstatus"))
        .agg(
          round(expr("percentile(o_totalprice, 0.25)"), 4).as("p25"),
          round(expr("percentile(o_totalprice, 0.5)"), 4).as("median"),
          round(expr("percentile(o_totalprice, 0.75)"), 4).as("p75"),
          round(expr("percentile(o_totalprice, 0.95)"), 4).as("p95"))
        .orderBy("o_orderstatus")),

    "fn_bitwise" -> ((s, dir) =>
      Tables.events(s, dir).select(
        col("event_id"),
        col("user_id").bitwiseAND(lit(255L)).as("band"),
        col("user_id").bitwiseOR(lit(4096L)).as("bor"),
        col("user_id").bitwiseXOR(col("event_id")).as("bxor"),
        shiftleft(col("user_id"), 3).as("shl"),
        shiftright(col("user_id"), 2).as("shr"),
        bit_count(col("user_id")).cast("long").as("popcnt"))
        .orderBy("event_id")),

    // skew-mitigation pattern: salt the (potentially hot) probe key and
    // replicate the build side across the salt domain, so one hot key
    // spreads over SALT shuffle partitions instead of one straggler
    // task. Result is provably identical to the plain join — the oracle
    // IS the plain join.
    "join_skew_salted" -> ((s, dir) => {
      val salts = 8
      val ev = Tables.events(s, dir)
        .withColumn("salt", (col("event_id") % salts).cast("int"))
      val dim = Tables.customer(s, dir)
        .withColumn("salt", explode(array((0 until salts).map(lit): _*)))
      ev.join(dim, col("user_id") === col("c_custkey") && ev("salt") === dim("salt"))
        .select(col("event_id"), col("c_custkey"), col("c_name"))
        .orderBy("event_id")
    }),

    // non-parquet sources: parquet → csv → read back (int/string columns
    // only — csv double formatting is not oracle-stable)
    "source_csv_roundtrip" -> ((s, dir) => {
      val tmp = Files.createTempDirectory("graft_csv").toString
      Tables.nation(s, dir).select("n_nationkey", "n_name", "n_regionkey")
        .write.mode("overwrite").option("header", "true").csv(tmp)
      s.read.option("header", "true").option("inferSchema", "false")
        .schema("n_nationkey INT, n_name STRING, n_regionkey INT")
        .csv(tmp)
        .orderBy("n_nationkey")
    }),

    "source_json_roundtrip" -> ((s, dir) => {
      val tmp = Files.createTempDirectory("graft_json").toString
      Tables.nation(s, dir).select("n_nationkey", "n_name", "n_regionkey")
        .write.mode("overwrite").json(tmp)
      s.read.schema("n_nationkey INT, n_name STRING, n_regionkey INT")
        .json(tmp)
        .orderBy("n_nationkey")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "agg_percentile" ->
      """SELECT o_orderstatus,
        |  ROUND(quantile_cont(o_totalprice, 0.25), 4) AS p25,
        |  ROUND(quantile_cont(o_totalprice, 0.5), 4) AS median,
        |  ROUND(quantile_cont(o_totalprice, 0.75), 4) AS p75,
        |  ROUND(quantile_cont(o_totalprice, 0.95), 4) AS p95
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "fn_bitwise" ->
      """SELECT event_id,
        |  user_id & 255 AS band,
        |  user_id | 4096 AS bor,
        |  xor(user_id, event_id) AS bxor,
        |  user_id << 3 AS shl,
        |  user_id >> 2 AS shr,
        |  CAST(bit_count(user_id) AS BIGINT) AS popcnt
        |FROM events ORDER BY event_id""".stripMargin,

    "join_skew_salted" ->
      """SELECT event_id, c_custkey, c_name
        |FROM events JOIN customer ON user_id = c_custkey
        |ORDER BY event_id""".stripMargin,

    "source_csv_roundtrip" ->
      "SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey",

    "source_json_roundtrip" ->
      "SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey"
  )
}
