package graft.relational

import graft.{QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Set operations (SURVEY.md §2.8) over two event slices:
  * A = purchases, B = high-value events (value > 250).
  * Spark `intersect`/`except` are DISTINCT-semantics, matching SQL
  * INTERSECT/EXCEPT.
  */
object Sets extends QueryPack {

  private def sliceA(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir).where(col("event_type") === "purchase")
      .select("event_id", "event_type", "value")

  private def sliceB(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir).where(col("value") > 250)
      .select("event_id", "event_type", "value")

  private val sqlA = "SELECT event_id, event_type, value FROM events WHERE event_type = 'purchase'"
  private val sqlB = "SELECT event_id, event_type, value FROM events WHERE value > 250"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "set_union_all" -> ((s, dir) =>
      sliceA(s, dir).unionByName(sliceB(s, dir))
        .orderBy("event_id", "event_type", "value")),

    "set_union_distinct" -> ((s, dir) =>
      sliceA(s, dir).unionByName(sliceB(s, dir)).distinct()
        .orderBy("event_id", "event_type", "value")),

    "set_intersect" -> ((s, dir) =>
      sliceA(s, dir).intersect(sliceB(s, dir))
        .orderBy("event_id", "event_type", "value")),

    "set_except" -> ((s, dir) =>
      sliceA(s, dir).except(sliceB(s, dir))
        .orderBy("event_id", "event_type", "value"))
  )

  val oracleSql: Map[String, String] = Map(
    "set_union_all" ->
      s"SELECT * FROM ($sqlA UNION ALL $sqlB) ORDER BY event_id, event_type, value",
    "set_union_distinct" ->
      s"SELECT * FROM ($sqlA UNION $sqlB) ORDER BY event_id, event_type, value",
    "set_intersect" ->
      s"SELECT * FROM ($sqlA INTERSECT $sqlB) ORDER BY event_id, event_type, value",
    "set_except" ->
      s"SELECT * FROM ($sqlA EXCEPT $sqlB) ORDER BY event_id, event_type, value"
  )
}
