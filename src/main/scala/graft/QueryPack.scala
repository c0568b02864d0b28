package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One operator-category module = one QueryPack. SparkEntry aggregates all
  * packs into the driver-facing `queries` / `oracleSql` registries.
  *
  * Contract per entry (SURVEY.md §7.5 hash-match survival rules):
  *  - result ends with a total ORDER BY (unique key or all columns);
  *  - every double aggregate rounded identically on both sides;
  *  - column names identical between Spark result and DuckDB SQL;
  *  - no raw maps/structs/arrays/JSON in the final output.
  */
trait QueryPack {
  def queries: Map[String, (SparkSession, String) => DataFrame]

  /** DuckDB SQL over bare table names (driver binds them to the same
    * parquet dir). Omit keys whose semantics aren't SQL-expressible —
    * those get a named non-oracle test in src/test instead. */
  def oracleSql: Map[String, String]
}
