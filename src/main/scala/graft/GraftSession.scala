package graft

import org.apache.spark.sql.SparkSession

/** Canonical SparkSession factory: every entry point (Bench, Verify,
  * Profile, the test suites) builds through here so the library's
  * recommended session tuning is applied uniformly — a user embedding
  * the library applies the same confs via `tuned`.
  */
object GraftSession {

  /** Local session with `cpus` threads and matching shuffle width. */
  def local(cpus: String): SparkSession = tuned(
    SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
    .getOrCreate()

  /** Library-recommended session confs.
    *
    * objectHashAggregate fallback: Spark's default threshold (128
    * distinct keys per partition) exists to bound memory for UNBOUNDED
    * object buffers (collect_list and friends) — past it, the partial
    * aggregate falls back to sorting the entire input stream. Our
    * object-buffer aggregates (graft.functions.TopKByScore) hold at
    * most k entries per key, so hash aggregation stays safely bounded
    * at far higher key counts; the default made the kNN partial
    * aggregate sort all n² candidate rows and was the round-1
    * sim_topk bench collapse (VERDICT r01 item 3). 1M keys × a k≈5
    * buffer ≈ low hundreds of MB per task worst-case — within executor
    * sizing; past THAT, the sort fallback is the correct behavior.
    */
  def tuned(b: SparkSession.Builder): SparkSession.Builder = b
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1048576")
    // managed tables (the bucketed-join demo) land outside the repo
    .config("spark.sql.warehouse.dir", "/tmp/graft_warehouse")
}
