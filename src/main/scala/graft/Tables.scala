package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Fixture-table loaders. Every query fn receives the scale-factor dir at
  * call time (driver contract, Verify.scala:18) and must read from it —
  * never hardcode a scale factor. Schemas documented in FIXTURES.md.
  */
object Tables {
  def table(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, dir: String): DataFrame     = table(s, dir, "region")
  def nation(s: SparkSession, dir: String): DataFrame     = table(s, dir, "nation")
  def customer(s: SparkSession, dir: String): DataFrame   = table(s, dir, "customer")
  def supplier(s: SparkSession, dir: String): DataFrame   = table(s, dir, "supplier")
  def part(s: SparkSession, dir: String): DataFrame       = table(s, dir, "part")
  def orders(s: SparkSession, dir: String): DataFrame     = table(s, dir, "orders")
  def lineitem(s: SparkSession, dir: String): DataFrame   = table(s, dir, "lineitem")
  /** `events.ts` is TIMESTAMP(NANOS) parquet, which Spark 4 refuses to
    * read as a timestamp ([PARQUET_TYPE_ILLEGAL]). Read it as a raw
    * nanos long (legacy conf, runtime-settable) and normalize to µs
    * TimestampType here, so every consumer sees an ordinary `ts`.
    * DuckDB keeps full ns — oracles must date_trunc to seconds anyway
    * (FIXTURES.md pitfall 1). */
  def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = table(s, dir, "events")
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        // µs fixture generation: TIMESTAMP(MICROS, isAdjustedToUTC=false)
        // infers as NTZ; session tz is pinned UTC so the LTZ cast is the
        // identity instant (watermarks/windows require LTZ).
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
  }
  def documents(s: SparkSession, dir: String): DataFrame  = table(s, dir, "documents")
  def embeddings(s: SparkSession, dir: String): DataFrame = table(s, dir, "embeddings")

  /** Filesystem/table-identifier-safe key for a scale-factor dir — the
    * shared sanitizer for every write-once layout path and managed
    * table name (was re-declared per pack before round 4).
    *
    * NON-EXTENSIBLE (ADVICE r05): sanitization alone collapses every
    * non-alphanumeric to '_', so a sibling dir could extend another's
    * key across the separator (`.../sf1` → `sf1_` prefixing
    * `sf1_0_<fp>` from `.../sf1.0`) and prefix-based stale sweeps
    * would delete the sibling's live artifacts. A fixed-width hash of
    * the RAW string is appended so no key can be a proper prefix of
    * another's. */
  def pathKey(dir: String): String =
    dir.replaceAll("[^A-Za-z0-9]", "_") + "x" + f"${dir.hashCode}%08x"

  /** Cheap content fingerprint (size + mtime) of a fixture file, for
    * write-once layout caches: a regenerated fixture at the SAME path
    * must invalidate the cached derived layout, or the engine would be
    * verified against stale data. */
  def fingerprint(dir: String, name: String): String = {
    val p = java.nio.file.Paths.get(s"$dir/$name.parquet")
    s"${java.nio.file.Files.size(p)}_${java.nio.file.Files.getLastModifiedTime(p).toMillis}"
  }

  /** Drop EVERY warehouse directory whose name starts with `prefix` —
    * called before a write-once layout writes a new fingerprint's
    * artifacts, so a regenerated fixture does not leave the previous
    * fingerprint's tables accumulating forever (ADVICE r04: dropping
    * only the current names leaked every superseded fingerprint). Also
    * clears the in-memory catalog's stale registration: a same-process
    * fixture regen would otherwise leave tableExists=true pointing at a
    * deleted location. */
  /** Directory entries whose name starts with `prefix` — the stream is
    * closed eagerly (an unclosed Files.list holds a directory fd until
    * GC; the bench calls these listers hundreds of times per JVM). */
  def listByPrefix(dir: java.nio.file.Path, prefix: String): List[java.nio.file.Path] = {
    import scala.jdk.CollectionConverters._
    val st = java.nio.file.Files.list(dir)
    try st.iterator().asScala.filter(_.getFileName.toString.startsWith(prefix)).toList
    finally st.close()
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    val st = java.nio.file.Files.walk(p)
    try st.sorted(java.util.Comparator.reverseOrder())
      .iterator().asScala.foreach(java.nio.file.Files.delete)
    finally st.close()
  }

  def dropStaleTables(s: SparkSession, prefix: String): Unit = {
    import java.nio.file.{Files, Paths}
    val wh = java.net.URI.create(s.conf.get("spark.sql.warehouse.dir")) match {
      case u if u.getScheme == "file" => Paths.get(u)
      case u => Paths.get(u.getPath)
    }
    if (Files.isDirectory(wh)) listByPrefix(wh, prefix).foreach(deleteRecursively)
    s.catalog.listTables().collect()
      .map(_.name).filter(_.startsWith(prefix))
      .foreach(t => s.sql(s"DROP TABLE IF EXISTS `$t`"))
  }

  /** /tmp sibling of dropStaleTables for path-based (non-catalog)
    * write-once layouts: removes every /tmp entry starting with
    * `prefix` before the new fingerprint's layout is written. */
  def dropStalePaths(prefix: String): Unit =
    listByPrefix(java.nio.file.Paths.get("/tmp"), prefix).foreach(deleteRecursively)
}
