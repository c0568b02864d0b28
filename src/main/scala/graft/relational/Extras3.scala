package graft.relational

import graft.{QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Round-2 widening, batch C: time-range window frames, null-safe join,
  * ANSI-safe try_ functions, printf formatting, FILTER-clause
  * aggregates, interval arithmetic, explicit null ordering,
  * deterministic hash sampling, multi-aggregate pivot, and the second
  * regex family.
  */
object Extras3 extends QueryPack {

  /** Portable first-8-hex-digit md5 value of an id — THE shared
    * cross-engine hash core (bucket and uniform forms derive from it;
    * keep Spark and SQL twins in lockstep). */
  private[graft] def md5Val(id: org.apache.spark.sql.Column) =
    conv(substring(md5(id.cast("string")), 1, 8), 16, 10).cast("long")

  /** DuckDB twin of md5Val: the 8 hex digits, digit-expanded. */
  private[graft] def md5ValD(id: String): String =
    (0 until 8).map(d =>
      s"(instr('0123456789abcdef', substring(md5(CAST($id AS VARCHAR)), ${d + 1}, 1)) - 1) * ${1L << (4 * (7 - d))}")
      .mkString("(", " + ", ")")

  /** Portable md5-derived bucket 0..9 of a long id (Spark side). */
  private def hashBucketS(id: org.apache.spark.sql.Column) = md5Val(id) % 10

  /** DuckDB twin: first-8-hex-digit value of md5(id), digit-expanded. */
  private def hashBucketD(id: String): String = md5ValD(id) + " % 10"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // event-time RANGE frame: per-user trailing-10-minute counts/sums —
    // the frame is defined by VALUE distance (seconds), not row count,
    // so ties and gaps behave identically in both engines
    "win_range_time" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("t")).rangeBetween(-600, 0)
      Tables.events(s, dir)
        .withColumn("t", unix_timestamp(date_trunc("second", col("ts"))))
        .select(col("event_id"), col("user_id"), col("t"),
          count(lit(1)).over(w).as("n_10m"),
          sum(col("value").cast(DecimalType(28, 2))).over(w).cast("double")
            .as("sum_10m"))
        .orderBy("event_id")
    }),

    // null-safe equality join (<=>): NULL keys MATCH each other instead
    // of silently dropping — the semantics a changed-data-capture merge
    // needs on nullable business keys
    "join_nullsafe" -> ((s, dir) => {
      val a = Tables.events(s, dir).where(col("event_id") <= 2000)
        .select(col("event_id"), nullif(col("user_id") % 7, lit(3L)).as("k"))
      val b = Tables.nation(s, dir)
        .select(col("n_nationkey"), nullif(col("n_nationkey") % 7, lit(3)).as("k2"))
      a.join(b, col("k") <=> col("k2").cast("long"))
        .select(col("event_id"), col("n_nationkey"))
        .orderBy("event_id", "n_nationkey")
    }),

    // ANSI-safe arithmetic: division by a zero-bearing divisor and
    // out-of-bounds element access return NULL instead of failing
    "fn_try" -> ((s, dir) =>
      Tables.events(s, dir).select(
        col("event_id"),
        try_divide(col("event_id"), col("user_id") % 5).as("tdiv"),
        try_add(col("event_id"), col("user_id")).as("tadd"),
        try_element_at(split(col("props"), ","), lit(5)).as("telem"))
        .orderBy("event_id")),

    // printf-style formatting (zero-padded keys, fixed decimals)
    "fn_format" -> ((s, dir) =>
      Tables.events(s, dir).select(
        col("event_id"),
        format_string("%08d|%s|%.2f", col("event_id"), col("event_type"),
          col("value")).as("line"),
        lpad(col("event_type"), 10, "*").as("padded"),
        rpad(col("event_type"), 10, ".").as("rpadded"))
        .orderBy("event_id")),

    // FILTER-clause aggregates through the SQL front-end: conditional
    // aggregation without self-joins or CASE pyramids
    "agg_filter_clause" -> ((s, dir) => {
      Tables.events(s, dir).createOrReplaceTempView("events_v")
      s.sql("""
        SELECT event_type,
          COUNT(*) AS n,
          COUNT(*) FILTER (WHERE value > 100) AS n_hi,
          CAST(SUM(CAST(value AS DECIMAL(28,2))) FILTER (WHERE user_id % 2 = 0)
               AS DOUBLE) AS sum_even
        FROM events_v GROUP BY event_type ORDER BY event_type""")
    }),

    // interval arithmetic + timestamp construction (string-formatted so
    // both engines compare wall-clock values, not tz-typed encodings)
    "fn_interval" -> ((s, dir) => {
      val tsSec = date_trunc("second", col("ts"))
      Tables.events(s, dir).select(
        col("event_id"),
        date_format(tsSec + expr("INTERVAL 90 MINUTES"), "yyyy-MM-dd HH:mm:ss").as("plus90m"),
        date_format(tsSec - expr("INTERVAL 1 DAY"), "yyyy-MM-dd HH:mm:ss").as("minus1d"),
        date_format(make_timestamp(year(tsSec), month(tsSec), dayofmonth(tsSec),
          lit(12), lit(30), lit(15)), "yyyy-MM-dd HH:mm:ss").as("made"))
        .orderBy("event_id")
    }),

    // explicit null ordering: NULLS LAST on an ascending sort (engines
    // disagree on the default — the pipeline must spell it out)
    "order_nulls" -> ((s, dir) =>
      Tables.orders(s, dir)
        .select(col("o_orderkey"), nullif(col("o_orderkey") % 10, lit(5L)).as("k"))
        .orderBy(col("k").asc_nulls_last, col("o_orderkey"))),

    // deterministic hash sampling: a stable md5-bucket predicate selects
    // the same ~10% on every engine and every run — the reproducible
    // alternative to TABLESAMPLE for pipeline debugging at scale
    "sample_hash" -> ((s, dir) =>
      Tables.events(s, dir)
        .where(hashBucketS(col("event_id")) === 0)
        .select(col("event_id"), col("user_id"), col("event_type"))
        .orderBy("event_id")),

    // pivot with MULTIPLE aggregates per cell and an explicit value list
    // (explicit values keep the output schema static — required for
    // streaming and for deterministic column sets at scale)
    "pivot_multi" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(count(lit(1)).as("n"), Stable.dsum(col("l_quantity")).as("qty"))
        .orderBy("l_returnflag")),

    // second regex family: extract-all, match counting
    "fn_regex2" -> ((s, dir) =>
      Tables.events(s, dir).select(
        col("event_id"),
        array_join(regexp_extract_all(col("props"), lit("[0-9]+"), lit(0)), ",")
          .as("nums"),
        regexp_count(col("props"), lit("[0-9]+")).cast("long").as("n_nums"),
        regexp_extract(col("props"), "\"k\":\\s*([0-9]+)", 1).as("k_str"))
        .orderBy("event_id"))
  )

  val oracleSql: Map[String, String] = Map(
    "win_range_time" ->
      """WITH e AS (SELECT event_id, user_id,
        |  CAST(floor(epoch(date_trunc('second', ts))) AS BIGINT) AS t, value FROM events)
        |SELECT event_id, user_id, t,
        |  COUNT(*) OVER w AS n_10m,
        |  CAST(SUM(CAST(value AS DECIMAL(28,2))) OVER w AS DOUBLE) AS sum_10m
        |FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t
        |  RANGE BETWEEN 600 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,

    "join_nullsafe" ->
      """SELECT event_id, n_nationkey
        |FROM (SELECT event_id, nullif(user_id % 7, 3) AS k FROM events
        |      WHERE event_id <= 2000) a
        |JOIN (SELECT n_nationkey, nullif(n_nationkey % 7, 3) AS k2 FROM nation) b
        |  ON a.k IS NOT DISTINCT FROM b.k2
        |ORDER BY event_id, n_nationkey""".stripMargin,

    "fn_try" ->
      """SELECT event_id,
        |  CAST(event_id AS DOUBLE) / nullif(user_id % 5, 0) AS tdiv,
        |  event_id + user_id AS tadd,
        |  string_split(props, ',')[5] AS telem
        |FROM events ORDER BY event_id""".stripMargin,

    "fn_format" ->
      """SELECT event_id,
        |  printf('%08d|%s|%.2f', event_id, event_type, value) AS line,
        |  lpad(event_type, 10, '*') AS padded,
        |  rpad(event_type, 10, '.') AS rpadded
        |FROM events ORDER BY event_id""".stripMargin,

    "agg_filter_clause" ->
      """SELECT event_type,
        |  COUNT(*) AS n,
        |  COUNT(*) FILTER (WHERE value > 100) AS n_hi,
        |  CAST(SUM(CAST(value AS DECIMAL(28,2))) FILTER (WHERE user_id % 2 = 0)
        |       AS DOUBLE) AS sum_even
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "fn_interval" ->
      """WITH e AS (SELECT event_id, date_trunc('second', ts) AS ts_sec FROM events)
        |SELECT event_id,
        |  strftime(ts_sec + INTERVAL 90 MINUTE, '%Y-%m-%d %H:%M:%S') AS plus90m,
        |  strftime(ts_sec - INTERVAL 1 DAY, '%Y-%m-%d %H:%M:%S') AS minus1d,
        |  strftime(make_timestamp(CAST(year(ts_sec) AS BIGINT),
        |    CAST(month(ts_sec) AS BIGINT), CAST(day(ts_sec) AS BIGINT),
        |    12, 30, 15.0), '%Y-%m-%d %H:%M:%S') AS made
        |FROM e ORDER BY event_id""".stripMargin,

    "order_nulls" ->
      """SELECT o_orderkey, nullif(o_orderkey % 10, 5) AS k
        |FROM orders ORDER BY k ASC NULLS LAST, o_orderkey""".stripMargin,

    "sample_hash" ->
      s"""SELECT event_id, user_id, event_type FROM events
         |WHERE ${hashBucketD("event_id")} = 0
         |ORDER BY event_id""".stripMargin,

    "pivot_multi" ->
      """SELECT l_returnflag,
        |  COUNT(*) FILTER (WHERE l_linestatus = 'F') AS F_n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) FILTER (WHERE l_linestatus = 'F')
        |       AS DOUBLE) AS F_qty,
        |  COUNT(*) FILTER (WHERE l_linestatus = 'O') AS O_n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) FILTER (WHERE l_linestatus = 'O')
        |       AS DOUBLE) AS O_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "fn_regex2" ->
      """SELECT event_id,
        |  array_to_string(regexp_extract_all(props, '[0-9]+'), ',') AS nums,
        |  CAST(len(regexp_extract_all(props, '[0-9]+')) AS BIGINT) AS n_nums,
        |  regexp_extract(props, '"k":\s*([0-9]+)', 1) AS k_str
        |FROM events ORDER BY event_id""".stripMargin
  )
}
