package graft.relational

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Cross-engine-exact aggregation helpers (SURVEY.md §7.5).
  *
  * A plain SUM over doubles is order-dependent: Spark and DuckDB (and two
  * Spark runs with different partitioning) accumulate in different orders
  * and disagree in low-order bits, which breaks the driver's hash compare.
  * Fix: round each input to a DECIMAL (ties can't occur — decimal scale
  * boundaries like 5e-5 are not representable in binary, so both engines
  * round each double identically), accumulate exactly in decimal, emit
  * DOUBLE (correctly-rounded conversion in both engines while the
  * unscaled value stays below 2^53 — holds for every fixture column
  * through sf0.1 at the scales used here).
  *
  * DuckDB twin: CAST(SUM(CAST(x AS DECIMAL(28,s))) AS DOUBLE).
  */
object Stable {
  /** Order-independent sum of a double column, emitted as DOUBLE. */
  def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(28, scale))).cast("double")

  /** Order-independent mean: exact decimal sum / count, rounded.
    * DuckDB twin: ROUND(CAST(SUM(CAST(x AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*), r). */
  def davg(c: Column, r: Int = 4): Column =
    round(sum(c.cast(DecimalType(28, 6))).cast("double") / count(lit(1)), r)
}
