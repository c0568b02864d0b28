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

  /** Two-level exact sum for MANY-aggregate single-pass reductions:
    * each term is rounded to 10^-scale and accumulated as a LONG
    * (codegen primitive — Spark's decimal SUM costs ~20× a long sum
    * per row, measured on the 15-sum corr-matrix aggregate: 4.2 s vs
    * 0.5 s at sf0.1, and the cost is the aggregate itself, not the
    * cast precision). Overflow safety comes from the caller bucketing
    * the corpus first (hash-bucket partials, then a decimal merge of
    * the bounded partial set) — the same integer-partials-then-wide-
    * merge shape a 100 TB shard reduction uses. Terms must be
    * NON-NEGATIVE (half-up vs half-away rounding agree) and satisfy
    * |x|·10^scale · bucketRows < 9.2e18.
    * Rounding is floor(x·10^s + 0.5), NOT round(): Spark's Round on
    * doubles allocates a BigDecimal per row (measured 1.9 s vs 0.6 s
    * for 15 sums at sf0.1), while floor is a codegen libm primitive.
    * Both engines evaluate the identical IEEE expression, so the
    * (rare) double-add boundary cases land identically.
    * DuckDB twin: SUM(CAST(FLOOR(x * 1.0E<s> + 0.5) AS BIGINT)) —
    * HUGEINT accumulation is exact, no bucketing needed oracle-side. */
  def lsumTerm(c: Column, scale: Int): Column =
    floor(c * math.pow(10, scale) + 0.5).cast("long")

  /** Order-independent mean: exact decimal sum / count, rounded.
    * DuckDB twin: ROUND(CAST(SUM(CAST(x AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*), r). */
  def davg(c: Column, r: Int = 4): Column =
    round(sum(c.cast(DecimalType(28, 6))).cast("double") / count(lit(1)), r)

  /** davg's codegen-long twin for inputs ALREADY quantized to 6
    * decimals and non-negative (the `round(x, 6)`-before-mean
    * discipline of the logprob scorers): each term is floor(x·1e6+0.5)
    * — bit-equal to the decimal(28,6) cast here because x is the
    * nearest double of d/1e6, so the product error (≪ 0.5) cannot move
    * the integer — summed as a LONG (the ~20×/row decimal-SUM tax
    * retired from the corpus-sized aggregation; lsumTerm rationale
    * above). The long total re-enters double exactly (< 2^53 through
    * the 100× posture corpus; at true corpus scale the caller buckets
    * first, the corr-matrix shape) and d/1e6 division is the same
    * correctly-rounded rational both ways, so the emitted value is
    * IDENTICAL to davg's and the DuckDB twin is unchanged:
    * ROUND(CAST(SUM(CAST(x AS DECIMAL(28,6))) AS DOUBLE)/COUNT(*), r).
    * Callers MUST pre-round inputs to ≤ 6 decimals; for general
    * doubles use davg (decimal-cast and floor quantization can differ
    * at representation boundaries there). The precondition rides the
    * NAME (ADVICE r14) — a future caller reaching for a generic mean
    * should trip over "Prerounded" before silently forking from the
    * decimal oracle twin. */
  def lavg6Prerounded(c: Column, r: Int = 4): Column =
    round(sum(lsumTerm(c, 6)).cast("double") / 1e6 / count(lit(1)), r)
}
