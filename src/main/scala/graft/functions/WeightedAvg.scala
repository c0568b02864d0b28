package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import java.math.{BigDecimal => JBD, RoundingMode}

/** Input row view for the discount-weighted average price aggregate. */
case class PriceDisc(l_extendedprice: Double, l_discount: Double)

/** Custom typed UDAF (SURVEY.md §2.5 agg_custom_typed): discount-weighted
  * average price, sum(price*disc)/sum(disc). Accumulates in BigDecimal
  * (exact, order-independent — the shuffle merge order of partial
  * buffers must not change the result) and emits a rounded double.
  * Formula twin in SQL:
  *   ROUND(CAST(SUM(CAST(p*d AS DECIMAL(28,6))) AS DOUBLE)
  *       / CAST(SUM(CAST(d   AS DECIMAL(28,6))) AS DOUBLE), 4)
  */
object WeightedAvgAgg extends Aggregator[PriceDisc, (JBD, JBD), Double] {
  private def dec6(d: Double): JBD = new JBD(d).setScale(6, RoundingMode.HALF_UP)

  override def zero: (JBD, JBD) = (JBD.ZERO, JBD.ZERO)

  override def reduce(b: (JBD, JBD), a: PriceDisc): (JBD, JBD) =
    (b._1.add(dec6(a.l_extendedprice * a.l_discount)), b._2.add(dec6(a.l_discount)))

  override def merge(x: (JBD, JBD), y: (JBD, JBD)): (JBD, JBD) =
    (x._1.add(y._1), x._2.add(y._2))

  override def finish(r: (JBD, JBD)): Double =
    if (r._2.signum == 0) 0.0
    else new JBD(r._1.doubleValue / r._2.doubleValue)
      .setScale(4, RoundingMode.HALF_UP).doubleValue

  override def bufferEncoder: Encoder[(JBD, JBD)] =
    Encoders.tuple(Encoders.DECIMAL, Encoders.DECIMAL)

  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
