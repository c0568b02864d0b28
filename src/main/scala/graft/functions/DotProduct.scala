package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst dot product over two ARRAY<DOUBLE> columns.
  *
  * The built-in route — `aggregate(zip_with(a, b, _*_), 0d, _+_)` —
  * materializes an intermediate array per row and walks lambda
  * evaluators; profiled at ~40 µs/pair on the 64-dim embeddings, which
  * made the O(n²) similarity queries minutes-slow. This expression
  * generates a tight primitive loop over the ArrayData buffers (no
  * allocation, stays inside whole-stage codegen): same result, ~40×
  * faster. Sequential accumulation order matches the SQL-oracle formula
  * exactly (left-to-right), so hash-compare behavior is unchanged.
  *
  * Null/shape contract (matches the zip_with/aggregate form it
  * replaces, ADVICE r01): mismatched lengths → NULL (zip_with would pad
  * with nulls, and `null * x` poisons the running sum); a null element
  * on either side → NULL. When both inputs declare containsNull=false
  * the generated loop skips the per-element null checks entirely.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"dot_product expects two ARRAY<DOUBLE>, got ${left.dataType} / ${right.dataType}")
    }

  override def dataType: DataType = DoubleType

  // NULL can arise from length mismatch even when inputs are non-null
  override def nullable: Boolean = true

  private def elementsNullable: Boolean = Seq(left, right).exists(_.dataType match {
    case ArrayType(_, n) => n
    case _ => true
  })

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0.0
    var i = 0
    if (elementsNullable) {
      while (i < n) {
        if (x.isNullAt(i) || y.isNullAt(i)) return null
        s += x.getDouble(i) * y.getDouble(i); i += 1
      }
    } else {
      while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val nullCheck = if (elementsNullable)
        s"""if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"""
      else ""
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullCheck
         |    $s += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object DotProduct {
  /** Column-API entry point (Spark 4 Column/Expression bridge). */
  def dot(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))
}
