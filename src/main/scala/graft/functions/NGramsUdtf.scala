package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom table-generating function (UDTF surface, SURVEY §2.12): one
  * output row per word n-gram of a token array, with its 0-based
  * position — the explode-side primitive behind shingling and n-gram
  * indexing, as a real `Generator` subclass rather than a composition
  * of transform/filter/explode (which materializes the full n-gram
  * array per row before exploding; the generator streams them).
  *
  * CodegenFallback: Generate evaluates the generator per row outside
  * whole-stage codegen — the row fan-out dominates, not expression
  * dispatch.
  */
case class NGramsUdtf(child: Expression, n: Int)
  extends UnaryExpression with Generator with CodegenFallback {

  require(n >= 1, "n must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ngrams expects ARRAY<STRING>, got $other")
  }

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("ngram", StringType, nullable = true)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = child.eval(input).asInstanceOf[ArrayData]
    if (arr == null || arr.numElements() < n) Nil
    else {
      val m = arr.numElements()
      val sep = UTF8String.fromString(" ")
      (0 to m - n).iterator.map { i =>
        val parts = new Array[UTF8String](2 * n - 1)
        var j = 0
        while (j < n) {
          parts(2 * j) = arr.getUTF8String(i + j)
          if (j < n - 1) parts(2 * j + 1) = sep
          j += 1
        }
        new GenericInternalRow(Array[Any](i, UTF8String.concat(parts: _*)))
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): NGramsUdtf =
    copy(child = newChild)
}

object NGramsUdtf {
  /** ngrams(tokens, n) as a generator column: select(col("id"),
    * ngrams(col("toks"), 3).as(Seq("pos", "ngram"))). */
  def ngrams(tokens: Column, n: Int): Column =
    Bridge.column(NGramsUdtf(Bridge.expression(tokens), n))
}
