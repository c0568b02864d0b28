package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native product-quantization codec expressions.
  *
  * The composed-builtin forms hit both codegen walls at once: encoding
  * as `array(256 × (lit(|c|²) − 2·dot(sub, clit)))` per sub-space
  * unrolls M×Ksub = 2048 dot products into one generated method (janino
  * 64 KB overflow → whole-stage falls back to interpreted eval, measured
  * 5.7 ms/row — the same failure mode SrpSignature was built to kill in
  * round 1), and ADC scoring as `aggregate(zip_with(codes, dt, …))` runs
  * on the lambda-evaluator path (higher-order functions are
  * CodegenFallback). Each expression here is ONE tight loop over a
  * constant flat codebook array referenced once per JVM
  * (ctx.addReferenceObj), so generated methods stay small and hot.
  *
  * Shared contract: the codebook is passed as nested Seq (m → code →
  * centroid) so case-class equality stays structural; flat primitive
  * views are derived lazily per executor. NULL input → NULL; a vector
  * whose length ≠ M·SubDim or with null elements → NULL (the DotProduct
  * poison convention).
  */
object PqCodec {
  def pqEncode(v: Column, book: Seq[Seq[Seq[Double]]]): Column =
    Bridge.column(PqEncode(Bridge.expression(v), book))

  def pqDistTable(v: Column, book: Seq[Seq[Seq[Double]]]): Column =
    Bridge.column(PqDistTable(Bridge.expression(v), book))

  def pqAdc(codes: Column, dt: Column): Column =
    Bridge.column(PqAdc(Bridge.expression(codes), Bridge.expression(dt)))

  private[functions] def flatten(book: Seq[Seq[Seq[Double]]]): Array[Double] =
    book.flatten.flatten.toArray

  private[functions] def norms2(book: Seq[Seq[Seq[Double]]]): Array[Double] =
    book.flatten.map(cv => cv.map(x => x * x).sum).toArray
}

/** codes[m] = argmin_c ||sub_m(v) − book[m][c]||², computed as
  * |c|² − 2·dot(sub, c) (|sub|² is constant per sub-vector); strict-<
  * minimum keeps the FIRST minimum → lowest code id on ties. */
case class PqEncode(child: Expression, book: Seq[Seq[Seq[Double]]])
    extends UnaryExpression {

  private val m = book.length
  private val ksub = book.head.length
  private val subDim = book.head.head.length

  @transient private lazy val flat: Array[Double] = PqCodec.flatten(book)
  @transient private lazy val n2: Array[Double] = PqCodec.norms2(book)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_encode expects ARRAY<DOUBLE>, got $other")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() != m * subDim) return null
    val out = new Array[Any](m)
    var mi = 0
    while (mi < m) {
      var best = 0; var bestD = Double.MaxValue
      var c = 0
      while (c < ksub) {
        val base = (mi * ksub + c) * subDim
        var s = 0.0
        var i = 0
        while (i < subDim) {
          if (v.isNullAt(mi * subDim + i)) return null
          s += v.getDouble(mi * subDim + i) * flat(base + i)
          i += 1
        }
        val d = n2(mi * ksub + c) - 2.0 * s
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(mi) = best
      mi += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val bookRef = ctx.addReferenceObj("pqBook", flat, "double[]")
      val n2Ref = ctx.addReferenceObj("pqNorm2", n2, "double[]")
      val out = ctx.freshName("out")
      val mi = ctx.freshName("mi"); val c = ctx.freshName("c"); val i = ctx.freshName("i")
      val s = ctx.freshName("s"); val d = ctx.freshName("d")
      val best = ctx.freshName("best"); val bestD = ctx.freshName("bestD")
      val base = ctx.freshName("base")
      s"""
         |if ($v.numElements() != ${m * subDim}) { ${ev.isNull} = true; } else {
         |  int[] $out = new int[$m];
         |  for (int $mi = 0; $mi < $m && !${ev.isNull}; $mi++) {
         |    int $best = 0; double $bestD = Double.MAX_VALUE;
         |    for (int $c = 0; $c < $ksub; $c++) {
         |      int $base = ($mi * $ksub + $c) * $subDim;
         |      double $s = 0.0;
         |      for (int $i = 0; $i < $subDim; $i++) {
         |        if ($v.isNullAt($mi * $subDim + $i)) { ${ev.isNull} = true; break; }
         |        $s += $v.getDouble($mi * $subDim + $i) * $bookRef[$base + $i];
         |      }
         |      double $d = $n2Ref[$mi * $ksub + $c] - 2.0 * $s;
         |      if ($d < $bestD) { $bestD = $d; $best = $c; }
         |    }
         |    $out[$mi] = $best;
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($out);
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** dt[m][c] = dot(sub_m(v), book[m][c]) — the per-query ADC lookup
  * table (M×Ksub doubles, ~16 KB at the 8-bit operating point). */
case class PqDistTable(child: Expression, book: Seq[Seq[Seq[Double]]])
    extends UnaryExpression {

  private val m = book.length
  private val ksub = book.head.length
  private val subDim = book.head.head.length

  @transient private lazy val flat: Array[Double] = PqCodec.flatten(book)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_dist_table expects ARRAY<DOUBLE>, got $other")
  }

  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() != m * subDim) return null
    val out = new Array[Any](m)
    var mi = 0
    while (mi < m) {
      val row = new Array[Any](ksub)
      var c = 0
      while (c < ksub) {
        val base = (mi * ksub + c) * subDim
        var s = 0.0
        var i = 0
        while (i < subDim) {
          if (v.isNullAt(mi * subDim + i)) return null
          s += v.getDouble(mi * subDim + i) * flat(base + i)
          i += 1
        }
        row(c) = s
        c += 1
      }
      out(mi) = new org.apache.spark.sql.catalyst.util.GenericArrayData(row)
      mi += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val bookRef = ctx.addReferenceObj("pqBook", flat, "double[]")
      val out = ctx.freshName("out"); val row = ctx.freshName("row")
      val mi = ctx.freshName("mi"); val c = ctx.freshName("c"); val i = ctx.freshName("i")
      val s = ctx.freshName("s"); val base = ctx.freshName("base")
      val arrCls = "org.apache.spark.sql.catalyst.util.ArrayData"
      val genCls = "org.apache.spark.sql.catalyst.util.GenericArrayData"
      s"""
         |if ($v.numElements() != ${m * subDim}) { ${ev.isNull} = true; } else {
         |  Object[] $out = new Object[$m];
         |  for (int $mi = 0; $mi < $m && !${ev.isNull}; $mi++) {
         |    double[] $row = new double[$ksub];
         |    for (int $c = 0; $c < $ksub; $c++) {
         |      int $base = ($mi * $ksub + $c) * $subDim;
         |      double $s = 0.0;
         |      for (int $i = 0; $i < $subDim; $i++) {
         |        if ($v.isNullAt($mi * $subDim + $i)) { ${ev.isNull} = true; break; }
         |        $s += $v.getDouble($mi * $subDim + $i) * $bookRef[$base + $i];
         |      }
         |      $row[$c] = $s;
         |    }
         |    $out[$mi] = $arrCls.toArrayData($row);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = new $genCls($out); }
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** ADC score: Σ_m dt[m][codes[m]] — M array lookups per row against the
  * broadcast per-query table; the only corpus bytes touched are the
  * M-byte codes. NULL on shape mismatch or out-of-range code. */
case class PqAdc(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(ArrayType(DoubleType, _), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"pq_adc expects (ARRAY<INT>, ARRAY<ARRAY<DOUBLE>>), got $other")
    }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val codes = a.asInstanceOf[ArrayData]
    val dt = b.asInstanceOf[ArrayData]
    val m = codes.numElements()
    if (m != dt.numElements()) return null
    var s = 0.0
    var mi = 0
    while (mi < m) {
      if (codes.isNullAt(mi) || dt.isNullAt(mi)) return null
      val row = dt.getArray(mi)
      val c = codes.getInt(mi)
      if (c < 0 || c >= row.numElements() || row.isNullAt(c)) return null
      s += row.getDouble(c)
      mi += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (codes, dt) => {
      val mi = ctx.freshName("mi"); val s = ctx.freshName("s")
      val c = ctx.freshName("c"); val row = ctx.freshName("row")
      val arrCls = "org.apache.spark.sql.catalyst.util.ArrayData"
      s"""
         |if ($codes.numElements() != $dt.numElements()) { ${ev.isNull} = true; } else {
         |  double $s = 0.0;
         |  for (int $mi = 0; $mi < $codes.numElements() && !${ev.isNull}; $mi++) {
         |    if ($codes.isNullAt($mi) || $dt.isNullAt($mi)) { ${ev.isNull} = true; break; }
         |    $arrCls $row = $dt.getArray($mi);
         |    int $c = $codes.getInt($mi);
         |    if ($c < 0 || $c >= $row.numElements() || $row.isNullAt($c)) {
         |      ${ev.isNull} = true; break;
         |    }
         |    $s += $row.getDouble($c);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $s; }
       |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
