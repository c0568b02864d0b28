package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Fused sign-random-projection LSH signature: all `numTables` bucket
  * ids of a vector in one pass.
  *
  * Round 1 built each bucket bit as its own Catalyst expression —
  * `when(dot(v, typedlit(plane)) > 0, 1<<j)` × (L·B) — which compiled
  * 36 independent dot products (each with a 64-double literal) into one
  * giant generated method: whole-stage codegen blew past the JIT-friendly
  * size, and the driver's round-1 bench billed 36 s to sim_lsh_ann
  * (VERDICT r01 item 2). This expression emits ONE tight triple loop
  * over a constant flat plane array (a single referenced double[],
  * not inlined literals), so the generated method stays small and the
  * planes load once per JVM.
  *
  * The planes are derived deterministically from (numTables, bits, dim,
  * seed) with the same Gaussian stream as round 1's literal planes
  * (t-major, then bit, then component), so signatures — and the recall
  * behavior asserted in LlmSpec — are bit-identical to the unfused form.
  *
  * Output: ARRAY<INT> of length numTables; element t is the 0..2^bits-1
  * bucket of the vector in table t. NULL input → NULL; vectors shorter
  * than `dim` project on their defined prefix; null ELEMENTS contribute
  * 0 to every projection (same policy as DotProduct's elementsNullable
  * path — never read a slot whose null bit is set).
  */
case class SrpSignature(
    child: Expression,
    numTables: Int,
    bits: Int,
    dim: Int,
    seed: Long)
  extends UnaryExpression {

  require(numTables > 0 && bits > 0 && bits < 31 && dim > 0)

  @transient private lazy val flatPlanes: Array[Double] = SrpSignature.planes(numTables, bits, dim, seed)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"srp_signature expects ARRAY<DOUBLE>, got $other")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = math.min(v.numElements(), dim)
    val out = new Array[Any](numTables)
    var t = 0
    while (t < numTables) {
      var sig = 0
      var j = 0
      while (j < bits) {
        val base = (t * bits + j) * dim
        var s = 0.0
        var i = 0
        while (i < n) {
          if (!v.isNullAt(i)) s += v.getDouble(i) * flatPlanes(base + i)
          i += 1
        }
        if (s > 0) sig |= 1 << j
        j += 1
      }
      out(t) = sig
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val planesRef = ctx.addReferenceObj("srpPlanes", flatPlanes, "double[]")
      val out = ctx.freshName("out")
      val n = ctx.freshName("n")
      val t = ctx.freshName("t")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val sig = ctx.freshName("sig")
      val base = ctx.freshName("base")
      s"""
         |int $n = java.lang.Math.min($v.numElements(), $dim);
         |int[] $out = new int[$numTables];
         |for (int $t = 0; $t < $numTables; $t++) {
         |  int $sig = 0;
         |  for (int $j = 0; $j < $bits; $j++) {
         |    int $base = ($t * $bits + $j) * $dim;
         |    double $s = 0.0;
         |    for (int $i = 0; $i < $n; $i++) {
         |      if (!$v.isNullAt($i)) $s += $v.getDouble($i) * $planesRef[$base + $i];
         |    }
         |    if ($s > 0) $sig |= 1 << $j;
         |  }
         |  $out[$t] = $sig;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SrpSignature {
  /** Deterministic flat plane array: Gaussian stream in (table, bit,
    * component) order — identical to round 1's nested literal planes. */
  private[graft] def planes(numTables: Int, bits: Int, dim: Int, seed: Long): Array[Double] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(numTables * bits * dim)(rnd.nextGaussian())
  }

  /** srpSignature(v): ARRAY<INT> of the vector's bucket per LSH table. */
  def srpSignature(v: Column, numTables: Int, bits: Int, dim: Int, seed: Long): Column =
    Bridge.column(SrpSignature(Bridge.expression(v), numTables, bits, dim, seed))
}
