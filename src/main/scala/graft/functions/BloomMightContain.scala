package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Codegen membership probe against a pre-built Bloom filter — the
  * runtime-filter (semi-join reduction) primitive: build a filter over
  * the SMALL side's join keys, probe every BIG-side row BEFORE the
  * shuffle, and let the exact join see only rows that can match. At
  * 100 TB this turns "shuffle the whole fact table" into "shuffle the
  * ~selectivity fraction that survives the probe"; false positives cost
  * only wasted shuffle rows, never wrong results, because the exact
  * join still runs behind the probe.
  *
  * Spark's own runtime row-level filtering (InjectRuntimeFilter) does
  * this automatically only for DPP-like shapes; this expression makes
  * the pattern available explicitly — e.g. against a filter persisted
  * from a previous job, which the optimizer can never infer.
  *
  * The filter rides codegen as a referenced object (same technique as
  * SrpSignature's plane matrix): one virtual call per row on a
  * driver-built, task-broadcast BloomFilter. Null input → null (mirrors
  * SQL IN semantics over a non-null build side).
  */
case class BloomMightContain(child: Expression, bf: BloomFilter)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain expects BIGINT, got $t")
    }

  override def dataType: DataType = BooleanType

  override def nullSafeEval(v: Any): Any =
    bf.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomFilter", bf, classOf[BloomFilter].getName)
    defineCodeGen(ctx, ev, c => s"$ref.mightContainLong($c)")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object BloomMightContain {
  /** Column-API entry: `prune(col, bf)` is true iff col MAY be in bf. */
  def prune(c: Column, bf: BloomFilter): Column =
    Bridge.column(BloomMightContain(Bridge.expression(c), bf))

  /** Build a filter over one BIGINT key column of a (small) build-side
    * frame — the sizing rule lives here so every consumer agrees:
    * expected items = the frame's actual count (floored at 1000 so
    * degenerate builds don't over-saturate), fpp 1%. Two passes over
    * the build side (count + aggregate), both dim-sized. */
  def buildFor(df: org.apache.spark.sql.DataFrame, keyCol: String): BloomFilter =
    df.stat.bloomFilter(keyCol, math.max(df.count(), 1000L), 0.01)
}

/** Serializable carrier that re-materializes a CountMinSketch from its
  * bytes ONCE per executor (@transient lazy), so probe UDFs don't pay a
  * per-row deserialization. */
class CmsHolder(bytes: Array[Byte]) extends Serializable {
  @transient lazy val cms: org.apache.spark.util.sketch.CountMinSketch =
    org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(bytes))
}
