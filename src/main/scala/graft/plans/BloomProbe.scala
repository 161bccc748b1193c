package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Native Bloom-filter membership probe over a BIGINT key column.
  *
  * The runtime-filter pattern (build a Bloom filter on a selective dim,
  * drop non-qualifying fact rows at the scan) needs a per-row
  * `mightContain` probe, and Spark exposes no public built-in for it — a
  * Scala UDF would break whole-stage codegen exactly on the hot scan the
  * filter exists to accelerate. This expression keeps the probe inside
  * codegen: the filter object rides the generated class as a reference
  * (same mechanism as SignedDot's constant hyperplanes) and each row
  * costs one `mightContainLong` call — a handful of hash ops on a
  * shared bitset, no boxing, no closure dispatch.
  *
  * The filter is bounded driver/model state (~1 MB at 1% fpp for 1M
  * keys), shipped once per executor with the serialized plan — never
  * per task and never per row.
  */
case class BloomProbe(child: Expression, filter: BloomFilter)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_probe expects an integral key, got ${other.sql}")
  }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_probe"

  private def asLong(v: Any): Long = v match {
    case l: Long => l
    case i: Int  => i.toLong
    case other   => sys.error(s"bloom_probe: unexpected value $other")
  }

  override def nullSafeEval(v: Any): Any = filter.mightContainLong(asLong(v))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", filter,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = $ref.mightContainLong((long) $v);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomProbe =
    copy(child = newChild)
}
