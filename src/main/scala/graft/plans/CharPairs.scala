package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Adjacent character-pair census scan for the BPE queries — one native
  * pass per document instead of the interpreted
  * `transform(sequence(1, length(text) - 1), i -> substring(text, i, 2))`
  * HOF chain (which walks a boxed expression tree per element and
  * materializes a full per-row array of substrings; the same class of
  * cost WordNGrams removed from the shingle pipelines).
  *
  * Semantics — exactly the HOF + `NOT contains(pair, ' ')` pipeline both
  * queries' DuckDB oracles replay: every adjacent CODE-POINT pair of the
  * text, skipping pairs containing the space separator. Code points, not
  * UTF-16 units, to match Spark's and DuckDB's character-based
  * `substring`/`substr` on any plane.
  *
  * Codegen follows TokenStats: the row-level orchestration stays inside
  * whole-stage codegen and pays one virtual `compute` call per row with
  * the tight loop inside — so a projection containing this scan no
  * longer breaks the fused pipeline the way the CodegenFallback version
  * did.
  */
case class CharPairs(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"char_pairs expects string, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_pairs"

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  /** Public so the generated code can call it (one virtual call per row,
    * tight loop inside).
    */
  def compute(input: UTF8String): GenericArrayData = {
    val s = input.toString
    val cps = s.codePoints().toArray
    if (cps.length < 2) new GenericArrayData(Array.empty[Any])
    else {
      val out = new Array[Any](cps.length - 1)
      var n = 0
      var i = 0
      val sb = new java.lang.StringBuilder(4)
      while (i < cps.length - 1) {
        if (cps(i) != ' ' && cps(i + 1) != ' ') {
          sb.setLength(0)
          sb.appendCodePoint(cps(i))
          sb.appendCodePoint(cps(i + 1))
          out(n) = UTF8String.fromString(sb.toString)
          n += 1
        }
        i += 1
      }
      new GenericArrayData(java.util.Arrays.copyOf(
        out.asInstanceOf[Array[AnyRef]], n).asInstanceOf[Array[Any]])
    }
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("charPairs", this, classOf[CharPairs].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): CharPairs =
    copy(child = newChild)
}
