package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Tokenize + n-gram + (optional) distinct in one native pass.
  *
  * Equivalent to `array_distinct(transform(sequence(...), i ->
  * concat_ws(' ', element_at(words, i)...)))` over `filter(split(text,' '),
  * w -> w <> '')` — but those higher-order functions evaluate interpreted,
  * one boxed expression-tree walk per element. This expression does the
  * whole per-document loop in compiled Scala (measured ~4x on the shingle
  * pipelines). Codegen follows TokenStats/CharPairs: one virtual
  * `compute` call per row from inside whole-stage codegen, so the
  * containing projection stays fused instead of falling back to the
  * interpreted path for the whole stage.
  *
  * Semantics: split on single space, drop empty tokens, join n consecutive
  * tokens with a space; distinct preserves first occurrence (matching
  * array_distinct). Fewer than n tokens → empty array.
  */
case class WordNGrams(child: Expression, n: Int, distinct: Boolean)
    extends UnaryExpression {

  require(n >= 1, "n must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_ngrams expects string, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_ngrams"

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  /** Public so the generated code can call it (one virtual call per row,
    * tight loop inside).
    */
  def compute(input: UTF8String): GenericArrayData = {
    val words = input.toString
      .split(' ').filter(_.nonEmpty)
    if (words.length < n) new GenericArrayData(Array.empty[Any])
    else {
      val out =
        if (distinct) {
          val seen = new java.util.LinkedHashSet[String]()
          var i = 0
          val sb = new java.lang.StringBuilder
          while (i + n <= words.length) {
            sb.setLength(0)
            var k = 0
            while (k < n) { if (k > 0) sb.append(' '); sb.append(words(i + k)); k += 1 }
            seen.add(sb.toString)
            i += 1
          }
          val arr = new Array[Any](seen.size)
          val it = seen.iterator()
          var j = 0
          while (it.hasNext) { arr(j) = UTF8String.fromString(it.next()); j += 1 }
          arr
        } else {
          val m = words.length - n + 1
          val arr = new Array[Any](m)
          val sb = new java.lang.StringBuilder
          var i = 0
          while (i < m) {
            sb.setLength(0)
            var k = 0
            while (k < n) { if (k > 0) sb.append(' '); sb.append(words(i + k)); k += 1 }
            arr(i) = UTF8String.fromString(sb.toString)
            i += 1
          }
          arr
        }
      new GenericArrayData(out)
    }
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wordNGrams", this, classOf[WordNGrams].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): WordNGrams =
    copy(child = newChild)
}
