package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass token statistics over a text column:
  * struct(n_tokens, stop_hits, char_sum).
  *
  * Replaces the interpreted higher-order-function chain
  * `size(filter(split(text,' '), _ <> ''))` +
  * `size(filter(ws, _ in stopwords))` +
  * `aggregate(transform(ws, length(_)), 0L, _+_)`
  * used by the lang-id / quality-score / token-count queries — Spark HOFs
  * evaluate one boxed expression-tree walk per array element, measured ~8x
  * slower than a compiled scan (same finding as WordNGrams/CosineSimilarity;
  * q_lang_id was the round-1 bench outlier at 2.2s on sf0.1 because of two
  * HOF passes per document).
  *
  * Semantics (bit-parity with the HOF formulation and the DuckDB oracles):
  * tokens are maximal runs of non-space characters when splitting on the
  * single character ' ' and dropping empties; char_sum counts Unicode code
  * points per token (== Spark `length`, DuckDB `length`); stop_hits is a
  * case-sensitive membership test against [[graft.functions.TextOps.stopwords]].
  */
case class TokenStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"token_stats expects string, got ${other.sql}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("stop_hits", LongType, nullable = false),
    StructField("char_sum", LongType, nullable = false)))

  override def prettyName: String = "token_stats"

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  /** Public so the generated code can call it (one virtual call per row,
    * tight loop inside — the row-level orchestration stays in whole-stage
    * codegen).
    */
  def compute(s: UTF8String): InternalRow = {
    val str = s.toString
    val len = str.length
    var i = 0
    var n = 0L; var hits = 0L; var chars = 0L
    while (i < len) {
      while (i < len && str.charAt(i) == ' ') i += 1
      if (i < len) {
        val start = i
        while (i < len && str.charAt(i) != ' ') i += 1
        n += 1
        chars += str.codePointCount(start, i)
        if (i - start <= TokenStats.maxStopwordLen &&
            TokenStats.stopwordSet.contains(str.substring(start, i))) hits += 1
      }
    }
    new GenericInternalRow(Array[Any](n, hits, chars))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("tokenStats", this, classOf[TokenStats].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): TokenStats =
    copy(child = newChild)
}

object TokenStats {
  /** Canonical stopword list lives in TextOps (kept in sync with the
    * DuckDB oracle IN-lists); cached here as a HashSet for the scan.
    */
  private[plans] val stopwordSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    graft.functions.TextOps.stopwords.foreach(s.add)
    s
  }
  private[plans] val maxStopwordLen: Int =
    graft.functions.TextOps.stopwords.map(_.length).max
}
