package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType
import org.apache.spark.unsafe.types.UTF8String

/** Optimizer rule: rewrite the portable token-count idiom
  *
  *   size(filter(split(text, ' '), w -> w <> ''))
  *
  * to the native one-pass scan
  *
  *   cast(token_stats(text).n_tokens as int)
  *
  * `ArrayFilter` evaluates its lambda interpreted, one boxed
  * expression-tree walk per token; TokenStats counts tokens in a single
  * compiled scan. Values are identical (NativeExprPropertySpec pins the
  * equivalence; NativeRewriteSpec pins this rewrite), so users who write
  * the idiomatic HOF form get the native path for free — the same
  * plan-level service Catalyst's own `ReplaceExpressions` provides for
  * builtin rewrites.
  *
  * Matched conservatively: the split pattern must be the literal single
  * space with the default unlimited split, and the lambda must be exactly
  * `w <> ''` / `'' <> w` over the lambda variable.
  */
object NativeTextRewrite extends Rule[LogicalPlan] {

  private def isSpace(e: Expression): Boolean = e match {
    case Literal(s: UTF8String, _) => s.toString == " "
    case _ => false
  }

  private def isEmptyLit(e: Expression): Boolean = e match {
    case Literal(s: UTF8String, _) => s.toString == ""
    case _ => false
  }

  private def isNonEmptyTest(fn: Expression): Boolean = fn match {
    case LambdaFunction(Not(EqualTo(v: NamedLambdaVariable, lit)), Seq(arg: NamedLambdaVariable), _) =>
      v.exprId == arg.exprId && isEmptyLit(lit)
    case LambdaFunction(Not(EqualTo(lit, v: NamedLambdaVariable)), Seq(arg: NamedLambdaVariable), _) =>
      v.exprId == arg.exprId && isEmptyLit(lit)
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case Size(ArrayFilter(StringSplit(text, sep, Literal(-1, IntegerType)), fn), legacy)
        if isSpace(sep) && isNonEmptyTest(fn) && !legacy =>
      Cast(GetStructField(TokenStats(text), 0, Some("n_tokens")), IntegerType)
  }
}
