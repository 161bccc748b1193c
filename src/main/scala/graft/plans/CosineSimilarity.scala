package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native cosine similarity over two `array<float>` columns.
  *
  * Spark's higher-order functions (`zip_with` + `aggregate`) have no
  * codegen — they evaluate interpreted with per-element closure calls,
  * which measured ~2.5ms/row on 64-dim vectors. This expression generates
  * a tight primitive loop inside whole-stage codegen instead (one pass,
  * three double accumulators in index order — bit-identical to the HOF
  * formulation and to DuckDB's list_cosine_similarity double math modulo
  * the final pround).
  *
  * Semantics: dot(a,b) / (sqrt(dot(a,a)) * sqrt(dot(b,b))). Top-level
  * nulls propagate. Contract: inputs are dense non-null vectors of equal
  * length (the embeddings schema) — null ELEMENTS read as 0.0 here while
  * the HOF form yields NULL, mismatched lengths use the common prefix
  * while zip_with pads, and zero vectors produce NaN. Bit-equality with
  * cosineHof holds for the dense-vector contract (VectorOpsSpec).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  private def isNumericArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }
  // element accessors chosen per side: float arrays widen to double
  // exactly like the HOF form's cast — mixed float/double pairs (e.g.
  // raw embeddings vs double-precision centroids) stay bit-identical
  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(isNumericArray)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim expects two array<float|double> args, got ${left.dataType.sql}, ${right.dataType.sql}")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val lf = isFloat(left); val rf = isFloat(right)
    val n = math.min(x.numElements(), y.numElements())
    var ab = 0.0; var aa = 0.0; var bb = 0.0
    var i = 0
    while (i < n) {
      val xi = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      ab += xi * yi; aa += xi * xi; bb += yi * yi
      i += 1
    }
    ab / (math.sqrt(aa) * math.sqrt(bb))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val ab = ctx.freshName("ab"); val aa = ctx.freshName("aa")
      val bb = ctx.freshName("bb")
      val xi = ctx.freshName("xi"); val yi = ctx.freshName("yi")
      val getX = if (isFloat(left)) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val getY = if (isFloat(right)) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $ab = 0.0; double $aa = 0.0; double $bb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = $getX;
         |  double $yi = $getY;
         |  $ab += $xi * $yi; $aa += $xi * $xi; $bb += $yi * $yi;
         |}
         |${ev.value} = $ab / (java.lang.Math.sqrt($aa) * java.lang.Math.sqrt($bb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

/** Signed dot product against a constant hyperplane (LSH bucket bits):
  * dot(a, signs) with signs inlined as a primitive double[] in generated
  * code — no per-row array literal materialization.
  */
case class SignedDot(child: Expression, signs: Array[Double])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"signed_dot expects array<float>, got ${other.sql}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "signed_dot"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), signs.length)
    var s = 0.0
    var i = 0
    while (i < n) { s += signs(i) * x.getFloat(i).toDouble; i += 1 }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val signsRef = ctx.addReferenceObj("signs", signs, "double[]")
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $signsRef.length);
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $signsRef[$i] * (double) $a.getFloat($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): SignedDot =
    copy(child = newChild)
}
