package graft

import graft.plans.GraftExtensions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The NativeTextRewrite optimizer rule: the HOF token-count idiom must
  * be rewritten to the native token_stats scan (plan shape) without
  * changing results (values), and non-matching shapes must be left alone.
  */
class NativeRewriteSpec extends AnyFunSuite {
  private lazy val spark = { val s = TestSpark.spark; GraftExtensions.register(s); s }

  private def hofCount = size(filter(split(col("text"), " "), w => w =!= lit("")))

  test("rewritten idiom keeps values on adversarial local data") {
    import spark.implicits._
    // (local relations constant-fold at optimize time, so plan-shape
    // assertions live in the parquet-backed tests below)
    val df = Seq("a b  c", "", "  ", "the quick  brown", "solo")
      .toDF("text").select(col("text"), hofCount.as("n"))
    assert(df.select("n").as[Int].collect().toSeq === Seq(3, 0, 0, 3, 1))
  }

  test("rewrite fires inside a realistic aggregate over parquet") {
    val docs = Tables(spark, TestSpark.sf0001, "documents")
    val viaHof = docs.agg(sum(hofCount.cast("long")).as("total"))
    assert(viaHof.queryExecution.optimizedPlan.toString.contains("token_stats"))
    val viaNative = docs.agg(
      sum(graft.functions.TextOps.tokenStats(col("text")).getField("n_tokens")).as("total"))
    assert(viaHof.collect().toSeq === viaNative.collect().toSeq)
  }

  test("non-matching shapes are untouched") {
    val docs = Tables(spark, TestSpark.sf0001, "documents")
    // different separator: must stay a HOF filter
    val other = docs.select(
      size(filter(split(col("text"), ","), w => w =!= lit(""))).as("n"))
    val otherPlan = other.queryExecution.optimizedPlan.toString
    assert(!otherPlan.contains("token_stats"), otherPlan)
    assert(otherPlan.contains("lambdafunction"), otherPlan)
    // different predicate: must stay a HOF filter
    val pred = docs.select(
      size(filter(split(col("text"), " "), w => w =!= lit("a"))).as("n"))
    val predPlan = pred.queryExecution.optimizedPlan.toString
    assert(!predPlan.contains("token_stats"), predPlan)
    assert(predPlan.contains("lambdafunction"), predPlan)
  }
}
