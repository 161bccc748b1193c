package graft

import org.scalatest.funsuite.AnyFunSuite

/** SURVEY.md §5.2 item 4: queries must be value-deterministic across runs
  * (catches missing ORDER BY / float instability before the driver does).
  * Partition-count invariance is exercised by the verify probe
  * (SPARK_GRAFT_CPUS=7); here we double-run the float-heavy queries.
  */
class DeterminismSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  private val floatHeavy = Seq(
    "q_agg_pricing", "q_window_running", "q_knn_brute", "q_knn_ivf",
    "q_dedup_minhash", "q_quality_score", "q_math_funcs", "q_sessionize",
    "q_multimodal_pipeline")

  for (name <- floatHeavy) {
    test(s"$name is run-to-run deterministic") {
      val a = Registry.byName(name).build(spark, dir).collect().map(_.toSeq).toSeq
      val b = Registry.byName(name).build(spark, dir).collect().map(_.toSeq).toSeq
      assert(a === b)
    }
  }

  test("declarative session_window (built-in) agrees with q_sessionize totals") {
    import org.apache.spark.sql.functions._
    val sw = Tables.events(spark, dir)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
    val want = Registry.byName("q_sessionize").build(spark, dir)
    assert(sw.count() === want.count())
    assert(sw.agg(sum("n_events")).collect()(0).getLong(0) ===
      Tables.events(spark, dir).count())
  }
}
