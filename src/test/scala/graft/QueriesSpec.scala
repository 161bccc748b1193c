package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pre-flight of the driver gate at sf0.001: every declared query runs,
  * has an oracle, and returns a sane shape; spot-checked row counts pin
  * the known outputs so regressions surface before the driver runs.
  */
class QueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  // Approx sketches aren't bit-comparable across engines (SURVEY.md §7.3);
  // the driver records a rows-only check for these.
  private val oracleExempt = Set("q_approx_distinct")

  test("every query has an oracle and distinct name") {
    assert(Registry.all.map(_.name).distinct.size === Registry.all.size)
    val noOracle = Registry.all.filter(_.oracle.isEmpty).map(_.name)
      .filterNot(oracleExempt)
    assert(noOracle.isEmpty, s"queries without oracle: $noOracle")
  }

  // Known result sizes at sf0.001 (validated against DuckDB via tools/check.py).
  private val expectedRows = Map(
    "q_char_count" -> 25L, "q_word_count" -> 31L, "q_distinct" -> 5L,
    "q_join_broadcast" -> 25L, "q_join_equi" -> 150L, "q_join_semi" -> 150L,
    "q_join_anti" -> 0L, "q_topk" -> 10L, "q_set_ops" -> 50L,
    "q_rollup" -> 31L, "q_window_rank" -> 25L, "q_window_running" -> 1500L,
    "q_agg_pricing" -> 6L, "q_math_funcs" -> 3L, "q_knn_brute" -> 10L,
    "q_dedup_exact" -> 500L, "q_dedup_simhash" -> 500L,
    "q_multimodal_decode" -> 500L, "q_mr_char_count" -> 25L,
    "q_text_stats" -> 99L, "q_quality_score" -> 500L, "q_token_count" -> 500L)

  for (q <- Registry.all) {
    test(s"${q.name} runs at sf0.001") {
      val df = q.build(spark, dir)
      val n = df.count()
      expectedRows.get(q.name).foreach(e => assert(n === e))
      if (q.name != "q_join_anti") assert(n > 0, s"${q.name} returned no rows")
      // column names must be distinct (driver sorts by name before hashing)
      assert(df.columns.distinct.length === df.columns.length)
      // closeJobHandle discipline: after consumption + release, the query
      // left no persistent RDDs behind (session cache hygiene gate)
      Caches.releaseAll()
      assert(spark.sparkContext.getPersistentRDDs.isEmpty,
        s"${q.name} leaked persistent RDDs: " +
          spark.sparkContext.getPersistentRDDs.keys.mkString(","))
    }
  }

  test("flagship entry returns rows (driver t1 smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
