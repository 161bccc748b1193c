package graft
// (Ranks parity test appended at the bottom of this suite)

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Structural invariants of the round-2 analytics operators — properties
  * the oracle hash can't state directly.
  */
class AnalyticsPropertiesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  test("funnel stages partition the user population") {
    val stages = Registry.byName("q_funnel").build(spark, dir).collect()
    val total = stages.map(_.getAs[Long]("n_users")).sum
    val users = Tables.events(spark, dir).select("user_id").distinct().count()
    assert(total === users)
    val byStage = stages.map(r => r.getAs[Int]("stage")).toSeq
    assert(byStage === byStage.sorted && byStage.distinct === byStage)
  }

  test("retention cohorts cover every user exactly once") {
    val r = Registry.byName("q_retention").build(spark, dir).collect()
    val cohortSum = r.map(_.getAs[Long]("cohort_size")).sum
    val users = Tables.events(spark, dir).select("user_id").distinct().count()
    assert(cohortSum === users)
    r.foreach(row =>
      assert(row.getAs[Long]("retained_7d") <= row.getAs[Long]("cohort_size")))
  }

  test("stratified sample rates are sane and reproducible") {
    val a = Registry.byName("q_stratified_sample").build(spark, dir).collect()
    val b = Registry.byName("q_stratified_sample").build(spark, dir).collect()
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq)
    a.foreach { r =>
      assert(r.getAs[Long]("n_sampled") <= r.getAs[Long]("n_total"))
      val rate = r.getAs[Double]("rate")
      assert(rate >= 0.0 && rate <= 1.0)
    }
  }

  test("unpivot preserves multiplicity and mass per measure") {
    val melted = Registry.byName("q_unpivot").build(spark, dir)
    val base = Tables(spark, dir, "lineitem").filter(col("l_orderkey") < 50)
    assert(melted.count() === base.count() * 3)
    // ((l_orderkey, l_linenumber) is not unique in the synthetic data, so
    // a keyed round-trip is ill-posed; conservation of per-measure mass
    // pins value integrity instead)
    val meltedSums = melted.groupBy("metric").agg(sum("value").as("s"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val origSums = base.agg(
      sum("l_quantity"), sum("l_extendedprice"), sum("l_discount")).collect()(0)
    def close(a: Double, b: Double) = math.abs(a - b) <= 1e-9 * math.max(1.0, math.abs(b))
    assert(close(meltedSums("l_quantity"), origSums.getDouble(0)))
    assert(close(meltedSums("l_extendedprice"), origSums.getDouble(1)))
    assert(close(meltedSums("l_discount"), origSums.getDouble(2)))
  }

  test("full outer join keeps one-sided keys with nulls") {
    val out = Registry.byName("q_join_outer").build(spark, dir).collect()
    val custNations = Tables(spark, dir, "customer")
      .select("c_nationkey").distinct().count()
    val suppNations = Tables(spark, dir, "supplier")
      .select("s_nationkey").distinct().count()
    assert(out.length >= math.max(custNations, suppNations))
    // supplier side is tiny at sf0.001 → some nations must be NULL there
    assert(out.exists(r => r.isNullAt(r.fieldIndex("n_supp"))) || suppNations == out.length)
  }

  test("Ranks.withGlobalRowNumber == unpartitioned row_number window") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{col, row_number}
    val ev = Tables.events(spark, dir).select(col("event_id"), col("value"))
    val (numbered, n) = graft.functions.Ranks.withGlobalRowNumber(
      ev, Seq(col("value"), col("event_id")), "rn")
    assert(n === ev.count())
    val viaWindow = ev.withColumn("rn",
        row_number().over(Window.orderBy(col("value"), col("event_id"))).cast("long"))
      .select(col("event_id"), col("rn"))
    val diff = numbered.select(col("event_id"), col("rn"))
      .exceptAll(viaWindow).count()
    assert(diff === 0L, s"$diff row numbers differ from the window reference")
  }

  test("distributed prefix sums == unpartitioned running-window reference") {
    import org.apache.spark.sql.expressions.Window
    val perv = Tables.events(spark, dir)
      .groupBy(col("value").as("v"))
      .agg(count(lit(1)).as("n"),
        count_if(col("event_type") === "purchase").as("n1"))
    val got = graft.functions.Prefix
      .withRunningTotals(perv, Seq(col("v")), Seq("n", "n1"))
      .select(col("v"), col("n_cum"), col("n1_cum"))
    val want = perv.select(col("v"),
      sum(col("n")).over(Window.orderBy(col("v"))).as("n_cum"),
      sum(col("n1")).over(Window.orderBy(col("v"))).as("n1_cum"))
    assert(got.exceptAll(want).count() === 0L)
    assert(want.exceptAll(got).count() === 0L)
    graft.Caches.releaseAll()
  }

  test("pagerank conserves probability mass and stays positive") {
    val pr = Registry.byName("q_pagerank").build(spark, dir).collect()
    val ranks = pr.map(_.getAs[Double]("pr"))
    // symmetrized graph has no dangling nodes, so each damped iteration
    // preserves total mass exactly: Σ pr = 1 up to the pround(8) grain —
    // each node contributes at most 5e-9 of rounding drift, so the
    // tolerance scales with the node count (a fixed 1e-4 would go flaky
    // past ~20k nodes)
    assert(math.abs(ranks.sum - 1.0) < ranks.length * 5e-9 + 1e-6,
      s"mass = ${ranks.sum} over ${ranks.length} nodes")
    assert(ranks.forall(_ > 0.0))
  }

  test("graph degree histogram accounts for every trade-graph node") {
    val hist = Registry.byName("q_graph_degree").build(spark, dir).collect()
    val nodes = hist.map(_.getAs[Long]("n_nodes")).sum
    // independent node count from the same base tables (cheaper than
    // rebuilding the iterative pagerank just to count its rows)
    val pairs = Tables(spark, dir, "orders")
      .join(Tables(spark, dir, "lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey"), col("l_suppkey"))
    val want = pairs.select("o_custkey").distinct().count() +
      pairs.select("l_suppkey").distinct().count()
    assert(nodes === want, s"degree histogram covers $nodes nodes, expected $want")
  }

  test("char entropy is bounded by log2 of the per-doc alphabet") {
    val rows = Registry.byName("q_char_entropy").build(spark, dir).collect()
    val alphabet = Registry.byName("q_char_count").build(spark, dir).count()
    val bound = math.log(alphabet.toDouble) / math.log(2.0) + 1e-9
    rows.foreach { r =>
      val h = r.getAs[Double]("entropy")
      assert(h >= 0.0 && h <= bound, s"doc ${r.get(0)}: entropy $h outside [0, $bound]")
    }
  }

  test("ngram coverage shares are valid ratios") {
    val rows = Registry.byName("q_ngram_coverage").build(spark, dir).collect()
    rows.foreach { r =>
      val n = r.getAs[Long]("n_grams"); val s = r.getAs[Long]("shared_grams")
      assert(s >= 0 && s <= n)
      val share = r.getAs[Double]("shared_share")
      assert(share >= 0.0 && share <= 1.0)
    }
  }
}
