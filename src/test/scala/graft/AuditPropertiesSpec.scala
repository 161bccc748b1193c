package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Structural invariants of the round-5 third-wave audit operators —
  * mathematical properties the oracle hash can't state directly (it only
  * certifies engine agreement, not that the statistic is the statistic).
  */
class AuditPropertiesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  private def run(name: String) = {
    val rows = Registry.byName(name).build(spark, dir).collect()
    Caches.releaseAll()
    rows
  }

  test("spearman: rho in [-1, 1] and n covers every row") {
    val r = run("q_spearman")(0)
    val rho = r.getAs[Double]("rho")
    assert(rho >= -1.0 && rho <= 1.0)
    assert(r.getAs[Long]("n") ===
      Tables(spark, dir, "lineitem").count())
  }

  test("spearman equals Pearson corr of average ranks (definition check)") {
    import org.apache.spark.sql.expressions.Window
    val li = Tables(spark, dir, "lineitem")
      .select(col("l_quantity").as("x"), col("l_extendedprice").as("y"))
    // rank().avg over ties == (2C(<v) + n_v + 1) / 2 — small-data windows
    // are fine in a test
    val w1 = Window.orderBy(col("x")); val w2 = Window.orderBy(col("y"))
    val ranked = li
      .withColumn("rx", avg(rank().over(w1)).over(Window.partitionBy(col("x"))))
      .withColumn("ry", avg(rank().over(w2)).over(Window.partitionBy(col("y"))))
    val expected = ranked.agg(corr(col("rx"), col("ry"))).collect()(0).getDouble(0)
    val got = run("q_spearman")(0).getAs[Double]("rho")
    assert(math.abs(got - expected) < 1e-3, s"got=$got expected=$expected")
  }

  test("iqr outliers: fences bracket the IQR and outliers are a minority") {
    val rows = run("q_iqr_outlier")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("fence_lo") < r.getAs[Double]("fence_hi"))
      val share = r.getAs[Double]("outlier_share")
      assert(share >= 0.0 && share < 0.25,
        "Tukey fences cannot flag a quarter of a unimodal group")
      assert(r.getAs[Long]("n_outliers") <= r.getAs[Long]("n"))
    }
  }

  test("benford: shares sum to 1, expected shares are the Benford law") {
    val rows = run("q_benford")
    val digits = rows.map(_.getAs[Int]("digit")).sorted
    assert(digits.forall(d => d >= 1 && d <= 9))
    assert(math.abs(rows.map(_.getAs[Double]("share")).sum - 1.0) < 1e-3)
    rows.foreach { r =>
      val d = r.getAs[Int]("digit")
      val exp = math.log10(1.0 + 1.0 / d)
      assert(math.abs(r.getAs[Double]("expected") - exp) < 1e-3)
    }
  }

  test("cusum: 5 rows, and drift magnitudes are reported in descending order") {
    val rows = run("q_cusum")
    assert(rows.length === 5)
    val mags = rows.map(r => math.abs(r.getAs[Double]("drift_usd")))
    assert(mags.zip(mags.tail).forall { case (a, b) => a >= b })
  }

  test("cusum: full series would telescope to ~0 (deviations sum out)") {
    // the scaled deviations cents·D − tot sum to exactly 0 over all days,
    // so the final prefix value is 0 — recompute the invariant directly
    val daily = Tables(spark, dir, "orders")
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(floor(col("o_totalprice") * 100 + 0.5).cast("long")).as("cents"))
    val (tot, d) = {
      val r = daily.agg(sum(col("cents")), count(lit(1))).collect()(0)
      (r.getLong(0), r.getLong(1))
    }
    val devSum = daily.agg(sum(col("cents") * d - tot)).collect()(0).getLong(0)
    assert(devSum === 0L)
  }

  test("dau stickiness: in (0, 1] and sum_dau >= wau-consistency bounds") {
    val rows = run("q_dau_stickiness")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val s = r.getAs[Double]("stickiness")
      assert(s > 0.0 && s <= 1.0, s"stickiness=$s (avg DAU cannot exceed WAU)")
      // each day's actives are a subset of the week's actives
      assert(r.getAs[Long]("sum_dau") <=
        r.getAs[Long]("n_days") * r.getAs[Long]("wau"))
      assert(r.getAs[Long]("sum_dau") >= r.getAs[Long]("wau"),
        "every weekly active is active on at least one day")
    }
  }

  test("split leakage: split partitions the corpus; leaked <= test") {
    val r = run("q_split_leakage")(0)
    val nTrain = r.getAs[Long]("n_train"); val nTest = r.getAs[Long]("n_test")
    assert(nTrain + nTest === Tables(spark, dir, "documents").count())
    assert(r.getAs[Long]("n_leaked") <= nTest)
    val rate = r.getAs[Double]("leak_rate")
    assert(rate >= 0.0 && rate <= 1.0)
  }

  test("cramers v: effect size in [0, 1], grid dims match the fixture") {
    val r = run("q_cramers_v")(0)
    val v = r.getAs[Double]("v")
    assert(v >= 0.0 && v <= 1.0)
    assert(r.getAs[Int]("c") === 4) // 4 six-hour buckets
    assert(r.getAs[Long]("n") === Tables.events(spark, dir).count())
  }

  test("js divergence: bounded by [0, 1] bit and covers every source") {
    val rows = run("q_js_divergence")
    assert(rows.length ===
      Tables(spark, dir, "documents").select(col("source")).distinct().count())
    rows.foreach { r =>
      val j = r.getAs[Double]("jsd")
      // JSD with log2 is bounded by 1; the integer-floor funnel can
      // undershoot 0 by at most 501 picounats
      assert(j >= -1e-9 && j <= 1.0, s"jsd=$j")
      assert(r.getAs[Long]("n_tokens") > 0L)
    }
  }

  test("hhi: between the uniform floor 10000/n and the monopoly cap 10000") {
    val r = run("q_hhi")(0)
    val n = r.getAs[Long]("n_suppliers")
    val hhi = r.getAs[Double]("hhi")
    assert(hhi >= 10000.0 / n - 1e-6, "uniform shares minimize HHI")
    assert(hhi <= 10000.0 + 1e-6)
    val top = r.getAs[Double]("top_share")
    // top share² is a lower bound on the share-square sum
    assert(hhi >= top * top * 10000.0 - 1.0)
  }
}
