package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Structural invariants of the round-5 statistics and training-prep
  * operators — mathematical properties the oracle hash can't state
  * directly (it only certifies engine agreement, not that the statistic
  * is the statistic).
  */
class StatsAndPrepPropertiesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  private def run(name: String) = {
    val rows = Registry.byName(name).build(spark, dir).collect()
    Caches.releaseAll()
    rows
  }

  test("mann-whitney: U1 + U2 == n1*n2 and both are non-negative") {
    val r = run("q_mann_whitney")(0)
    val n1 = r.getAs[Long]("n1"); val n2 = r.getAs[Long]("n2")
    val u1 = r.getAs[Double]("u1"); val u2 = r.getAs[Double]("u2")
    assert(u1 >= 0.0 && u2 >= 0.0)
    assert(u1 + u2 === n1.toDouble * n2)
  }

  test("ks statistic is a proper sup-distance: 0 < D <= 1") {
    val d = run("q_ks_test")(0).getAs[Double]("ks_d")
    assert(d > 0.0 && d <= 1.0)
  }

  test("chi2: non-negative statistic, dof = (|s|-1)(|p|-1), n = table size") {
    val r = run("q_chi2")(0)
    assert(r.getAs[Double]("chi2") >= 0.0)
    assert(r.getAs[Int]("dof") === 8) // 3 statuses x 5 priorities
    assert(r.getAs[Long]("n") === Tables(spark, dir, "orders").count())
  }

  test("seq_pack conserves tokens and numbers packs contiguously") {
    val rows = run("q_seq_pack")
    val packed = rows.map(_.getAs[Long]("pack_tokens")).sum
    val total = Tables(spark, dir, "documents")
      .select(graft.functions.TextOps.tokenStats(col("text"))
        .getField("n_tokens").cast("long").as("tc"))
      .agg(sum(col("tc"))).collect()(0).getLong(0)
    assert(packed === total, "every token lands in exactly one pack")
    val ids = rows.map(_.getAs[Long]("pack_id")).sorted
    assert(ids.head === 0L && ids.last === ids.length - 1L,
      "pack ids are 0..n-1 with no gaps (concatenation leaves no empty block)")
  }

  test("pareto share: customer count non-decreasing in the revenue target") {
    val byPct = run("q_pareto_share")
      .map(r => r.getAs[Int]("pct") -> r.getAs[Long]("n_customers")).toMap
    assert(byPct(50) <= byPct(80) && byPct(80) <= byPct(90))
    assert(byPct(50) >= 1L)
  }

  test("interleave: kept <= total per tier; rate-100 tier keeps everything") {
    val rows = run("q_interleave")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_kept") <= r.getAs[Long]("n_total"))
    }
    val long = rows.find(_.getAs[String]("tier") == "long").get
    assert(long.getAs[Long]("n_kept") === long.getAs[Long]("n_total"),
      "the 100% tier is a pass-through")
  }

  test("minmax scaling lands every reported value in [0, 1]") {
    run("q_minmax_scale").foreach { r =>
      val v = r.getAs[Double]("scaled")
      assert(v >= 0.0 && v <= 1.0, s"scaled=$v out of range")
    }
  }

  test("mad outlier: MAD <= spread bound and outliers are a strict minority") {
    run("q_mad_outlier").foreach { r =>
      assert(r.getAs[Double]("mad") >= 0.0)
      assert(r.getAs[Long]("n_outliers") * 2 < r.getAs[Long]("n"),
        "a robust screen must not flag a majority")
    }
  }

  test("percentile_rank: pos_share strictly increasing with revenue") {
    val rows = run("q_percentile_rank")
      .map(r => (r.getAs[Long]("cents"), r.getAs[Double]("pos_share")))
    rows.sortBy(_._1).toSeq.sliding(2).foreach {
      case Seq((c1, p1), (c2, p2)) =>
        assert(p1 >= 0.0 && p2 <= 1.0)
        if (c1 < c2) assert(p1 < p2, s"rank order violates revenue order")
      case _ => ()
    }
  }

  test("rolling average equals the daily value on the first day") {
    // the query output is ordered by day, so head is the first day
    val first = run("q_rolling_avg").head
    assert(first.getAs[Double]("ma7_cents") === first.getAs[Long]("cents").toDouble,
      "window of size 1 averages to the value itself")
  }

  test("kendall tau-b matches a naive in-memory concordance count") {
    // replay the daily (revenue-cents, order-count) series in Scala and
    // count concordant/discordant/tied pairs with a double loop — the
    // O(n^2) definition the distributed pair-join must agree with.
    val daily = Tables(spark, dir, "orders")
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(floor(col("o_totalprice") * 100 + 0.5).cast("long")).as("x"),
        count(lit(1)).as("y"))
      .orderBy(col("day"))
      .collect()
      .map(r => (r.getAs[Long]("x"), r.getAs[Long]("y")))
    var nc = 0L; var nd = 0L; var nx = 0L; var ny = 0L; var n0 = 0L
    for (i <- daily.indices; j <- (i + 1) until daily.length) {
      val ((xa, ya), (xb, yb)) = (daily(i), daily(j))
      n0 += 1
      if ((xa < xb && ya < yb) || (xa > xb && ya > yb)) nc += 1
      if ((xa < xb && ya > yb) || (xa > xb && ya < yb)) nd += 1
      if (xa == xb) nx += 1
      if (ya == yb) ny += 1
    }
    val tauB = math.floor((nc - nd).toDouble /
      math.sqrt((n0 - nx).toDouble * (n0 - ny).toDouble) * 10000 + 0.5) / 10000
    val r = run("q_kendall_tau")(0)
    assert(r.getAs[Long]("n0") === n0)
    assert(r.getAs[Long]("nc") === nc)
    assert(r.getAs[Long]("nd") === nd)
    assert(r.getAs[Double]("tau_b") === tauB)
    assert(math.abs(tauB) <= 1.0, "tau-b is a correlation")
  }

  test("theil index matches the direct formula and sits in [0, ln n]") {
    val cents = Tables(spark, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(sum(floor(col("o_totalprice") * 100 + 0.5).cast("long")).as("cents"))
      .collect().map(_.getAs[Long]("cents").toDouble)
    val n = cents.length
    val mu = cents.sum / n
    val direct = cents.map { x => val r = x / mu; r * math.log(r) }.sum / n
    val r = run("q_theil_index")(0)
    assert(r.getAs[Long]("n_customers") === n.toLong)
    val theil = r.getAs[Double]("theil")
    // the query floors per-term picounits before summing; the naive sum
    // doesn't — agreement is to the picounit-truncation tolerance
    assert(math.abs(theil - direct) < 1e-3,
      s"distributed $theil vs direct $direct")
    assert(theil >= 0.0, "Theil T is non-negative (Jensen)")
    assert(theil <= math.log(n.toDouble), "bounded by ln(n) at max inequality")
    val norm = r.getAs[Double]("theil_norm")
    assert(norm >= 0.0 && norm <= 1.0)
  }

  test("systematic sample replays exactly: 50 probes, each in its interval") {
    val rows = run("q_systematic_sample")
    assert(rows.length === 50, "every probe lands in exactly one interval")
    assert(rows.map(_.getAs[Int]("j")).sorted.toSeq === (0 until 50),
      "probe indices are 0..49 exactly once")
    // replay the weighted stride in memory: prefix sums in doc_id order,
    // probe positions ((2j+1)·W) div 100 + 1, expected doc per probe
    val tc = Tables(spark, dir, "documents")
      .select(col("doc_id"),
        graft.functions.TextOps.tokenStats(col("text"))
          .getField("n_tokens").cast("long").as("tc"))
      .filter(col("tc") > 0).orderBy(col("doc_id"))
      .collect().map(r => (r.getAs[String]("doc_id"), r.getAs[Long]("tc")))
    val cum = tc.scanLeft(0L)(_ + _._2).tail
    val tot = cum.last
    val expected = (0 until 50).map { j =>
      val pos = (2L * j + 1) * tot / 100 + 1
      val idx = cum.indexWhere(pos <= _)
      (j, tc(idx)._1, tc(idx)._2)
    }
    val got = rows.sortBy(_.getAs[Int]("j"))
      .map(r => (r.getAs[Int]("j"), r.getAs[String]("doc_id"), r.getAs[Long]("tc")))
    assert(got.toSeq === expected, "distributed selection replays the stride")
  }
}
