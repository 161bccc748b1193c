package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Structural invariants of the round-5 second-wave operators (TPC-H
  * pipelines, time-series/statistics legs, graph census, similarity and
  * training-mix audits) — properties the oracle hash can't state
  * directly. Each runs at sf0.001 against an independent recomputation
  * or a mathematical bound.
  */
class SecondWavePropertiesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  private def run(name: String) = {
    val rows = Registry.byName(name).build(spark, dir).collect()
    Caches.releaseAll()
    rows
  }

  test("tpch_q3: top-10 head, strictly ordered, positive revenue") {
    val rows = run("q_tpch_q3")
    assert(rows.length === 10)
    val rev = rows.map(_.getAs[Long]("revenue_cents"))
    assert(rev.forall(_ > 0L))
    assert(rev.sameElements(rev.sortBy(-_)), "descending revenue")
  }

  test("tpch_q5: only ASIA nations, positive revenue, descending") {
    val asian = Tables(spark, dir, "nation")
      .join(Tables(spark, dir, "region"),
        col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "ASIA")
      .select("n_name").collect().map(_.getString(0)).toSet
    val rows = run("q_tpch_q5")
    assert(rows.nonEmpty && rows.forall(r => asian(r.getAs[String]("n_name"))))
    val rev = rows.map(_.getAs[Long]("revenue_cents"))
    assert(rev.forall(_ > 0L) && rev.sameElements(rev.sortBy(-_)))
  }

  test("anova: k groups, full n, F > 0, eta2 in [0,1]") {
    val r = run("q_anova")(0)
    assert(r.getAs[Int]("k") === 5)
    assert(r.getAs[Long]("n") === Tables(spark, dir, "orders").count())
    assert(r.getAs[Double]("f") > 0.0)
    val eta2 = r.getAs[Double]("eta2")
    assert(eta2 >= 0.0 && eta2 <= 1.0)
  }

  test("ewma: first day equals its own revenue; all values inside the series range") {
    val rows = run("q_ewma")
    val first = rows.head
    assert(math.abs(first.getAs[Double]("ewma_cents") -
      first.getAs[Long]("cents").toDouble) <= 0.5,
      "day one has only itself in the decay window")
    val cents = rows.map(_.getAs[Long]("cents"))
    val (lo, hi) = (cents.min.toDouble, cents.max.toDouble)
    assert(rows.forall { r =>
      val e = r.getAs[Double]("ewma_cents"); e >= lo - 0.5 && e <= hi + 0.5
    }, "a convex combination stays inside the value range")
  }

  test("triangle census matches an independent adjacency-set recount") {
    val r = run("q_triangle_count")(0)
    // brute recount at sf0.001: adjacency sets + per-edge intersection
    val edges = {
      val op = Tables(spark, dir, "lineitem")
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
      op.join(op.withColumnRenamed("p", "q"), "o")
        .filter(col("p") < col("q"))
        .select(col("p"), col("q")).distinct()
        .collect().map(x => (x.getLong(0), x.getLong(1)))
    }
    Caches.releaseAll()
    val adj = edges.flatMap { case (u, v) => Seq(u -> v, v -> u) }
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
    val tri = edges.map { case (u, v) => (adj(u) & adj(v)).size.toLong }.sum / 3
    assert(r.getAs[Long]("n_edges") === edges.length.toLong)
    assert(r.getAs[Long]("n_nodes") === adj.size.toLong)
    assert(r.getAs[Long]("n_triangles") === tri)
    val cc = r.getAs[Double]("clustering_coeff")
    assert(cc >= 0.0 && cc <= 1.0)
  }

  test("ann recall: k = 10, hits consistent with the rounded ratio") {
    val r = run("q_ann_recall")(0)
    assert(r.getAs[Int]("k") === 10)
    val hits = r.getAs[Int]("hits")
    assert(hits >= 0 && hits <= 10)
    assert(math.round(r.getAs[Double]("recall") * 10).toInt === hits)
  }

  test("semantic dedup: clusters partition the corpus; kept + dupes = members") {
    val rows = run("q_dedup_semantic")
    assert(rows.length === 8)
    val total = Tables(spark, dir, "embeddings").count()
    assert(rows.map(_.getAs[Long]("n_members")).sum === total)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_kept") + r.getAs[Long]("n_dupes") ===
        r.getAs[Long]("n_members"))
    }
  }

  test("ccnet buckets: tercile sizes within 1, NLL bands ordered and disjoint") {
    val rows = run("q_ccnet_bucket").sortBy(_.getAs[Int]("bucket"))
    assert(rows.map(_.getAs[Int]("bucket")).sameElements(Array(1, 2, 3)))
    val sizes = rows.map(_.getAs[Long]("n_docs"))
    assert(sizes.max - sizes.min <= 1L, "integer tercile cut balances sizes")
    for (i <- 1 until rows.length)
      assert(rows(i).getAs[Double]("min_nll") >=
        rows(i - 1).getAs[Double]("max_nll"),
        "bucket NLL ranges must not interleave")
  }

  test("cohort matrix: offset-0 retention is 1.0 and shares never exceed it") {
    val rows = run("q_cohort_matrix")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ret = r.getAs[Double]("retention")
      assert(ret > 0.0 && ret <= 1.0)
      if (r.getAs[Int]("week_offset") === 0)
        assert(ret === 1.0, "every user is active in their cohort week")
    }
  }

  test("reservoir sample is exactly the 100 hash-smallest rows") {
    val rows = run("q_reservoir_sample")
    assert(rows.length === 100)
    val got = rows.map(_.getAs[String]("h"))
    assert(got.sameElements(got.sorted), "emitted in hash order")
    val all = Tables(spark, dir, "lineitem")
      .select(substring(md5(concat_ws("-", col("l_orderkey"), col("l_linenumber"))), 1, 16)
        .as("h")).collect().map(_.getString(0)).sorted.take(100)
    assert(got.sameElements(all), "TakeOrdered head = true 100 smallest hashes")
  }

  test("winsorized mean sits inside its clamp band") {
    run("q_winsorize").foreach { r =>
      val lo = r.getAs[Double]("p05"); val hi = r.getAs[Double]("p95")
      val m = r.getAs[Double]("winsorized_mean")
      assert(lo <= hi && m >= lo - 0.01 && m <= hi + 0.01)
    }
  }

  test("fuzzy join: blocked, deduplicated, within the distance bound") {
    val rows = run("q_fuzzy_join")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val a = r.getAs[String]("name_a"); val b = r.getAs[String]("name_b")
      assert(a < b)
      assert(r.getAs[Int]("dist") <= 4)
      assert(a.split(" ").last === b.split(" ").last, "same blocking key")
    }
  }

  test("bpe pairs: 2-char in-word pairs, counts descending") {
    val rows = run("q_bpe_pairs")
    assert(rows.length === 20)
    val cnts = rows.map(_.getAs[Long]("cnt"))
    assert(cnts.sameElements(cnts.sortBy(-_)))
    rows.foreach { r =>
      val p = r.getAs[String]("pair")
      assert(p.length === 2 && !p.contains(" "))
    }
  }
}
