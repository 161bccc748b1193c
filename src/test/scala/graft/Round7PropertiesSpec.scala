package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Naive in-memory replays and structural invariants for the round-7
  * operators — the oracle hash certifies that two engines agree; these
  * tests certify the statistic IS the statistic, by recomputing it with
  * the dumbest possible Scala on the sf0.001 fixture and demanding exact
  * agreement (every operator's arithmetic is integer-exact or portably
  * floored, so "close enough" would hide a bug).
  */
class Round7PropertiesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  private def run(name: String) = {
    val rows = Registry.byName(name).build(spark, dir).collect()
    Caches.releaseAll()
    rows
  }

  private def md5hash60(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(15), 16)
  }

  private def pround(x: Double, scale: Int): Double = {
    val f = math.pow(10, scale)
    math.floor(x * f + 0.5) / f
  }

  private lazy val edges: Seq[(Long, Long)] = {
    val o = Tables(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    Tables(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey")).collect()
      .flatMap(r => o.get(r.getLong(0)).map(c => (c * 2, r.getLong(1) * 2 + 1)))
      .distinct.toSeq
  }

  private lazy val symEdges: Seq[(Long, Long)] =
    edges ++ edges.map { case (a, b) => (b, a) }

  private def degrees(es: Seq[(Long, Long)]): Map[Long, Long] =
    es.groupBy(_._1).map { case (n, g) => n -> g.size.toLong }

  test("q_assortativity equals the naive Pearson over endpoint degrees") {
    val deg = degrees(symEdges)
    val xs = symEdges.map { case (s, d) => (deg(s), deg(d)) }
    val n = BigInt(xs.size)
    val sx = BigInt(xs.map(_._1).sum); val sy = BigInt(xs.map(_._2).sum)
    val sxy = xs.map { case (x, y) => BigInt(x) * BigInt(y) }.sum
    val sxx = xs.map { case (x, _) => BigInt(x) * BigInt(x) }.sum
    val syy = xs.map { case (_, y) => BigInt(y) * BigInt(y) }.sum
    val want = pround((n * sxy - sx * sy).toDouble /
      (math.sqrt((n * sxx - sx * sx).toDouble) * math.sqrt((n * syy - sy * sy).toDouble)), 6)
    val r = run("q_assortativity")(0)
    assert(r.getAs[Long]("n_edges") === xs.size.toLong)
    assert(r.getAs[Double]("assortativity") === want)
  }

  test("q_kcore equals a naive peel-to-fixpoint (k=3, <=4 rounds)") {
    var es = symEdges
    var rounds = 0
    var changed = true
    while (rounds < 4 && changed) {
      val deg = degrees(es)
      val keep = deg.filter(_._2 >= 3).keySet
      changed = keep.size != deg.size
      if (changed) es = es.filter { case (s, d) => keep(s) && keep(d) }
      rounds += 1
    }
    val want = degrees(es).values.groupBy(identity)
      .map { case (d, g) => d -> g.size.toLong }
    val got = run("q_kcore").map(r => r.getAs[Long]("deg") -> r.getAs[Long]("n_nodes")).toMap
    assert(got === want)
  }

  test("q_graph_jaccard equals the naive capped-wedge top-20") {
    val deg = degrees(symEdges)
    val wedges = symEdges.filter { case (x, _) => deg(x) <= 128 }
      .groupBy(_._1).values.flatMap { g =>
        val ns = g.map(_._2)
        for (a <- ns; b <- ns if a < b) yield (a, b)
      }
    val want = wedges.groupBy(identity).map { case ((a, b), g) =>
      val cn = g.size.toLong
      (a, b, cn, cn * 1000000L / (deg(a) + deg(b) - cn))
    }.toSeq.sortBy { case (a, b, _, s) => (-s, a, b) }.take(20)
    val got = run("q_graph_jaccard").map(r =>
      (r.getAs[Long]("n"), r.getAs[Long]("m"), r.getAs[Long]("cn"), r.getAs[Long]("score_ppm")))
    assert(got.toSeq === want)
  }

  test("q_market_basket equals the naive lift top-20") {
    val d = Tables(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct
    val nOrders = d.map(_._1).distinct.length.toLong
    val c1 = d.groupBy(_._2).map { case (p, g) => p -> g.length.toLong }
    val c12 = d.groupBy(_._1).values.flatMap { g =>
      val ps = g.map(_._2).sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.groupBy(identity).map { case (k, g) => k -> g.size.toLong }
      .filter(_._2 >= 2)
    val want = c12.map { case ((p1, p2), c) =>
      (p1, p2, c, c * nOrders * 1000000L / (c1(p1) * c1(p2)))
    }.toSeq.sortBy { case (p1, p2, _, l) => (-l, p1, p2) }.take(20)
    val got = run("q_market_basket").map(r =>
      (r.getAs[Long]("p1"), r.getAs[Long]("p2"), r.getAs[Long]("c12"), r.getAs[Long]("lift_ppm")))
    assert(got.toSeq === want)
  }

  test("q_span_mask equals the naive hash-scheduled block masking") {
    val docs = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(' ').count(_.nonEmpty))
      .filter(_._2 > 0)
    val want = docs.map { case (id, tc) =>
      val nb = (tc + 2) / 3
      val masked = (0 until nb).map { i =>
        val bsz = if (i < nb - 1) 3 else tc - (nb - 1) * 3
        if (md5hash60(s"$id:$i") % 7 == 0) bsz else 0
      }.sum
      id -> (tc.toLong, masked.toLong)
    }.toMap
    val got = run("q_span_mask").map(r =>
      r.getAs[Long]("doc_id") -> ((r.getAs[Long]("n_tokens"), r.getAs[Long]("n_masked")))).toMap
    assert(got === want)
  }

  test("q_mixture_weights equals the naive integer-microunit funnel") {
    val toks = Tables(spark, dir, "documents")
      .select(col("source"), col("text")).collect()
      .map(r => r.getString(0) -> r.getString(1).split(' ').count(_.nonEmpty).toLong)
      .groupBy(_._1).map { case (s, g) => s -> g.map(_._2).sum }
    val w = toks.map { case (s, t) => s -> math.floor(math.sqrt(t.toDouble) * 1000000).toLong }
    val wtot = w.values.sum
    val got = run("q_mixture_weights")
    got.foreach { r =>
      val s = r.getAs[String]("source")
      assert(r.getAs[Long]("toks") === toks(s))
      assert(r.getAs[Double]("share") === pround(w(s).toDouble / wtot.toDouble, 6))
    }
    assert(got.length === toks.size)
  }

  test("q_nucleus_vocab equals the naive frequency-ordered prefix cut") {
    val counts = Tables(spark, dir, "documents")
      .select(col("text")).collect()
      .flatMap(_.getString(0).split(' ').filter(_.nonEmpty))
      .groupBy(identity).map { case (w, g) => w -> g.length.toLong }
    val ordered = counts.toSeq.sortBy { case (w, n) => (-n, w) }
    val cums = ordered.scanLeft(0L)(_ + _._2).tail
    val tot = cums.last
    val want = Seq(50, 90, 95).map { p =>
      val thr = (tot * p + 99) / 100
      val k = cums.indexWhere(_ >= thr) + 1
      (p, k.toLong, cums(k - 1))
    }
    val got = run("q_nucleus_vocab").map(r =>
      (r.getAs[Int]("p"), r.getAs[Long]("vocab_size"), r.getAs[Long]("tokens_covered")))
    assert(got.toSeq === want)
  }

  test("q_time_to_convert equals the naive first-view-to-purchase histogram") {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byUser = ev.groupBy(_._1)
    val want = byUser.values.flatMap { g =>
      val views = g.filter(_._2 == "view").map(_._3)
      if (views.isEmpty) None
      else {
        val v = views.min
        val ps = g.filter(e => e._2 == "purchase" && e._3 >= v).map(_._3)
        if (ps.isEmpty) None else Some((ps.min - v) / 86400000000L)
      }
    }.groupBy(identity).map { case (d, g) => d -> g.size.toLong }
    val got = run("q_time_to_convert").map(r =>
      r.getAs[Long]("latency_days") -> r.getAs[Long]("n_users")).toMap
    assert(got === want)
  }

  test("q_cold_start equals the naive no-view-before-first-purchase count") {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byUser = ev.groupBy(_._1)
    val purchasers = byUser.filter(_._2.exists(_._2 == "purchase"))
    val cold = purchasers.count { case (_, g) =>
      val fp = g.filter(_._2 == "purchase").map(_._3).min
      !g.exists(e => e._2 == "view" && e._3 <= fp)
    }
    val r = run("q_cold_start")(0)
    assert(r.getAs[Long]("n_purchasers") === purchasers.size.toLong)
    assert(r.getAs[Long]("n_cold") === cold.toLong)
  }

  test("q_chunk_dedup equals the naive 32-token cross-document span audit") {
    val docs = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(' ').filter(_.nonEmpty))
      .filter(_._2.nonEmpty)
    val chunks = docs.flatMap { case (id, ws) =>
      ws.grouped(32).map(g => id -> g.mkString(" "))
    }
    val crossDoc = chunks.groupBy(_._2)
      .filter { case (_, g) => g.map(_._1).distinct.length >= 2 }.keySet
    val want = chunks.groupBy(_._1).flatMap { case (id, g) =>
      val dup = g.count(c => crossDoc(c._2)).toLong
      if (dup > 0) Some(id -> ((g.length.toLong, dup))) else None
    }
    val got = run("q_chunk_dedup").map(r =>
      r.getAs[Long]("doc_id") -> ((r.getAs[Long]("n_chunks"), r.getAs[Long]("n_dup_chunks")))).toMap
    assert(got === want)
  }

  test("q_minhash_precision is monotone in the threshold and bounded by candidates") {
    val rows = run("q_minhash_precision").map(r =>
      r.getAs[Double]("thr") -> ((r.getAs[Long]("n_cand"), r.getAs[Long]("n_true")))).toMap
    assert(rows.keySet === Set(0.5, 0.7, 0.9))
    val (nc, t5) = rows(0.5); val (_, t7) = rows(0.7); val (_, t9) = rows(0.9)
    assert(t5 >= t7 && t7 >= t9, "precision counts must be monotone in the threshold")
    assert(t5 <= nc, "true pairs are a subset of candidates")
  }

  test("q_lang_mix entropy is bounded by log2(n_langs); doc counts conserve") {
    val rows = run("q_lang_mix")
    rows.foreach { r =>
      val h = r.getAs[Double]("lang_entropy")
      val maxH = math.log(r.getAs[Long]("n_langs").toDouble) / math.log(2.0)
      assert(h >= 0.0 && h <= maxH + 1e-9, s"entropy $h outside [0, $maxH]")
    }
    val total = rows.map(_.getAs[Long]("docs")).sum
    assert(total === Tables(spark, dir, "documents").count())
  }

  test("q_cluster_purity: sizes conserve, majority is a real majority") {
    val rows = run("q_cluster_purity")
    assert(rows.map(_.getAs[Long]("n")).sum ===
      Tables(spark, dir, "embeddings").count())
    rows.foreach { r =>
      val n = r.getAs[Long]("n"); val top = r.getAs[Long]("top_n")
      assert(top >= 1L && top <= n)
      assert(r.getAs[Double]("purity") === pround(top.toDouble / n.toDouble, 4))
    }
  }

  test("q_embed_quantize equals a naive per-dimension int8 replay") {
    val vecs = Tables(spark, dir, "embeddings")
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val dims = vecs.head.length
    val want = (1 to dims).map { d =>
      val xs = vecs.map(_(d - 1))
      val amax = xs.map(math.abs).max
      val e2 = xs.map { x =>
        if (amax == 0.0) 0L
        else {
          val scale = amax / 127.0
          val q = math.max(-127.0, math.min(127.0, math.floor(x / scale + 0.5)))
          val err = x - q * scale
          math.floor(err * err * 1e12).toLong
        }
      }.sum
      d -> ((xs.length.toLong, pround(amax, 6), e2))
    }.toMap
    val got = run("q_embed_quantize").map(r =>
      r.getAs[Int]("d") ->
        ((r.getAs[Long]("n"), r.getAs[Double]("amax"), r.getAs[Long]("sq_err_pico")))).toMap
    assert(got === want)
  }

  test("q_growth_wow conserves the event count and lags correctly") {
    val rows = run("q_growth_wow").sortBy(_.getAs[java.sql.Date]("week").getTime)
    assert(rows.map(_.getAs[Long]("n")).sum === Tables.events(spark, dir).count())
    rows.sliding(2).foreach {
      case Array(a, b) => assert(b.getAs[Long]("prev") === a.getAs[Long]("n"))
      case _           =>
    }
    assert(rows.head.isNullAt(rows.head.fieldIndex("prev")))
  }
}
