package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Naive in-memory replays for the round-9 operators (the
  * Round7/Round8PropertiesSpec discipline): the oracle hash certifies the
  * two engines agree; these certify the statistic IS the statistic by
  * recomputing it with the dumbest possible Scala on sf0.001 and
  * demanding EXACT agreement.
  */
class Round9PropertiesSpec extends AnyFunSuite {
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

  private def md5hex(s: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  private lazy val docs: Seq[(Long, String)] =
    Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq

  private def tokens(text: String): Seq[String] =
    text.split(" ", -1).filter(_.nonEmpty).toSeq

  /** Same naive LSH candidate generator as Round8PropertiesSpec — the
    * scrub query must act on exactly the detector's pair space.
    */
  private lazy val naiveCandidates: Set[(Long, Long)] = {
    val sigs = docs.flatMap { case (id, text) =>
      val sh = tokens(text).sliding(3).filter(_.size == 3).map(_.mkString(" ")).toSet
      if (sh.isEmpty) None
      else {
        val xs = sh.map(md5hash60)
        Some(id -> operators.DedupQueries.minhashSeeds.map(k => xs.map(_ ^ k).min))
      }
    }
    val buckets = for {
      (id, mh) <- sigs
      b <- 0 until 4
    } yield (b, mh.slice(b * 4, b * 4 + 4).mkString(",")) -> id
    buckets.groupBy(_._1).values.flatMap { g =>
      val ids = g.map(_._2).sorted
      for (a <- ids; b <- ids if a < b) yield (a, b)
    }.toSet
  }

  /** Union of removed token positions per doc, replaying the detector's
    * diagonal run-merge and the keep-first (remove-from-doc_b) policy.
    */
  private lazy val naiveRemoved: Map[Long, Set[Int]] = {
    val pos = docs.map { case (id, text) =>
      id -> tokens(text).sliding(3).filter(_.size == 3).map(_.mkString(" "))
        .zipWithIndex.map { case (sh, i) => (i, sh) }.toSeq
    }.toMap
    val perPair = naiveCandidates.toSeq.flatMap { case (a, b) =>
      val byShB = pos(b).groupBy(_._2)
      val matches = pos(a).flatMap { case (i, sh) =>
        byShB.getOrElse(sh, Nil).map { case (j, _) => (i, j) }
      }
      matches.groupBy { case (i, j) => i - j }.toSeq.flatMap { case (d, ms) =>
        val is = ms.map(_._1).sorted
        val runs = is.foldLeft(List.empty[List[Int]]) {
          case ((run :: rest), i) if run.headOption.contains(i - 1) =>
            (i :: run) :: rest
          case (acc, i) => List(i) :: acc
        }
        runs.map(r => (r.min, r.size + 2)).filter(_._2 >= 5).map {
          case (i0, span) =>
            val j0 = i0 - d
            b -> (j0 until j0 + span).toSet
        }
      }
    }
    perPair.groupBy(_._1).map { case (id, g) =>
      id -> g.map(_._2).reduce(_ ++ _)
    }
  }

  test("q_span_scrub equals the naive span splice over LSH candidates") {
    val want = naiveRemoved.toSeq.map { case (id, rem) =>
      val ws = tokens(docs.find(_._1 == id).get._2)
      val kept = ws.zipWithIndex.collect { case (w, i) if !rem(i) => w }
      val scrub = kept.mkString(" ")
      (id, ws.size.toLong, rem.size.toLong,
        (ws.mkString(" ").length - scrub.length).toLong, md5hex(scrub))
    }.sortBy(_._1)
    val got = run("q_span_scrub").map(r => (r.getAs[Long]("doc_id"),
      r.getAs[Long]("n_tokens"), r.getAs[Long]("n_removed"),
      r.getAs[Long]("chars_removed"), r.getAs[String]("scrub_fp")))
    assert(got.toSeq === want)
  }

  test("q_span_scrub removes every span q_span_dedup detects, from the higher-id doc") {
    val scrubbed = run("q_span_scrub").map(_.getAs[Long]("doc_id")).toSet
    val detectedB = run("q_span_dedup").map(_.getAs[Long]("doc_b")).toSet
    assert(scrubbed === detectedB,
      "the scrubbed-doc set must be exactly the detector's doc_b set")
  }

  test("q_knn_pq equals the naive int8 asymmetric-distance funnel") {
    val vecs = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toSeq.sortBy(_._1)
    val dim = vecs.head._2.length
    val amax = (0 until dim).map(d => vecs.map(v => math.abs(v._2(d))).max)
    def quant(x: Double, a: Double): Double =
      if (a == 0d) 0d else math.max(-127d, math.min(127d, math.floor(x / (a / 127d) + 0.5d)))
    val probe = vecs.find(_._1 == 0L).get._2
    val approx = vecs.filter(_._1 != 0L).map { case (id, v) =>
      id -> (0 until dim).map { d =>
        if (amax(d) == 0d) 0L
        else math.floor(probe(d) * quant(v(d), amax(d)) * (amax(d) / 127d) * 1e6d).toLong
      }.sum
    }
    val short50 = approx.sortBy { case (id, s) => (-s, id) }.take(50).map(_._1).toSet
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dp = a.zip(b).map { case (x, y) => x * y }.sum
      val na = math.sqrt(a.map(x => x * x).sum)
      val nb = math.sqrt(b.map(x => x * x).sum)
      math.floor(dp / (na * nb) * 10000 + 0.5) / 10000
    }
    val rerank10 = vecs.filter(v => short50(v._1))
      .map { case (id, v) => (id, cos(v, probe)) }
      .sortBy { case (id, c) => (-c, id) }.take(10).map(_._1).toSet
    val brute10 = vecs.filter(_._1 != 0L)
      .map { case (id, v) => (id, cos(v, probe)) }
      .sortBy { case (id, c) => (-c, id) }.take(10).map(_._1).toSet
    val hits = brute10.count(rerank10)
    val row = run("q_knn_pq").head
    assert(row.getAs[Int]("k") === brute10.size)
    assert(row.getAs[Int]("hits") === hits)
  }

  test("q_minhash_est_error equals the naive estimator-vs-exact calibration") {
    val shingleSets: Map[Long, Set[String]] = docs.map { case (id, text) =>
      id -> tokens(text).sliding(3).filter(_.size == 3).map(_.mkString(" ")).toSet
    }.toMap
    val sigs: Map[Long, Seq[Long]] = shingleSets.collect {
      case (id, sh) if sh.nonEmpty =>
        val xs = sh.map(md5hash60)
        id -> operators.DedupQueries.minhashSeeds.map(k => xs.map(_ ^ k).min)
    }
    val rows = naiveCandidates.toSeq.map { case (a, b) =>
      val sa = shingleSets(a); val sb = shingleSets(b)
      val inter = (sa & sb).size
      val j = inter.toDouble / (sa.size + sb.size - inter)
      val m = math.floor(j * 10000 + 0.5).toLong
      val cnt = sigs(a).zip(sigs(b)).count { case (x, y) => x == y }.toLong
      (math.min(9L, m / 1000L).toInt, cnt, math.abs(cnt * 10000L - 16L * m))
    }
    val want = rows.groupBy(_._1).toSeq.map { case (bucket, g) =>
      val n = g.size.toLong
      (bucket, n,
        pround(g.map(_._2).sum.toDouble / (n * 16).toDouble, 4),
        pround(g.map(_._3).sum.toDouble / (n * 160000L).toDouble, 4))
    }.sortBy(_._1)
    val got = run("q_minhash_est_error").map(r => (r.getAs[Int]("bucket"),
      r.getAs[Long]("n_pairs"), r.getAs[Double]("mean_est"),
      r.getAs[Double]("mean_abs_err")))
    assert(got.toSeq === want)
  }

  private lazy val vecs: Seq[(Long, Array[Double])] =
    Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toSeq.sortBy(_._1)

  private def rawCos(a: Array[Double], b: Array[Double]): Double = {
    var dp = 0d; var na = 0d; var nb = 0d; var i = 0
    while (i < a.length) { dp += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    dp / (math.sqrt(na) * math.sqrt(nb))
  }

  private def cos4(a: Array[Double], b: Array[Double]): Double =
    math.floor(rawCos(a, b) * 10000 + 0.5) / 10000

  test("q_ivf_recall_sweep equals the naive nprobe sweep and is monotone") {
    val cents = vecs.filter(_._1 < 10)
    val assign = vecs.map { case (id, v) =>
      id -> cents.map { case (cid, c) => (cid, rawCos(v, c)) }
        .sortBy { case (cid, cc) => (-cc, cid) }.head._1
    }.toMap
    val probe = vecs.find(_._1 == 0L).get._2
    val prank = cents.map { case (cid, c) => (cid, rawCos(c, probe)) }
      .sortBy { case (cid, cc) => (-cc, cid) }.map(_._1).zipWithIndex
      .map { case (cid, i) => cid -> (i + 1) }.toMap
    val cand = vecs.filter(v => v._1 != 0L && prank(assign(v._1)) <= 4)
      .map { case (id, v) => (id, prank(assign(id)), cos4(v, probe)) }
    val brute10 = vecs.filter(_._1 != 0L)
      .map { case (id, v) => (id, cos4(v, probe)) }
      .sortBy { case (id, c) => (-c, id) }.take(10).map(_._1).toSet
    val want = Seq(1, 2, 4).map { k =>
      val sub = cand.filter(_._2 <= k)
      val top = sub.sortBy { case (id, _, c) => (-c, id) }.take(10).map(_._1)
      (k, sub.size.toLong, top.count(brute10).toLong,
        pround(top.count(brute10).toDouble / brute10.size, 4))
    }
    val got = run("q_ivf_recall_sweep").map(r => (r.getAs[Int]("nprobe"),
      r.getAs[Long]("n_cand"), r.getAs[Long]("hits"), r.getAs[Double]("recall")))
    assert(got.toSeq === want)
    // the sweep is monotone: more probed clusters never lose recall
    assert(got.map(_._4).toSeq === got.map(_._4).toSeq.sorted)
    assert(got.map(_._2).toSeq === got.map(_._2).toSeq.sorted)
  }

  test("q_silhouette equals the naive centroid-based silhouette") {
    val cents = vecs.filter(_._1 < 10)
    val rows = vecs.map { case (id, v) =>
      val scored = cents.map { case (cid, c) => (cid, rawCos(v, c)) }
        .sortBy { case (cid, cc) => (-cc, cid) }
      val (cl, aCos) = scored.head
      val bCos = scored(1)._2
      val su = if (1d - bCos == 0d) 0L
               else math.floor((aCos - bCos) / (1d - bCos) * 1e6d).toLong
      (cl, su)
    }
    val want = rows.groupBy(_._1).toSeq.map { case (cl, g) =>
      (cl, g.size.toLong, pround(g.map(_._2).sum.toDouble / (g.size * 1000000L), 4))
    }.sortBy(_._1)
    val got = run("q_silhouette").map(r => (r.getAs[Long]("cluster"),
      r.getAs[Long]("n_members"), r.getAs[Double]("mean_sil")))
    assert(got.toSeq === want)
  }

  test("q_lsh_band_sweep equals the naive (b,r) sweep and the configs nest") {
    val window = docs.filter(_._1 < 500)
    val sigs: Map[Long, Seq[Long]] = window.flatMap { case (id, text) =>
      val sh = tokens(text).sliding(3).filter(_.size == 3).map(_.mkString(" ")).toSet
      if (sh.isEmpty) None
      else {
        val xs = sh.map(md5hash60)
        Some(id -> operators.DedupQueries.minhashSeeds.map(k => xs.map(_ ^ k).min))
      }
    }.toMap
    def candsFor(b: Int, r: Int): Set[(Long, Long)] = {
      val buckets = for {
        (id, mh) <- sigs.toSeq
        band <- 0 until b
      } yield (band, mh.slice(band * r, band * r + r).mkString(",")) -> id
      buckets.groupBy(_._1).values.flatMap { g =>
        val ids = g.map(_._2).sorted
        for (a <- ids; bb <- ids if a < bb) yield (a, bb)
      }.toSet
    }
    val c28 = candsFor(2, 8); val c44 = candsFor(4, 4); val c82 = candsFor(8, 2)
    assert(c28.subsetOf(c44) && c44.subsetOf(c82),
      "band-agreement candidate sets must nest strict within loose")
    val shingleSets = window.map { case (id, text) =>
      id -> tokens(text).sliding(3).filter(_.size == 3).map(_.mkString(" ")).toSet
    }.toMap
    def bucketOf(a: Long, b: Long): Int = {
      val sa = shingleSets(a); val sb = shingleSets(b)
      val inter = (sa & sb).size
      val m = math.floor(inter.toDouble / (sa.size + sb.size - inter) * 10000 + 0.5).toLong
      math.min(9L, m / 1000L).toInt
    }
    val jac = c82.toSeq.map { case (a, b) => ((a, b), bucketOf(a, b)) }.toMap
    val tot = jac.values.groupBy(identity).map { case (bk, g) => bk -> g.size.toLong }
    val want = Seq((2, 8, c28), (4, 4, c44), (8, 2, c82)).flatMap { case (b, r, cs) =>
      cs.toSeq.map(jac).groupBy(identity).toSeq.map { case (bk, g) =>
        (b, r, bk, g.size.toLong, tot(bk),
          pround(g.size.toDouble / tot(bk), 4))
      }
    }.sortBy(t => (t._1, t._3))
    val got = run("q_lsh_band_sweep").map(r => (r.getAs[Int]("b"),
      r.getAs[Int]("r"), r.getAs[Int]("bucket"), r.getAs[Long]("n_cand"),
      r.getAs[Long]("n_union"), r.getAs[Double]("share")))
    assert(got.toSeq === want)
  }

  test("q_local_clustering equals the naive per-node coefficient histogram") {
    val op = Tables(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val edges: Set[(Long, Long)] = op.groupBy(_._1).values.flatMap { g =>
      val ps = g.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- (i + 1) until ps.size) yield (ps(i), ps(j))
    }.toSet
    val nbrs = scala.collection.mutable.Map[Long, Set[Long]]().withDefaultValue(Set())
    edges.foreach { case (u, v) => nbrs(u) += v; nbrs(v) += u }
    val cus = nbrs.toSeq.collect { case (v, ns) if ns.size >= 2 =>
      val sorted = ns.toSeq.sorted
      var t = 0L
      for (i <- sorted.indices; j <- (i + 1) until sorted.size)
        if (edges((sorted(i), sorted(j)))) t += 1
      val d = ns.size.toLong
      (2L * t * 1000000L) / (d * (d - 1L))
    }
    val want = cus.groupBy(cu => math.min(9L, cu / 100000L).toInt).toSeq
      .map { case (bk, g) =>
        (bk, g.size.toLong, pround(g.sum.toDouble / (g.size * 1000000L), 4))
      }.sortBy(_._1)
    val got = run("q_local_clustering").map(r => (r.getAs[Int]("bucket"),
      r.getAs[Long]("n_nodes"), r.getAs[Double]("mean_c")))
    assert(got.toSeq === want)
  }

  test("q_ngram_novelty equals the naive first-use census") {
    val allDocs = Tables(spark, dir, "documents")
      .select(col("doc_id")).collect().map(_.getLong(0))
    val mx = allDocs.max
    val shingleSets = docs.map { case (id, text) =>
      id -> tokens(text).sliding(3).filter(_.size == 3).map(_.mkString(" ")).toSet
    }.filter(_._2.nonEmpty)
    val firstUse = shingleSets.flatMap { case (id, sh) => sh.map(_ -> id) }
      .groupBy(_._1).map { case (sh, g) => sh -> g.map(_._2).min }
    val perDoc = shingleSets.map { case (id, sh) =>
      val novel = sh.count(s => firstUse(s) == id)
      (id, (novel.toLong * 1000000L) / sh.size)
    }
    val want = perDoc.groupBy { case (id, _) =>
      math.min(9L, id * 10 / (mx + 1)).toInt
    }.toSeq.map { case (d, g) =>
      (d, g.size.toLong, pround(g.map(_._2).sum.toDouble / (g.size * 1000000L), 4))
    }.sortBy(_._1)
    val got = run("q_ngram_novelty").map(r => (r.getAs[Int]("decile"),
      r.getAs[Long]("n_docs"), r.getAs[Double]("mean_novelty")))
    assert(got.toSeq === want)
  }

  test("q_hard_negatives equals the naive rank-11..30 band per probe") {
    val want = (0L until 5L).flatMap { p =>
      val probe = vecs.find(_._1 == p).get._2
      vecs.filter(_._1 != p)
        .map { case (id, v) => (id, cos4(v, probe)) }
        .sortBy { case (id, c) => (-c, id) }
        .zipWithIndex.map { case ((id, c), i) => (p, i + 1, id, c) }
        .filter { case (_, rank, _, _) => rank > 10 && rank <= 30 }
    }
    val got = run("q_hard_negatives").map(r => (r.getAs[Long]("probe_id"),
      r.getAs[Int]("rank"), r.getAs[Long]("vec_id"), r.getAs[Double]("cos")))
    assert(got.toSeq === want)
  }

  test("q_fk_orphans equals the naive key-set audit (and is all-zero on this fixture)") {
    def keys(t: String, c: String): Set[Long] =
      Tables(spark, dir, t).select(col(c)).collect().map(_.getLong(0)).toSet
    def fks(t: String, c: String): Seq[Long] =
      Tables(spark, dir, t).select(col(c)).collect().map(_.getLong(0)).toSeq
    val edges = Seq(
      ("orders->customer", fks("orders", "o_custkey"), keys("customer", "c_custkey")),
      ("lineitem->orders", fks("lineitem", "l_orderkey"), keys("orders", "o_orderkey")),
      ("lineitem->part", fks("lineitem", "l_partkey"), keys("part", "p_partkey")),
      ("lineitem->supplier", fks("lineitem", "l_suppkey"), keys("supplier", "s_suppkey")))
    val want = edges.map { case (name, fk, pk) =>
      val orph = fk.count(k => !pk(k)).toLong
      (name, fk.size.toLong, orph, pround(orph.toDouble / fk.size, 4))
    }.sortBy(_._1)
    val got = run("q_fk_orphans").map(r => (r.getAs[String]("fk_edge"),
      r.getAs[Long]("n_rows"), r.getAs[Long]("n_orphans"),
      r.getAs[Double]("orphan_rate")))
    assert(got.toSeq === want)
    assert(got.forall(_._3 == 0L), "the driver fixture must be referentially intact")
  }

  test("q_boilerplate_prefix equals the naive prefix census") {
    val pres = docs.map { case (_, text) => tokens(text) }
      .filter(_.size >= 8).map(_.take(8).mkString(" "))
    val total = pres.size.toLong
    val want = pres.groupBy(identity).toSeq
      .map { case (p, g) => (p, g.size.toLong) }
      .sortBy { case (p, n) => (-n, p) }.take(10)
      .map { case (p, n) => (p, n, total, pround(n.toDouble / total, 4)) }
    val got = run("q_boilerplate_prefix").map(r => (r.getAs[String]("prefix"),
      r.getAs[Long]("n_docs"), r.getAs[Long]("n_total"), r.getAs[Double]("share")))
    assert(got.toSeq === want)
  }

  test("q_bootstrap_ci equals the naive Poisson-bootstrap replay and brackets the mean") {
    val orders = Tables(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_totalprice")).collect()
      .map(r => (r.getLong(0), math.floor(r.getDouble(1) * 100 + 0.5).toLong))
    def w(b: Long, k: Long): Long = {
      val g = b / 8; val c = (b % 8).toInt
      val hx = md5hex(s"bs$g-$k")
      val u = java.lang.Long.parseLong(hx.substring(c * 4, c * 4 + 4), 16)
      if (u < 24111L) 0L else if (u < 48223L) 1L
      else if (u < 60281L) 2L else if (u < 64299L) 3L else 4L
    }
    val means = (0L until 100L).map { b =>
      val (swx, sw) = orders.foldLeft((0L, 0L)) { case ((x, s), (k, c)) =>
        val wi = w(b, k); (x + wi * c, s + wi)
      }
      (b, swx.toDouble / sw.toDouble)
    }.sortBy { case (b, m) => (m, b) }
    val lo = pround(means(2)._2 / 100d, 4)
    val hi = pround(means(97)._2 / 100d, 4)
    val mean = pround(orders.map(_._2).sum.toDouble / orders.size / 100d, 4)
    val row = run("q_bootstrap_ci").head
    assert(row.getAs[Double]("mean") === mean)
    assert(row.getAs[Double]("ci_lo") === lo)
    assert(row.getAs[Double]("ci_hi") === hi)
    assert(lo <= mean && mean <= hi, "the 95% CI must bracket the point estimate")
  }

  test("q_sql_native_funcs equals the naive token-count/cosine head") {
    val probe = vecs.find(_._1 == 0L).get._2
    val byId = vecs.toMap
    val want = docs.collect { case (id, text) if byId.contains(id) =>
      (id, tokens(text).size.toLong, cos4(byId(id), probe))
    }.sortBy { case (id, n, _) => (-n, id) }.take(10)
    val got = run("q_sql_native_funcs").map(r => (r.getAs[Long]("doc_id"),
      r.getAs[Long]("n_tokens"), r.getAs[Double]("cos_probe")))
    assert(got.toSeq === want)
  }

  test("q_span_scrub never removes more tokens than the document has") {
    run("q_span_scrub").foreach { r =>
      assert(r.getAs[Long]("n_removed") <= r.getAs[Long]("n_tokens"))
      assert(r.getAs[Long]("n_removed") >= 5L,
        "a scrubbed doc carries at least one >= 5-token span")
    }
  }
}
