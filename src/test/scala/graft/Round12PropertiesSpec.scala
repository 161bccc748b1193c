package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Naive in-memory replays for the round-12 operators, plus THE round-12
  * property: probing the PERSISTED ANN index serves exactly the answers a
  * from-scratch LSH recompute over the base corpus would — the guarantee
  * that lets a production pipeline build the index once at ingest and
  * answer every later probe batch without touching the raw base vectors.
  */
class Round12PropertiesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  private def run(name: String) = {
    val rows = Registry.byName(name).build(spark, dir).collect()
    Caches.releaseAll()
    rows
  }

  private def md5hex(s: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  private def hash60(s: String): Long =
    java.lang.Long.parseLong(md5hex(s).take(15), 16)

  private def rawCos(a: Array[Double], b: Array[Double]): Double = {
    var dp = 0d; var na = 0d; var nb = 0d; var i = 0
    while (i < a.length) { dp += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    dp / (math.sqrt(na) * math.sqrt(nb))
  }

  private def cos4(a: Array[Double], b: Array[Double]): Double =
    math.floor(rawCos(a, b) * 10000 + 0.5) / 10000

  private lazy val vecs: Seq[(Long, Array[Double])] =
    Tables(spark, dir, "embeddings").select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray)).toSeq

  test("q_ann_incremental: stored-index probes == from-scratch LSH recompute (naive replay)") {
    val base = vecs.filter(_._1 % 10 != 0)
    val probes = vecs.filter(_._1 % 10 == 0)
    val np = graft.operators.VectorQueries.planesFor(base.size.toLong)
    val dims = vecs.map(_._2.length).max
    val signs = graft.operators.VectorQueries.planeSigns(np, dims)
    def bucket(v: Array[Double]): String =
      signs.map { s =>
        var d = 0d; var i = 0
        while (i < v.length) { d += s(i) * v(i); i += 1 }
        if (d > 0) "1" else "0"
      }.mkString
    val baseBk = base.map { case (id, v) => (id, bucket(v), v) }
    def top3(cands: Seq[(Long, Double)]): Seq[(Int, Long, Double)] =
      cands.sortBy { case (m, c) => (-c, m) }.take(3)
        .zipWithIndex.map { case ((m, c), i) => (i + 1, m, c) }
    val exact: Map[Long, Set[Long]] = probes.filter(_._1 < 50).map { case (pid, pv) =>
      pid -> top3(base.map { case (m, v) => (m, cos4(pv, v)) }).map(_._2).toSet
    }.toMap
    val want = probes.flatMap { case (pid, pv) =>
      val bk = bucket(pv)
      val cands = baseBk.filter(_._2 == bk).map { case (m, _, v) => (m, cos4(pv, v)) }
      top3(cands).map { case (rn, m, c) =>
        val hit: Any =
          if (pid >= 50) null
          else if (exact(pid)(m)) 1 else 0
        (pid, rn, m, c, hit)
      }
    }.sortBy(t => (t._1, t._2))
    val got = run("q_ann_incremental").map(r => (r.getLong(0), r.getInt(1),
      r.getLong(2), r.getDouble(3),
      if (r.isNullAt(4)) null else r.getInt(4))).toSeq
    assert(got === want)
    // the recall audit is populated exactly on the bounded probe subset
    assert(got.filter(_._1 < 50).forall(_._5 != null))
    assert(got.filter(_._1 >= 50).forall(_._5 == null))
  }
}
