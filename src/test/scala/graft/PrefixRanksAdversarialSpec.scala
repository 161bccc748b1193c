package graft

import graft.functions.{Prefix, Ranks}
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Adversarial-partitioning sweep for the two distributed rank-statistics
  * primitives ([[graft.functions.Prefix]] and [[graft.functions.Ranks]]).
  * They are load-bearing for the whole rank family (Spearman,
  * Mann-Whitney, KS, percentile/decile/IQR/MAD/winsorize, seq packing),
  * and their contract — bit-identical to a single-task global window at
  * ANY partition count — is exactly what a fixed-partition test can miss:
  * the range partitioner may split a duplicate-heavy key run across
  * partitions, a partition may be empty, or all data may land in one.
  * The sweep drives shuffle-partition counts 1 (degenerate single task),
  * 3, 7 (more partitions than distinct keys on small draws) and 32
  * (many empty partitions) over duplicate-heavy random multisets, and
  * checks against the driver-side reference computed from the sorted
  * multiset.
  */
class PrefixRanksAdversarialSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // duplicate-heavy: keys drawn from a tiny domain so long equal runs
  // straddle range-partition boundaries; weights include zeros
  private val draw = for {
    n  <- Gen.choose(0, 200)
    ks <- Gen.listOfN(n, Gen.choose(0L, 6L))
    ws <- Gen.listOfN(n, Gen.choose(0L, 5L))
  } yield ks.zip(ws)

  private def withParts[A](p: Int)(body: => A): A = {
    val old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", p.toString)
    try body finally spark.conf.set("spark.sql.shuffle.partitions", old)
  }

  test("Prefix.withRunningTotals == sorted driver-side scan at 1/3/7/32 partitions") {
    import spark.implicits._
    val prop = Prop.forAll(draw) { rows =>
      // tag each row with a unique id so (key, id) is a total order and
      // the expected prefix sum is unambiguous even with duplicate keys
      val tagged = rows.zipWithIndex.map { case ((k, w), i) => (k, w, i.toLong) }
      val expected = tagged.sortBy(t => (t._1, t._3))
        .scanLeft(0L)((acc, t) => acc + t._2).tail
      Seq(1, 3, 7, 32).forall { p =>
        withParts(p) {
          val df = tagged.toDF("k", "w", "id").repartition(4) // scrambled input layout
          val got = Prefix.withRunningTotals(df, Seq(col("k"), col("id")), Seq("w"))
            .orderBy(col("k"), col("id"))
            .select(col("w_cum")).collect().map(_.getLong(0)).toList
          Caches.releaseAll()
          got == expected
        }
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, res.status.toString)
  }

  test("Ranks.withGlobalRowNumber is the 1..n enumeration of the total order at 1/3/7/32 partitions") {
    import spark.implicits._
    val prop = Prop.forAll(draw) { rows =>
      val tagged = rows.zipWithIndex.map { case ((k, _), i) => (k, i.toLong) }
      val expectedOrder = tagged.sortBy(identity).map(_._2)
      Seq(1, 3, 7, 32).forall { p =>
        withParts(p) {
          val df = tagged.toDF("k", "id").repartition(4)
          val (numbered, total) =
            Ranks.withGlobalRowNumber(df, Seq(col("k"), col("id")), "rn")
          val got = numbered.orderBy(col("rn"))
            .select(col("id"), col("rn")).collect()
          Caches.releaseAll()
          total == rows.length.toLong &&
            got.map(_.getLong(0)).toList == expectedOrder &&
            got.map(_.getLong(1)).toList == (1L to rows.length).toList
        }
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, res.status.toString)
  }

  test("Ranks.exactPercentiles == driver-side interpolation on skewed groups at 1/3/7/32 partitions") {
    import spark.implicits._
    // groups of wildly different sizes (1, a few, hundreds) with heavy ties
    val groups = for {
      nBig <- Gen.choose(50, 300)
      big  <- Gen.listOfN(nBig, Gen.choose(0L, 9L))
      mid  <- Gen.listOfN(7, Gen.choose(0L, 9L))
      one  <- Gen.choose(0L, 9L)
    } yield Seq("big" -> big, "mid" -> mid, "one" -> Seq(one))
    val ps = Seq(0.0, 0.25, 0.5, 0.9, 1.0)
    def ref(vs: Seq[Long], p: Double): Double = {
      val s = vs.sorted.map(_.toDouble)
      val k = (s.length - 1) * p
      val lo = s(k.toInt); val hi = s(math.min(k.toInt + 1, s.length - 1))
      lo + (k - k.toInt) * (hi - lo)
    }
    val prop = Prop.forAll(groups) { gs =>
      val rows = gs.flatMap { case (g, vs) => vs.map(v => (g, v)) }
      val expected = (for { (g, vs) <- gs; p <- ps } yield (g, p) -> ref(vs, p)).toMap
      Seq(1, 3, 7, 32).forall { p =>
        withParts(p) {
          val df = rows.toDF("g", "v").repartition(4)
            .select(col("g"), col("v").cast("double").as("v"))
          val got = Ranks.exactPercentiles(df, "g", "v", ps)
            .collect()
            .map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
          Caches.releaseAll()
          got.keySet == expected.keySet &&
            expected.forall { case (k, v) => math.abs(got(k) - v) < 1e-9 }
        }
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }
}
