package graft

import graft.functions.{TextOps, VectorOps}
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property tests: the native Catalyst expressions must agree with the
  * composed higher-order-function references on adversarial inputs —
  * repeated/leading/trailing spaces, empty and sub-n documents, repeated
  * shingles, negative/small floats.
  */
class NativeExprPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("WordNGrams == array_distinct(shingles(words)) on random text") {
    import spark.implicits._
    val word = Gen.choose(1, 6).flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))
    val sep = Gen.oneOf(" ", "  ", "   ") // runs of spaces
    val doc = for {
      k <- Gen.choose(0, 12)
      ws <- Gen.listOfN(k, word)
      ss <- Gen.listOfN(k + 1, sep)
    } yield ss.zipAll(ws, " ", "").map { case (s, w) => s + w }.mkString
    val prop = Prop.forAll(Gen.listOfN(12, doc)) { docs =>
      val df = docs.toDF("text")
      val native = df.select(TextOps.distinctWordNGrams(col("text"), 3).as("sh"))
        .collect().map(_.getSeq[String](0).toList).toList
      val hof = df.select(array_distinct(
          TextOps.shingles(TextOps.words(col("text")), 3)).as("sh"))
        .collect().map(_.getSeq[String](0).toList).toList
      native == hof
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  test("CharPairs == substring-HOF adjacent pairs on random text") {
    import spark.implicits._
    // multibyte + surrogate-pair chars pin codepoint (not UTF-16) pairing
    val ch = Gen.frequency((6, Gen.alphaLowerChar.map(_.toString)),
      (2, Gen.const(" ")), (1, Gen.const("é")), (1, Gen.const("😀")))
    val doc = Gen.choose(0, 20).flatMap(n => Gen.listOfN(n, ch).map(_.mkString))
    val prop = Prop.forAll(Gen.listOfN(15, doc)) { docs =>
      val df = docs.toDF("text")
      val native = df.select(TextOps.charPairs(col("text")).as("p"))
        .collect().map(_.getSeq[String](0).toList).toList
      // guard <2-char docs: Spark's sequence(1, len-1) runs DESCENDING
      // there (DuckDB's generate_series is empty) — CharPairs implements
      // the oracle's empty-array semantics
      val hof = df.select(when(length(col("text")) >= 2,
          filter(
            expr("transform(sequence(1, length(text) - 1), i -> substring(text, i, 2))"),
            p => !p.contains(" ")))
          .otherwise(array().cast("array<string>")).as("p"))
        .collect().map(_.getSeq[String](0).toList).toList
      native == hof
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  test("TokenStats == HOF token/stopword/length stats on random text") {
    import spark.implicits._
    // include stopwords, multi-space runs, leading/trailing spaces, and
    // empty documents; also a non-BMP char to pin codepoint counting
    val word = Gen.frequency(
      (3, Gen.oneOf(TextOps.stopwords)),
      (1, Gen.const("theé")), // stopword prefix, not a stopword
      (1, Gen.const("a😀b")), // surrogate pair: 3 codepoints, 4 UTF-16 units
      (5, Gen.choose(1, 8).flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))))
    val sep = Gen.oneOf(" ", "  ", "   ")
    val doc = for {
      k <- Gen.choose(0, 15)
      ws <- Gen.listOfN(k, word)
      ss <- Gen.listOfN(k + 1, sep)
    } yield ss.zipAll(ws, " ", "").map { case (s, w) => s + w }.mkString
    val prop = Prop.forAll(Gen.listOfN(12, doc)) { docs =>
      val df = docs.toDF("text")
      val ws = TextOps.words(col("text"))
      // rule-proof token count: NativeTextRewrite (installed session-wide
      // by suites that call GraftExtensions.register) matches the
      // `w <> ''` lambda — this equivalent `length(w) > 0` shape stays a
      // genuine HOF, keeping the native-vs-HOF comparison non-vacuous
      val wsByLen = filter(split(col("text"), " "), w => length(w) > 0)
      val native = df.select(TextOps.tokenStats(col("text")).as("st"))
        .selectExpr("st.n_tokens", "st.stop_hits", "st.char_sum")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
      val hof = df.select(
          size(wsByLen).cast("long").as("n"),
          size(filter(ws, w => w.isInCollection(TextOps.stopwords))).cast("long").as("h"),
          aggregate(transform(ws, w => length(w).cast("long")),
            lit(0L), (acc, v) => acc + v).as("c"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
      native == hof
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  test("native cosine == HOF cosine on random dense vectors") {
    import spark.implicits._
    val vec = Gen.listOfN(16, Gen.chooseNum(-10.0f, 10.0f)).map(_.toArray)
    val prop = Prop.forAll(Gen.listOfN(8, Gen.zip(vec, vec))) { pairs =>
      val df = pairs.toDF("a", "b")
      df.select(
        VectorOps.cosine(col("a"), col("b")).as("n"),
        VectorOps.cosineHof(col("a"), col("b")).as("h"))
        .collect()
        .forall { r =>
          val (n, h) = (r.getDouble(0), r.getDouble(1))
          n == h || (n.isNaN && h.isNaN)
        }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  test("native cosine == HOF cosine on mixed float/double vector pairs") {
    import spark.implicits._
    val fvec = Gen.listOfN(16, Gen.chooseNum(-10.0f, 10.0f)).map(_.toArray)
    val dvec = Gen.listOfN(16, Gen.chooseNum(-10.0, 10.0)).map(_.toArray)
    val prop = Prop.forAll(Gen.listOfN(8, Gen.zip(fvec, dvec))) { pairs =>
      val df = pairs.toDF("a", "b") // a: array<float>, b: array<double>
      df.select(
        VectorOps.cosine(col("a"), col("b")).as("n"),
        VectorOps.cosineHof(col("a"), col("b")).as("h"),
        VectorOps.cosine(col("b"), col("b")).as("nd"),
        VectorOps.cosineHof(col("b"), col("b")).as("hd"))
        .collect()
        .forall { r =>
          (r.getDouble(0) == r.getDouble(1) ||
            (r.getDouble(0).isNaN && r.getDouble(1).isNaN)) &&
          (r.getDouble(2) == r.getDouble(3) ||
            (r.getDouble(2).isNaN && r.getDouble(3).isNaN))
        }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  test("signedDot == HOF dot on random vectors against every plane") {
    import spark.implicits._
    val signs = graft.operators.VectorQueries.planeSigns(4, 16)
    val vec = Gen.listOfN(16, Gen.chooseNum(-5.0f, 5.0f)).map(_.toArray)
    val prop = Prop.forAll(Gen.listOfN(10, vec)) { vs =>
      val df = vs.map(Tuple1(_)).toDF("a")
      signs.forall { s =>
        df.select(
          VectorOps.signedDot(col("a"), s.toArray).as("n"),
          VectorOps.dot(col("a"), array(s.map(lit): _*)).as("h"))
          .collect().forall(r => r.getDouble(0) == r.getDouble(1))
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }

  test("BloomProbe never false-negatives and agrees with the driver-side probe") {
    import spark.implicits._
    val keys = Gen.listOfN(200, Gen.chooseNum(Long.MinValue, Long.MaxValue))
    val prop = Prop.forAll(keys, keys) { (inserted, probes) =>
      val bf = org.apache.spark.util.sketch.BloomFilter.create(1000, 0.01)
      inserted.foreach(bf.putLong)
      val got = (inserted ++ probes).toDF("k")
        .select(col("k"), graft.functions.Probes.bloomProbe(col("k"), bf).as("hit"))
        .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      // no false negatives on inserted keys; exact agreement with the
      // driver-side probe everywhere (same object, same hash path)
      inserted.forall(got(_)) &&
        (inserted ++ probes).forall(k => got(k) == bf.mightContainLong(k))
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }
}
