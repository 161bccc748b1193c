package graft

import graft.functions.VectorOps
import graft.plans.GraftExtensions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The codegen'd native expressions must be bit-identical to the
  * interpreted HOF reference implementations.
  */
class VectorOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  test("native cosine_sim == HOF cosine, bit-identical") {
    val e = Tables(spark, dir, "embeddings")
    val probe = broadcast(e.filter(col("vec_id") === 0).select(col("embedding").as("p")))
    val both = e.crossJoin(probe)
      .select(
        VectorOps.cosine(col("embedding"), col("p")).as("native"),
        VectorOps.cosineHof(col("embedding"), col("p")).as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() === 0)
  }

  test("signedDot == HOF dot against literal array, bit-identical") {
    val signs = graft.operators.VectorQueries.planeSigns(1, 64).head.toArray
    val e = Tables(spark, dir, "embeddings")
    val both = e.select(
      VectorOps.signedDot(col("embedding"), signs).as("native"),
      VectorOps.dot(col("embedding"), array(signs.map(lit).toIndexedSeq: _*)).as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() === 0)
  }

  test("word_ngrams registered for SQL and matches the HOF chain") {
    GraftExtensions.register(spark)
    Tables(spark, dir, "documents").createOrReplaceTempView("docs_v")
    val native = spark.sql(
      "SELECT doc_id, word_ngrams(text, 3) AS sh FROM docs_v ORDER BY doc_id")
    val hof = Tables(spark, dir, "documents")
      .select(col("doc_id"),
        array_distinct(graft.functions.TextOps.shingles(
          graft.functions.TextOps.words(col("text")), 3)).as("sh"))
      .orderBy("doc_id")
    assert(native.collect().map(_.toSeq).toSeq === hof.collect().map(_.toSeq).toSeq)
  }

  test("cosine_sim registered for SQL") {
    GraftExtensions.register(spark)
    Tables(spark, dir, "embeddings").createOrReplaceTempView("emb_v")
    val r = spark.sql(
      """SELECT a.vec_id, cosine_sim(a.embedding, b.embedding) AS c
        |FROM emb_v a JOIN emb_v b ON b.vec_id = 0 WHERE a.vec_id < 5
        |ORDER BY a.vec_id""".stripMargin).collect()
    assert(r.length === 5)
    assert(math.abs(r.head.getDouble(1) - 1.0) < 1e-12) // self-similarity
  }

  test("LSH depth grows with corpus size: expected bucket load stays bounded") {
    import graft.operators.VectorQueries.planesFor
    // the formula's contract: smallest k >= 4 with expected load n/2^k <= 32
    for (n <- Seq(1L, 100L, 500L, 512L, 513L, 5000L, 50000L, 500000L, 5000000L)) {
      val k = planesFor(n)
      assert(k >= 4 && k <= 20)
      if (k < 20) assert(n <= (32L << k), s"n=$n k=$k load ${n / (1L << k)}")
      if (k > 4) assert(n > (32L << (k - 1)), s"n=$n k=$k not minimal")
      // 10x the corpus: depth adapts so the expected load stays <= 32
      val k10 = planesFor(10 * n)
      if (k10 < 20) assert(10 * n <= (32L << k10), s"10x n=$n k=$k10")
    }
    // the two driver scale factors land on different depths (the round-4
    // defect was exactly that these were equal by construction)
    assert(planesFor(500) === 4 && planesFor(5000) === 8)
  }

  test("semantic-dedup centroid count grows with n: expected cluster load stays bounded") {
    import graft.operators.VectorQueries.semanticK
    // contract: k >= 8, expected load n/k <= 128, and k is minimal for that
    for (n <- Seq(1L, 8L, 500L, 1024L, 1025L, 2000L, 50000L, 5000000L, 5000000000L)) {
      val k = semanticK(n)
      assert(k >= 8, s"n=$n k=$k floor")
      assert(n <= k.toLong * 128L, s"n=$n k=$k load ${n / k}")
      if (k > 8) assert(n > (k.toLong - 1) * 128L, s"n=$n k=$k not minimal")
      // 10x the corpus: k adapts so the expected load stays <= 128
      val k10 = semanticK(10 * n)
      assert(10 * n <= k10.toLong * 128L, s"10x n=$n k=$k10")
    }
    // the driver scale factors land on different k (the round-5 defect was
    // k pinned at 8 regardless of corpus size)
    assert(semanticK(500) === 8 && semanticK(2000) === 16 && semanticK(1000000) === 7813)
  }

  test("cosine_sim survives whole-stage codegen (plan contains it)") {
    val e = Tables(spark, dir, "embeddings")
    val probe = broadcast(e.filter(col("vec_id") === 0).select(col("embedding").as("p")))
    val df = e.crossJoin(probe)
      .select(VectorOps.cosine(col("embedding"), col("p")).as("c"))
    df.collect() // materialize the AQE final plan
    val plan = df.queryExecution.executedPlan.toString
    // "*(n)" prefixes mark WholeStageCodegen stages in the final-plan render
    assert(plan.matches("(?s).*\\*\\(\\d+\\) Project \\[cosine_sim.*"),
      s"cosine_sim not inside a codegen stage:\n$plan")
  }
}
