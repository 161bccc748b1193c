package graft

import graft.operators.KMeans
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class KMeansSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  test("training improves mean cosine to centroid; assignments deterministic") {
    val e = Tables(spark, dir, "embeddings").select(col("vec_id"), col("embedding"))
    val init = KMeans.train(spark, dir, k = 8, iters = 0)
    val trained = KMeans.train(spark, dir, k = 8, iters = 2)
    val q0 = KMeans.meanCosine(e, init)
    val q2 = KMeans.meanCosine(e, trained)
    assert(q2 > q0, s"training should improve fit: init=$q0 trained=$q2")
    // deterministic: same training twice yields identical assignments
    val a = KMeans.assign(e, trained).select("vec_id", "cluster")
      .collect().map(_.toSeq).toSeq
    val b = KMeans.assign(e, KMeans.train(spark, dir, k = 8, iters = 2))
      .select("vec_id", "cluster").collect().map(_.toSeq).toSeq
    assert(a === b)
    // every vector assigned exactly once
    assert(KMeans.assign(e, trained).count() === e.count())
  }
}
