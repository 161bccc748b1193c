package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-14 store-lifecycle properties: time-based vintage retention on
  * the sketch stores (VERDICT r13 task 2) and deletion on the vector
  * indexes (task 3) — each verb re-runnable, each proven on the store
  * files themselves, not just the query output.
  */
class Round14PropertiesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  private def outOf(name: String): Seq[String] = {
    val rows = Registry.byName(name).build(spark, dir).collect()
      .map(_.toString).toSeq
    Caches.releaseAll()
    rows
  }

  test("q_sketch_expire: post-drop store fold equals the recompute " +
    "without the expired day, for all four merge folds") {
    val rows = Registry.byName("q_sketch_expire").build(spark, dir).collect()
    Caches.releaseAll()
    assert(rows.length === 4)
    rows.foreach { r =>
      assert(r.getAs[Long]("post_drop") === r.getAs[Long]("recomputed"),
        s"store ${r.getAs[String]("store")}: fold over remaining vintages " +
          "diverged from the rebuild-without-that-day")
    }
  }

  test("q_sketch_expire: the expired vintage is gone from catalog AND " +
    "disk, and the retention verb is idempotent (drop-twice = drop-once)") {
    val out1 = outOf("q_sketch_expire") // builds + expires via StoreOnce
    val tabs = operators.SketchQueries.expireStoreTables(spark, dir)
    tabs.foreach { case (family, (t, path)) =>
      assert(spark.table(t).filter(col("vintage") === "base").count() === 0L,
        s"$family: expired vintage still served from the store")
      assert(spark.table(t).count() > 0L, s"$family: retained vintage lost")
      assert(!new java.io.File(s"$path/vintage=base").exists(),
        s"$family: expired vintage's files not reclaimed")
      assert(new java.io.File(s"$path/vintage=delta1").exists(),
        s"$family: retained vintage's files missing")
    }
    val snaps1 = tabs.map { case (f, (t, _)) =>
      f -> spark.table(t).collect().map(_.toString).sorted.toSeq }
    // the retention job re-runs (crash after the catalog drop, retry, a
    // second nightly pass — all must be no-ops)
    operators.SketchQueries.sketchExpireDrop(spark, dir)
    tabs.foreach { case (f, (t, _)) =>
      assert(spark.table(t).collect().map(_.toString).sorted.toSeq === snaps1(f),
        s"$f: re-running the expire changed the store")
    }
    assert(outOf("q_sketch_expire") === out1,
      "query output changed after the expire re-run")
  }
}
