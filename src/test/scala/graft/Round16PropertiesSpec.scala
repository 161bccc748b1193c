package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-16 properties: the shuffle-byte measurement harness (VERDICT
  * r15 task 2) — the structural 100 TB claim behind q_jaccard_approx
  * pinned as a measured stage-metric assertion instead of SCALE.md
  * prose. This is also the harness that would have rejected both of the
  * r15 reverted designs (the wedge-sampling jaccard transplant and the
  * capped-LPA twin) before any bench window: both passed oracles while
  * still moving census-scale bytes.
  */
class Round16PropertiesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  test("q_jaccard_approx moves well under a quarter of q_graph_jaccard's " +
    "shuffle bytes (the twin's structural claim, measured)") {
    // The twin's 100 TB case: its one map-side-combined 16-min sketch
    // aggregation over NON-distinct contacts shuffles ~nodes × 17 longs,
    // while the census's global edge-distinct + wedge join moves the
    // full contact mass. Measured write-byte ratios (twin / census):
    // sf0.001 5.7 KB / 66.1 KB = 0.087; sf0.01 98 KB / 1.26 MB = 0.078;
    // sf0.1 1.39 MB / 34.2 MB = 0.041; sf1 146.7 MB / 903.6 MB = 0.162
    // (at sf1 the wide 17-column partial-agg rows meet more input
    // partitions per node, so the twin grows toward nodes × partitions
    // rows — still 6.2× under the census). The pin is < 1/4: every
    // measured scale clears it with ≥35% margin, and a regression to a
    // full-mass design (the reverted transplant) overshoots it by an
    // order of magnitude.
    val (rowsT, warmT) = tools.ShuffleMeter.measureQuery(spark, "q_jaccard_approx", dir)
    val (rowsC, warmC) = tools.ShuffleMeter.measureQuery(spark, "q_graph_jaccard", dir)
    // warm second passes: steady-state bytes, file/footer caches settled
    val (_, twin) = tools.ShuffleMeter.measureQuery(spark, "q_jaccard_approx", dir)
    val (_, census) = tools.ShuffleMeter.measureQuery(spark, "q_graph_jaccard", dir)
    assert(rowsT === 20L && rowsC === 20L, s"head sizes moved: $rowsT/$rowsC")
    assert(census.shuffleWriteBytes > 0,
      s"census measured zero shuffle — meter broken? $warmC")
    assert(twin.shuffleWriteBytes > 0,
      s"twin measured zero shuffle — meter broken? $warmT")
    assert(twin.shuffleWriteBytes < census.shuffleWriteBytes / 4,
      s"twin shuffle bytes ${twin.shuffleWriteBytes} not well under " +
        s"census ${census.shuffleWriteBytes} — the structural claim broke")
    // read side mirrors write side (no skipped-stage asymmetry at this
    // scale; skipped reuse would under-read, never over-read)
    assert(twin.shuffleReadBytes < census.shuffleReadBytes / 4)
  }

  test("ShuffleMeter settles to stable readings on a trivial shuffle " +
    "and reads zero for a shuffle-free scan") {
    import org.apache.spark.sql.functions._
    val (cnt, agg) = tools.ShuffleMeter.measure(spark) {
      Tables(spark, dir, "orders")
        .groupBy(col("o_orderpriority")).count().count()
    }
    assert(cnt === 5L)
    assert(agg.shuffleWriteBytes > 0 && agg.stagesCompleted >= 2)
    val (n, scan) = tools.ShuffleMeter.measure(spark) {
      Tables(spark, dir, "region").count()
    }
    assert(n === 5L)
    // a bare count is one partial-agg stage + final: its shuffle is a
    // handful of count rows, orders of magnitude under any data shuffle
    assert(scan.shuffleWriteBytes < 10000,
      s"scan-only count shuffled ${scan.shuffleWriteBytes} bytes")
  }
}
