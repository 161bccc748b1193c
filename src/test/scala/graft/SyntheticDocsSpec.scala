package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The DataSourceV2 synthetic-docs connector: deterministic content,
  * partition layout, and column pruning.
  */
class SyntheticDocsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def read(rows: Long = 1000, parts: Int = 4, seed: Long = 42) =
    spark.read.format("graft.sources.SyntheticDocs")
      .option("rows", rows).option("partitions", parts).option("seed", seed)
      .load()

  test("row count, partition layout, and schema") {
    val df = read(rows = 1000, parts = 7)
    assert(df.count() === 1000L)
    assert(df.rdd.getNumPartitions === 7)
    assert(df.schema.fieldNames.toSeq === Seq("doc_id", "text"))
  }

  test("content is deterministic across reads and independent of partitioning") {
    val a = read(parts = 3).orderBy("doc_id").collect().map(_.toSeq)
    val b = read(parts = 8).orderBy("doc_id").collect().map(_.toSeq)
    assert(a.toSeq === b.toSeq)
    // different seed => different corpus
    val c = read(parts = 3, seed = 7).orderBy("doc_id").collect().map(_.toSeq)
    assert(a.toSeq !== c.toSeq)
  }

  test("column pruning reaches the scan") {
    val pruned = read().select("doc_id")
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("cols=doc_id"), scan)
    assert(pruned.agg(sum("doc_id")).collect()(0).getLong(0) === 999L * 1000 / 2)
  }

  test("the flagship query runs unchanged on the connector") {
    val counts = read(rows = 200)
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").count()
    assert(counts.agg(sum("count")).collect()(0).getLong(0) > 0)
  }
}
