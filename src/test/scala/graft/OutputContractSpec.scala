package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, StructType}
import org.scalatest.funsuite.AnyFunSuite

/** Output contract (round 12, VERDICT r11 task 2): the driver's hash
  * comparison coerces decimal cells through float64 on one side, so a
  * decimal output cell whose magnitude exceeds 2⁵³ (the float64-exact
  * integer window) hash-diverges even when the Spark and DuckDB values
  * are EXACTLY equal — the root cause of the only two r11 reds
  * (q_tpch_q1, q_weighted_sample). int64 survives the driver's pipeline
  * at any magnitude (q_bottomk_sample's kth_hash ≈ 8.2·10¹⁷ passes), so
  * the contract is: any decimal output column must keep every cell's
  * magnitude ≤ 2⁵³ at sf0.01 with ≥100× headroom implied by the query's
  * own scale notes, or be re-encoded as exact int64 div/mod splits.
  *
  * Enforcement is two-layered: this spec sweeps every registered query
  * (schema inspection is free; only queries that actually emit decimal
  * columns execute), and tools/check.py hard-fails any decimal cell
  * above 2⁵³ so the local oracle gate sees what the driver sees.
  */
class OutputContractSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sf001

  private val F64Exact = BigDecimal(2).pow(53)

  /** Max |cell| per decimal column, or Nil when the schema has none. */
  private def decimalViolations(df: DataFrame): Seq[(String, BigDecimal)] = {
    val decCols = df.schema.fields.collect {
      case f if f.dataType.isInstanceOf[DecimalType] => f.name
    }
    if (decCols.isEmpty) Nil
    else {
      val aggs = decCols.zipWithIndex.map { case (c, i) =>
        max(abs(col(c))).as(s"m$i") }
      val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
      decCols.zipWithIndex.flatMap { case (c, i) =>
        Option(row.getDecimal(i)).map(d => c -> BigDecimal(d))
      }.filter(_._2 > F64Exact)
    }
  }

  test("no query output carries a decimal cell above 2^53 (driver float64-exact window)") {
    val failures = scala.collection.mutable.ArrayBuffer[String]()
    Registry.all.foreach { q =>
      try {
        decimalViolations(q.build(spark, dir)).foreach { case (c, m) =>
          failures += s"${q.name}.$c max |cell| = $m > 2^53"
        }
      } finally Caches.releaseAll()
    }
    assert(failures.isEmpty,
      s"${failures.size} decimal output cells exceed the driver's float64-exact " +
        s"window — re-encode as int64 div/mod splits:\n" + failures.mkString("\n"))
  }

  test("the contract check catches a planted >2^53 decimal output") {
    import spark.implicits._
    val planted = Seq("a").toDF("k")
      .select(col("k"), lit("9007199254740993").cast(DecimalType(38, 0)).as("big"))
    val v = decimalViolations(planted)
    assert(v.map(_._1) === Seq("big"))
    val ok = Seq("a").toDF("k")
      .select(col("k"), lit("9007199254740992").cast(DecimalType(38, 0)).as("edge"))
    assert(decimalViolations(ok).isEmpty)
  }
}
