package graft

import org.apache.spark.sql.SparkSession

/** One shared session across all suites (SURVEY.md §5.2 harness shape:
  * local[4], 4 shuffle partitions, UTC).
  */
object TestSpark {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val sf0001 = "/root/testdata/sf0.001"
}
