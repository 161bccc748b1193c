package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared engine capability: a Spark query over the testdata tables
  * plus, when SQL-expressible, a DuckDB oracle the driver hash-compares
  * against (SURVEY.md §2.3). Column names and row order must match between
  * the two — every query ends in a total-order ORDER BY and aliases every
  * computed column identically on both sides.
  */
final case class Q(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None,
    doc: String = "")
