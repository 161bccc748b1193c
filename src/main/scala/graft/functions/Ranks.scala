package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.LongType

/** Distributed exact global ranking.
  *
  * `row_number()` over an unpartitioned window moves every row into one
  * task — the classic scale-killer. The distributed equivalent is the
  * textbook two-pass shape: range-repartition on the sort key (Spark's
  * RangePartitioner samples split points), sort within partitions, count
  * each partition, broadcast the prefix-sum offsets, and enumerate each
  * partition starting from its offset. Every stage is linear and
  * cluster-wide; nothing ever concentrates the data.
  *
  * The per-partition enumeration is imperative (a running counter), which
  * no built-in operator expresses — this is the documented `mapPartitions`
  * last resort (SURVEY.md §2 custom-operator preference order, case d).
  */
object Ranks {

  /** Append `rnCol` = 1-based global row number under the total order
    * `order`. Returns the numbered frame plus the total row count (known
    * for free from the counting pass). `order` must be a total order for
    * the numbering to be deterministic.
    */
  def withGlobalRowNumber(df: DataFrame, order: Seq[Column], rnCol: String): (DataFrame, Long) = {
    val spark = df.sparkSession
    val parts = math.max(1, spark.conf.get("spark.sql.shuffle.partitions").toInt)
    val sorted = df.repartitionByRange(parts, order: _*)
      .sortWithinPartitions(order: _*)
      .persist()
    val counts = sorted.rdd
      .mapPartitionsWithIndex { case (i, it) => Iterator((i, it.size.toLong)) }
      .collect().sortBy(_._1).map(_._2)
    val offsets = counts.scanLeft(0L)(_ + _) // offsets(i) = rows before partition i
    val total = offsets.last
    val bc = spark.sparkContext.broadcast(offsets)
    val schema = sorted.schema.add(rnCol, LongType, nullable = false)
    val rdd = sorted.rdd.mapPartitionsWithIndex { case (i, it) =>
      var rn = bc.value(i)
      it.map { row => rn += 1; Row.fromSeq(row.toSeq :+ rn) }
    }
    (spark.createDataFrame(rdd, schema), total)
  }
}
