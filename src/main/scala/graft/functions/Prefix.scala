package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions.{col, spark_partition_id, sum}
import org.apache.spark.sql.types.LongType

/** Distributed exact prefix sums under a total order — the running-total
  * generalization of [[Ranks.withGlobalRowNumber]] (row numbering is the
  * special case weight ≡ 1).
  *
  * `SUM(w) OVER (ORDER BY ...)` — an unpartitioned running window — moves
  * every row into one task: the classic scale-killer. The distributed
  * shape is the textbook two-pass scan: range-repartition on the order
  * keys (RangePartitioner samples split points), sort within partitions,
  * one pass summing each partition's weights, broadcast the per-partition
  * prefix offsets, then stream each partition adding its offset. Every
  * stage is linear and cluster-wide; no task ever holds more than its
  * partition, and the driver holds only #partitions longs per weight.
  *
  * Weights are `LongType` only: prefix sums feed rank statistics
  * (Mann-Whitney, KS) and token packing, where exactness matters and the
  * inputs are counts — integer arithmetic keeps the result bit-identical
  * to any oracle regardless of partition count.
  *
  * The per-partition streaming accumulation is imperative, which no
  * built-in operator expresses without the global-window trap — the
  * documented `mapPartitions` last resort (SURVEY.md §2 custom-operator
  * preference order, case d).
  */
object Prefix {

  /** Append, for each name in `weightCols`, a column `<name>_cum` holding
    * the inclusive prefix sum of that weight under the total order
    * `order`. `order` must be total for determinism; weight columns must
    * be non-null LongType.
    */
  def withRunningTotals(df: DataFrame, order: Seq[Column],
      weightCols: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    val parts = math.max(1, spark.conf.get("spark.sql.shuffle.partitions").toInt)
    // cached: consumed by the per-partition sum pass and the caller's
    // action; released by the harness's post-query Caches.releaseAll()
    val sorted = graft.Caches.persisted(
      df.repartitionByRange(parts, order: _*)
        .sortWithinPartitions(order: _*))
    val widx = weightCols.map(sorted.schema.fieldIndex).toArray
    // Per-partition weight totals via one column-pruned codegen aggregate
    // over the cache (r16, guide §4): the previous `.rdd` pass
    // deserialized every cached InternalRow to an external Row just to
    // sum longs. The collect stays bounded by the partition count.
    val sumCols = weightCols.map(w => sum(col(w)).as(w))
    val byPid = sorted.groupBy(spark_partition_id().as("pid"))
      .agg(sumCols.head, sumCols.tail: _*)
      .collect()
      .map(r => r.getInt(0) -> weightCols.indices.map(j => r.getLong(j + 1)).toArray)
      .toMap
    val partSums = (0 until parts)
      .map(i => byPid.getOrElse(i, new Array[Long](widx.length))).toArray
    // offsets(i)(j) = total weight j in partitions before i
    val offsets = partSums.scanLeft(new Array[Long](widx.length)) {
      (a, b) => a.zip(b).map { case (x, y) => x + y }
    }
    val bc = spark.sparkContext.broadcast(offsets)
    graft.Caches.defer(() => bc.destroy())
    val schema = weightCols.foldLeft(sorted.schema)(
      (s, w) => s.add(s"${w}_cum", LongType, nullable = false))
    val rdd = sorted.rdd.mapPartitionsWithIndex { case (i, it) =>
      val acc = bc.value(i).clone()
      it.map { row =>
        var j = 0
        while (j < widx.length) { acc(j) += row.getLong(widx(j)); j += 1 }
        // copy: acc mutates on the next row, the Row must not alias it
        Row.fromSeq(row.toSeq ++ acc.clone().toSeq)
      }
    }
    spark.createDataFrame(rdd, schema)
  }
}
