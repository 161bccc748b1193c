package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
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
    // cached: consumed by the counting pass here and the enumeration pass
    // in the caller's action; released by the harness's post-query
    // Caches.releaseAll()
    val sorted = graft.Caches.persisted(
      df.repartitionByRange(parts, order: _*)
        .sortWithinPartitions(order: _*))
    val counts = sorted.rdd
      .mapPartitionsWithIndex { case (i, it) => Iterator((i, it.size.toLong)) }
      .collect().sortBy(_._1).map(_._2)
    val offsets = counts.scanLeft(0L)(_ + _) // offsets(i) = rows before partition i
    val total = offsets.last
    val bc = spark.sparkContext.broadcast(offsets)
    // offsets are per-query state; destroy with the query's other caches
    graft.Caches.defer(() => bc.destroy())
    val schema = sorted.schema.add(rnCol, LongType, nullable = false)
    val rdd = sorted.rdd.mapPartitionsWithIndex { case (i, it) =>
      var rn = bc.value(i)
      it.map { row => rn += 1; Row.fromSeq(row.toSeq :+ rn) }
    }
    (spark.createDataFrame(rdd, schema), total)
  }

  /** Distributed EXACT interpolated percentiles per group — the scale
    * path for what `percentile()` computes by buffering every group
    * value in one aggregation buffer (executor OOM once a group outgrows
    * memory). Shape: one distributed sort via [[withGlobalRowNumber]]
    * on (group, value) — groups are contiguous in the global order — a
    * tiny per-group (offset, size) aggregate, the two bracketing
    * positions per requested percentile computed from it, a broadcast
    * join back to fetch just those rows, and the standard linear
    * interpolation lower + frac·(upper − lower) (the same formula
    * `percentile` / DuckDB `quantile_cont` use). Nothing ever holds a
    * whole group. `value` must be non-null.
    *
    * Returns (group, p, v): one row per group × requested percentile.
    */
  def exactPercentiles(df: DataFrame, group: String, value: String,
      ps: Seq[Double]): DataFrame = {
    val (numbered, _) = withGlobalRowNumber(
      df.select(col(group), col(value)), Seq(col(group), col(value)), "rn")
    // per-group start offset and size; 0-based index k = (m-1)·p brackets
    // between global rows lo = off + floor(k) and hi = off + min(floor(k)+1, m-1)
    // `pos` derives from `numbered`, so the group column is renamed to
    // break self-join lineage ambiguity
    val pos = numbered.groupBy(col(group))
      .agg(min(col("rn")).as("off"), count(lit(1)).as("m"))
      .select(col(group).as("pos_g"), col("off"), col("m"),
        explode(array(ps.map(lit): _*)).as("p"))
      .withColumn("k", (col("m") - 1).cast("double") * col("p"))
      .withColumn("lo", col("off") + floor(col("k")).cast("long"))
      .withColumn("hi", col("off") +
        least(floor(col("k")).cast("long") + 1, col("m") - 1))
      .withColumn("frac", col("k") - floor(col("k")))
    numbered.join(broadcast(pos),
        numbered(group) === col("pos_g") &&
          (col("rn") === col("lo") || col("rn") === col("hi")))
      .groupBy(col("pos_g").as(group), col("p"))
      .agg(
        min(when(col("rn") === col("lo"), col(value))).as("lo_v"),
        min(when(col("rn") === col("hi"), col(value))).as("hi_v"),
        first(col("frac")).as("frac"))
      .select(col(group), col("p"),
        (col("lo_v") + col("frac") * (col("hi_v") - col("lo_v"))).as("v"))
  }
}
