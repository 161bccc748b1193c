package graft.operators

import graft.{Q, Tables}
import graft.functions.Portable.pround
import org.apache.spark.sql.functions._

/** Sampling and outlier-screening operators — the statistical leg of a
  * training-data pipeline: reproducible stratified sampling (hash-mod, so
  * any worker can re-derive membership without coordination or stored
  * state) and z-score outlier screening. Both are single-shuffle
  * aggregations; the sampling predicate is map-side and pushes nothing to
  * the driver, so the shapes hold at any scale.
  */
object SamplingQueries {

  /** Deterministic ~20% stratified sample via md5(doc_id) mod 5 == 0:
    * per-stratum totals, sample counts, and realized rates. The same
    * portable 60-bit hash used by the dedup family (fixed-width hex →
    * BIGINT parses identically in both engines).
    */
  private val stratifiedSample = Q(
    "q_stratified_sample",
    (spark, dir) => {
      val in = (graft.functions.Portable.hash60(col("doc_id")) % 5 === 0).cast("long")
      Tables(spark, dir, "documents")
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).as("n_total"),
          sum(in).as("n_sampled"),
          pround(sum(in).cast("double") / count(lit(1)).cast("double"), 4).as("rate"))
        .orderBy(col("lang"))
    },
    Some("""SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_total,
              CAST(SUM(CASE WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
                     AS BIGINT) % 5 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
              FLOOR((CAST(SUM(CASE WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
                     AS BIGINT) % 5 = 0 THEN 1 ELSE 0 END) AS DOUBLE)
                / CAST(COUNT(*) AS DOUBLE)) * 10000 + 0.5) / 10000 AS rate
            FROM documents GROUP BY lang ORDER BY lang"""))

  /** Z-score outlier screening: per-segment account-balance z-scores.
    * The moments come from a plain groupBy aggregate (partial+final, so
    * every partition contributes map-side) broadcast-joined back onto the
    * rows — NOT from a whole-partition window, which would funnel each
    * segment (5 values here) into a single task at scale. The moment
    * table is |segments| rows, always broadcastable. The outlier flag
    * compares the rounded score so the flag is exactly as portable as
    * the score itself.
    */
  private val zscore = Q(
    "q_zscore_outlier",
    (spark, dir) => {
      val moments = Tables(spark, dir, "customer")
        .groupBy(col("c_mktsegment"))
        .agg(avg(col("c_acctbal")).as("mu"),
          stddev_samp(col("c_acctbal")).as("sigma"))
      Tables(spark, dir, "customer")
        .join(broadcast(moments), "c_mktsegment")
        .select(col("c_custkey"), col("c_mktsegment"),
          pround((col("c_acctbal") - col("mu")) / col("sigma"), 4).as("z"))
        .withColumn("is_outlier", (abs(col("z")) >= 2.0).cast("int"))
        .orderBy(col("c_custkey"))
    },
    Some("""WITH z AS (SELECT c_custkey, c_mktsegment,
                    FLOOR(((c_acctbal - AVG(c_acctbal) OVER (PARTITION BY c_mktsegment))
                      / stddev_samp(c_acctbal) OVER (PARTITION BY c_mktsegment))
                      * 10000 + 0.5) / 10000 AS z
                  FROM customer)
            SELECT c_custkey, c_mktsegment, z,
              CAST(CASE WHEN abs(z) >= 2.0 THEN 1 ELSE 0 END AS INT) AS is_outlier
            FROM z ORDER BY c_custkey"""))

  val all: Seq[Q] = Seq(stratifiedSample, zscore)
}
