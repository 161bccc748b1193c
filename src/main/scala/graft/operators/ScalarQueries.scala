package graft.operators

import graft.{Q, Tables}
import graft.functions.Portable.pround
import org.apache.spark.sql.functions._

/** Additional scalar-function coverage: regex, conditional/null handling,
  * and approximate aggregates. All per-row expressions — they ride the
  * scan, no extra shuffles.
  */
object ScalarQueries {

  /** Regex functions: extract, replace-based counting, rlike. Patterns are
    * kept RE2-compatible so Java regex (Spark) and RE2 (DuckDB) agree.
    */
  private val regexFuncs = Q(
    "q_regex_funcs",
    (spark, dir) =>
      Tables(spark, dir, "documents")
        .select(
          col("doc_id"),
          regexp_extract(col("text"), "^([a-z]+)", 1).as("first_word"),
          (length(col("text")) - length(regexp_replace(col("text"), "a", "")))
            .cast("bigint").as("n_a"),
          col("text").rlike("table").as("has_table"))
        .orderBy(col("doc_id")),
    Some("""SELECT doc_id, regexp_extract(text, '^([a-z]+)', 1) AS first_word,
              CAST(length(text) - length(regexp_replace(text, 'a', '', 'g')) AS BIGINT) AS n_a,
              regexp_matches(text, 'table') AS has_table
            FROM documents ORDER BY doc_id"""))

  /** Conditional + null-handling functions: CASE, NULLIF, COALESCE,
    * GREATEST/LEAST feeding an aggregate.
    */
  private val condFuncs = Q(
    "q_cond_funcs",
    (spark, dir) =>
      Tables(spark, dir, "orders")
        .select(
          when(col("o_orderstatus") === "F", "finished")
            .when(col("o_orderstatus") === "O", "open")
            .otherwise("other").as("status_class"),
          when(col("o_totalprice") < 50000, "low")
            .when(col("o_totalprice") < 150000, "mid")
            .otherwise("high").as("price_band"),
          coalesce(nullif(col("o_orderpriority"), lit("1-URGENT")), lit("urgent!"))
            .as("prio"),
          least(col("o_totalprice"), lit(100000.0)).as("capped"))
        .groupBy(col("status_class"), col("price_band"), col("prio"))
        .agg(count(lit(1)).as("cnt"), pround(sum(col("capped")), 2).as("sum_capped"))
        .orderBy(col("status_class"), col("price_band"), col("prio")),
    Some("""SELECT
              CASE WHEN o_orderstatus = 'F' THEN 'finished'
                   WHEN o_orderstatus = 'O' THEN 'open'
                   ELSE 'other' END AS status_class,
              CASE WHEN o_totalprice < 50000 THEN 'low'
                   WHEN o_totalprice < 150000 THEN 'mid'
                   ELSE 'high' END AS price_band,
              COALESCE(NULLIF(o_orderpriority, '1-URGENT'), 'urgent!') AS prio,
              CAST(COUNT(*) AS BIGINT) AS cnt,
              FLOOR((SUM(LEAST(o_totalprice, 100000.0))) * 100 + 0.5) / 100 AS sum_capped
            FROM orders GROUP BY 1, 2, 3 ORDER BY status_class, price_band, prio"""))

  /** Approximate distinct (HLL++): no oracle — HLL sketches aren't
    * bit-compatible across engines (SURVEY.md §7.3), so the driver records
    * the weaker rows-only check. The exact companion q_distinct-style
    * counts are oracle-checked elsewhere.
    */
  private val approxDistinct = Q(
    "q_approx_distinct",
    (spark, dir) =>
      Tables(spark, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          approx_count_distinct(col("l_partkey")).as("approx_parts"),
          approx_count_distinct(col("l_orderkey")).as("approx_orders"))
        .orderBy(col("l_returnflag")),
    None)

  val all: Seq[Q] = Seq(regexFuncs, condFuncs, approxDistinct)
}
