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

  /** Two-sample Welch's t statistic: purchase vs view event values — the
    * A/B-test screening statistic. Per-group moments (mean, sample
    * variance, count) come from one partial+final aggregate each; the
    * t formula runs on the 1-row joined result. Spark and DuckDB both
    * matched var_samp at pround(4) already (q_stats_agg), and the final
    * scalar funnels through pround, so cross-engine drift stays inside
    * the grain. Output includes the Welch degrees of freedom.
    */
  private val abTest = Q(
    "q_ab_test",
    (spark, dir) => {
      val ev = Tables.events(spark, dir)
      def grp(t: String, pfx: String) = ev.filter(col("event_type") === t)
        .agg(count(lit(1)).as(s"${pfx}_n"),
          avg(col("value")).as(s"${pfx}_mean"),
          var_samp(col("value")).as(s"${pfx}_var"))
      grp("purchase", "a").crossJoin(grp("view", "b"))
        .select(
          col("a_n"), col("b_n"),
          pround(col("a_mean"), 4).as("a_mean"),
          pround(col("b_mean"), 4).as("b_mean"),
          pround((col("a_mean") - col("b_mean")) /
            sqrt(col("a_var") / col("a_n") + col("b_var") / col("b_n")), 4)
            .as("t_stat"),
          pround(
            pow(col("a_var") / col("a_n") + col("b_var") / col("b_n"), 2) /
              (pow(col("a_var") / col("a_n"), 2) / (col("a_n") - 1) +
                pow(col("b_var") / col("b_n"), 2) / (col("b_n") - 1)), 2)
            .as("welch_df"))
    },
    Some("""WITH a AS (SELECT CAST(COUNT(*) AS BIGINT) AS a_n, AVG(value) AS a_mean,
                         var_samp(value) AS a_var
                       FROM events WHERE event_type = 'purchase'),
            b AS (SELECT CAST(COUNT(*) AS BIGINT) AS b_n, AVG(value) AS b_mean,
                    var_samp(value) AS b_var
                  FROM events WHERE event_type = 'view')
            SELECT a_n, b_n,
              FLOOR(a_mean * 10000 + 0.5) / 10000 AS a_mean,
              FLOOR(b_mean * 10000 + 0.5) / 10000 AS b_mean,
              FLOOR(((a_mean - b_mean) / sqrt(a_var / a_n + b_var / b_n)) * 10000 + 0.5) / 10000 AS t_stat,
              FLOOR((pow(a_var / a_n + b_var / b_n, 2)
                / (pow(a_var / a_n, 2) / (a_n - 1) + pow(b_var / b_n, 2) / (b_n - 1)))
                * 100 + 0.5) / 100 AS welch_df
            FROM a CROSS JOIN b"""))

  /** Simple linear regression per group via the SQL regr_* family:
    * extendedprice on quantity per return flag. One partial+final
    * aggregate (the regr_* functions reduce to sums/moments); both
    * engines implement the same textbook estimators and the outputs
    * funnel through pround.
    */
  private val linReg = Q(
    "q_linreg",
    (spark, dir) =>
      Tables(spark, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          regr_count(col("l_extendedprice"), col("l_quantity")).as("n"),
          pround(regr_slope(col("l_extendedprice"), col("l_quantity")), 4).as("slope"),
          pround(regr_intercept(col("l_extendedprice"), col("l_quantity")), 4).as("intercept"),
          pround(regr_r2(col("l_extendedprice"), col("l_quantity")), 4).as("r2"))
        .orderBy(col("l_returnflag")),
    Some("""SELECT l_returnflag,
              CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n,
              FLOOR((regr_slope(l_extendedprice, l_quantity)) * 10000 + 0.5) / 10000 AS slope,
              FLOOR((regr_intercept(l_extendedprice, l_quantity)) * 10000 + 0.5) / 10000 AS intercept,
              FLOOR((regr_r2(l_extendedprice, l_quantity)) * 10000 + 0.5) / 10000 AS r2
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** Gini coefficient of the order-value distribution, computed
    * scale-safely from a value-binned histogram (the percentile-twin
    * idiom): bin counts and bin value mass by hash aggregate, cumulative
    * shares over the tiny histogram, then the trapezoid Lorenz sum
    * Gini = 1 − Σ shareᵢ·(cumᵢ₋₁ + cumᵢ). Bin width 10k keeps the
    * histogram ~60 rows at any scale; all cumulative math runs over that
    * bounded relation, never the table.
    */
  private val gini = Q(
    "q_gini",
    (spark, dir) => {
      import org.apache.spark.sql.expressions.Window
      val hist = Tables(spark, dir, "orders")
        .groupBy(floor(col("o_totalprice") / 10000).cast("bigint").as("bin"))
        .agg(count(lit(1)).as("c"), sum(col("o_totalprice")).as("mass"))
      val w = Window.orderBy(col("bin").asc_nulls_first)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = hist
        .withColumn("cum_mass", sum(col("mass")).over(w))
        .withColumn("tot_mass", sum(col("mass")).over(Window.partitionBy()))
        .withColumn("tot_n", sum(col("c")).over(Window.partitionBy()))
      cum.select(
          (col("c").cast("double") / col("tot_n")).as("share"),
          (col("cum_mass") / col("tot_mass")).as("cum_hi"),
          ((col("cum_mass") - col("mass")) / col("tot_mass")).as("cum_lo"))
        .agg(pround(lit(1.0) - sum(col("share") * (col("cum_lo") + col("cum_hi"))), 4)
          .as("gini"), count(lit(1)).as("n_bins"))
    },
    Some("""WITH h AS (SELECT CAST(FLOOR(o_totalprice / 10000) AS BIGINT) AS bin,
                         CAST(COUNT(*) AS BIGINT) AS c, SUM(o_totalprice) AS mass
                       FROM orders GROUP BY 1),
            cum AS (SELECT bin, c, mass,
                      SUM(mass) OVER (ORDER BY bin NULLS FIRST
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_mass,
                      SUM(mass) OVER () AS tot_mass,
                      CAST(SUM(c) OVER () AS BIGINT) AS tot_n
                    FROM h)
            SELECT FLOOR((1.0 - SUM((CAST(c AS DOUBLE) / tot_n)
                * ((cum_mass - mass) / tot_mass + cum_mass / tot_mass)))
                * 10000 + 0.5) / 10000 AS gini,
              CAST(COUNT(*) AS BIGINT) AS n_bins
            FROM cum"""))

  /** RFM customer segmentation (recency / frequency / monetary): per
    * customer, days since last order relative to the corpus horizon,
    * order count, and total spend, bucketed by fixed thresholds into a
    * 3-letter segment code, then aggregated to segment profiles. One
    * partial+final aggregate per customer plus a broadcast scalar
    * (corpus max date); the segment CASE is a map-side projection — the
    * standard feature-engineering shape at any scale. Fixed thresholds
    * (not quantiles) keep the bucketing deterministic and replayable.
    */
  private val rfm = Q(
    "q_rfm",
    (spark, dir) => {
      val o = Tables(spark, dir, "orders")
      val horizon = o.agg(max(col("o_orderdate")).as("mx"))
      val per = o.groupBy(col("o_custkey"))
        .agg(max(col("o_orderdate")).as("last_o"),
          count(lit(1)).as("freq"),
          sum(col("o_totalprice")).as("spend"))
        .crossJoin(broadcast(horizon))
        .select(col("o_custkey"),
          datediff(col("mx"), col("last_o")).cast("bigint").as("recency_days"),
          col("freq"), col("spend"))
      per.select(
          concat(
            when(col("recency_days") <= 365, "R").otherwise("r"),
            when(col("freq") >= 10, "F").otherwise("f"),
            when(col("spend") >= 1000000.0, "M").otherwise("m")).as("segment"),
          col("recency_days"), col("freq"), col("spend"))
        .groupBy(col("segment"))
        .agg(count(lit(1)).as("n_customers"),
          pround(avg(col("recency_days")), 2).as("avg_recency"),
          pround(avg(col("freq").cast("double")), 2).as("avg_freq"),
          pround(sum(col("spend")), 2).as("total_spend"))
        .orderBy(col("segment"))
    },
    Some("""WITH mx AS (SELECT MAX(o_orderdate) AS mx FROM orders),
            per AS (SELECT o_custkey,
                      CAST(date_diff('day', CAST(MAX(o_orderdate) AS DATE),
                                     CAST(MIN(mx.mx) AS DATE)) AS BIGINT) AS recency_days,
                      CAST(COUNT(*) AS BIGINT) AS freq,
                      SUM(o_totalprice) AS spend
                    FROM orders CROSS JOIN mx GROUP BY o_custkey),
            seg AS (SELECT
                      (CASE WHEN recency_days <= 365 THEN 'R' ELSE 'r' END)
                        || (CASE WHEN freq >= 10 THEN 'F' ELSE 'f' END)
                        || (CASE WHEN spend >= 1000000.0 THEN 'M' ELSE 'm' END) AS segment,
                      recency_days, freq, spend
                    FROM per)
            SELECT segment, CAST(COUNT(*) AS BIGINT) AS n_customers,
              FLOOR((AVG(recency_days)) * 100 + 0.5) / 100 AS avg_recency,
              FLOOR((AVG(CAST(freq AS DOUBLE))) * 100 + 0.5) / 100 AS avg_freq,
              FLOOR((SUM(spend)) * 100 + 0.5) / 100 AS total_spend
            FROM seg GROUP BY segment ORDER BY segment"""))

  /** Robust outlier screening via median absolute deviation — the
    * companion to q_zscore_outlier that a heavy-tailed distribution
    * needs (the z-score's mean/stddev are themselves dragged by the
    * outliers; the median/MAD are not). Two passes of the distributed
    * exact-percentile primitive (per-group median of x, then of
    * |x − med|): every stage is the range-sort + offsets shape — no
    * per-group buffering, any group size. The 1.4826·3 normal-consistency
    * threshold is one fused constant so both engines compare identical
    * products.
    */
  private val madOutlier = Q(
    "q_mad_outlier",
    (spark, dir) => {
      val li = Tables(spark, dir, "lineitem")
        .select(col("l_returnflag").as("g"), col("l_extendedprice").as("x"))
      val med = graft.functions.Ranks.exactPercentiles(li, "g", "x", Seq(0.5))
        .select(col("g"), col("v").as("med"))
      val dev = li.join(broadcast(med), "g")
        .select(col("g"), abs(col("x") - col("med")).as("dev"), col("med"))
      val mad = graft.functions.Ranks
        .exactPercentiles(dev.select(col("g"), col("dev")), "g", "dev", Seq(0.5))
        .select(col("g"), col("v").as("mad"))
      dev.join(broadcast(mad), "g")
        .groupBy(col("g"))
        .agg(count(lit(1)).as("n"),
          pround(min(col("med")), 2).as("med"),
          pround(min(col("mad")), 2).as("mad"),
          count_if(col("dev") > col("mad") * 4.4478).as("n_outliers"))
        .orderBy(col("g"))
    },
    Some("""WITH li AS (SELECT l_returnflag AS g, l_extendedprice AS x FROM lineitem),
            med AS (SELECT g, quantile_cont(x, 0.5) AS med FROM li GROUP BY g),
            dev AS (SELECT li.g, ABS(x - med) AS dev, med
                    FROM li JOIN med ON li.g = med.g),
            mad AS (SELECT g, quantile_cont(dev, 0.5) AS mad FROM dev GROUP BY g)
            SELECT dev.g AS g, CAST(COUNT(*) AS BIGINT) AS n,
              FLOOR((MIN(dev.med)) * 100 + 0.5) / 100 AS med,
              FLOOR((MIN(mad.mad)) * 100 + 0.5) / 100 AS mad,
              CAST(COUNT(*) FILTER (WHERE dev > mad.mad * 4.4478) AS BIGINT) AS n_outliers
            FROM dev JOIN mad ON dev.g = mad.g
            GROUP BY dev.g ORDER BY g"""))

  /** Fixed-size uniform sample (the reservoir-sampling contract) made
    * deterministic and distributed: rank every row by the md5 hash of
    * its primary key and keep the 100 smallest. Hash order is uniform
    * and engine-independent, and "100 smallest by hash" is a
    * TakeOrdered — a per-partition heap merge, never a global sort —
    * so the sample costs one scan at any scale, exactly the property
    * that makes reservoir sampling attractive sequentially.
    */
  private val reservoirSample = Q(
    "q_reservoir_sample",
    (spark, dir) =>
      Tables(spark, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          substring(md5(concat_ws("-", col("l_orderkey"), col("l_linenumber"))), 1, 16)
            .as("h"))
        .orderBy(col("h"))
        .limit(100),
    Some("""SELECT l_orderkey, l_linenumber,
              substr(md5(CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR)), 1, 16) AS h
            FROM lineitem ORDER BY h LIMIT 100"""))

  /** Winsorized mean — the robust-mean companion to q_mad_outlier: per
    * return flag, clamp extended price into its group's exact
    * [p05, p95] band, then average. The percentile bounds come from the
    * distributed exact-percentile primitive (range sort + offsets, no
    * per-group buffer) and broadcast back over the fact table; the mean
    * funnels through FLOOR(clamped·10⁴+0.5) integer sums, so both
    * engines divide identical integers. One sorted pass + one scan.
    */
  private val winsorize = Q(
    "q_winsorize",
    (spark, dir) => {
      val li = Tables(spark, dir, "lineitem")
      val bounds = graft.functions.Ranks
        .exactPercentiles(li, "l_returnflag", "l_extendedprice", Seq(0.05, 0.95))
        .groupBy(col("l_returnflag"))
        .agg(min(when(col("p") === 0.05, col("v"))).as("lo"),
          min(when(col("p") === 0.95, col("v"))).as("hi"))
      li.join(broadcast(bounds), "l_returnflag")
        .select(col("l_returnflag"), col("lo"), col("hi"),
          floor(least(greatest(col("l_extendedprice"), col("lo")), col("hi"))
            * 10000 + 0.5).cast("long").as("wx"))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).cast("bigint").as("n"),
          pround(min(col("lo")), 2).as("p05"),
          pround(min(col("hi")), 2).as("p95"),
          pround(sum(col("wx")).cast("double") / count(lit(1)).cast("double")
            / 10000.0, 2).as("winsorized_mean"))
        .orderBy(col("l_returnflag"))
    },
    Some("""WITH bounds AS (SELECT l_returnflag,
                  quantile_cont(l_extendedprice, 0.05) AS lo,
                  quantile_cont(l_extendedprice, 0.95) AS hi
                FROM lineitem GROUP BY l_returnflag),
            wx AS (SELECT li.l_returnflag, b.lo, b.hi,
                     CAST(FLOOR(LEAST(GREATEST(li.l_extendedprice, b.lo), b.hi)
                       * 10000 + 0.5) AS BIGINT) AS wx
                   FROM lineitem li JOIN bounds b USING (l_returnflag))
            SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
              FLOOR((MIN(lo)) * 100 + 0.5) / 100 AS p05,
              FLOOR((MIN(hi)) * 100 + 0.5) / 100 AS p95,
              FLOOR((CAST(SUM(wx) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) / 10000.0)
                * 100 + 0.5) / 100 AS winsorized_mean
            FROM wx GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** Neyman optimal allocation (Neyman 1934; Cochran, Sampling Techniques
    * §5.5) — how a fixed audit/labeling budget should split across strata:
    * nₕ ∝ Nₕ·σₕ, so big AND volatile strata get proportionally more
    * samples than small or uniform ones (vs q_stratified_sample's flat
    * rate). Strata are order priorities, y is integer cents; the moments
    * are one exact partial+final aggregate (Nₕ, Σy, Σy²), the per-stratum
    * weight is floored to an integer BEFORE the cross-stratum total
    * (wₕ = floor(Nₕ·σₕ) — no float sum across strata, the house rule),
    * and the allocation for a 10 000-unit budget is wₕ·10⁴ div Σw.
    * Variance itself is the population form σₕ² = Σy²/Nₕ − (Σy/Nₕ)²
    * computed in the identical operand order on both engines from exact
    * integer inputs (the q_welch_t discipline).
    *
    * Scale posture (100 TB): one scan, 5-group aggregate, 1-row broadcast
    * weight total — allocation of any budget over any strata count is the
    * same two-level shape.
    */
  private val neymanAlloc = Q(
    "q_neyman_alloc",
    (spark, dir) => {
      // cents² sums overflow BIGINT past ~sf0.3 (3e15 per row): the
      // factors cast to decimal BEFORE product and sum so the accumulator
      // runs in decimal(38,0), mirroring DuckDB's automatic HUGEINT
      // promotion (the q_assortativity precedent)
      val cd = col("cents").cast("decimal(19,0)")
      val m = Tables(spark, dir, "orders")
        .select(col("o_orderpriority").as("stratum"),
          expr("cast(floor(o_totalprice * 100 + 0.5) as bigint)").as("cents"))
        .groupBy(col("stratum"))
        .agg(count(lit(1)).as("nh"), sum(col("cents")).as("s1"),
          sum(cd * cd).as("s2"))
      // greatest(0, ·) clamp: a zero-variance stratum can round the
      // operand to a tiny negative in doubles; sqrt(NaN) then diverges
      // the engines (Spark non-ANSI cast NaN→0, DuckDB errors)
      val w = m.select(col("stratum"), col("nh"),
        expr("""cast(floor(nh * sqrt(greatest(0.0d,
                cast(s2 as double) / cast(nh as double)
              - (cast(s1 as double) / cast(nh as double))
                * (cast(s1 as double) / cast(nh as double))))) as bigint)""").as("wh"))
      val tot = broadcast(w.agg(coalesce(sum(col("wh")), lit(0L)).as("wtot")))
      w.crossJoin(tot)
        .select(col("stratum"), col("nh").cast("bigint").as("n_h"),
          col("wh").cast("bigint").as("weight"),
          when(col("wtot") === 0, lit(0L))
            .otherwise(expr("wh * 10000 div wtot")).cast("bigint").as("alloc_10k"))
        .orderBy(col("stratum"))
    },
    Some("""WITH m AS (SELECT o_orderpriority AS stratum, COUNT(*) AS nh,
                         SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS s1,
                         SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)
                           * CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS s2
                       FROM orders GROUP BY o_orderpriority),
            w AS (SELECT stratum, nh,
                    CAST(FLOOR(nh * SQRT(GREATEST(0.0,
                        CAST(s2 AS DOUBLE) / CAST(nh AS DOUBLE)
                      - (CAST(s1 AS DOUBLE) / CAST(nh AS DOUBLE))
                        * (CAST(s1 AS DOUBLE) / CAST(nh AS DOUBLE))))) AS BIGINT) AS wh
                  FROM m),
            t AS (SELECT CAST(COALESCE(SUM(wh), 0) AS BIGINT) AS wtot FROM w)
            SELECT stratum, CAST(nh AS BIGINT) AS n_h, CAST(wh AS BIGINT) AS weight,
              CAST(CASE WHEN wtot = 0 THEN 0 ELSE wh * 10000 // wtot END AS BIGINT)
                AS alloc_10k
            FROM w CROSS JOIN t ORDER BY stratum"""))

  val all: Seq[Q] = Seq(stratifiedSample, zscore, abTest, linReg, gini, rfm,
    madOutlier, reservoirSample, winsorize, neymanAlloc)
}
