package graft.operators

import graft.{Q, Tables}
import graft.functions.Portable.pround
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Decision-support pipelines in the classic TPC-H shapes — multi-join
  * star-schema queries that exercise join ordering, dimension broadcast
  * and partial aggregation together (the reference's single-stage
  * map/shuffle/reduce kernel composes these as chained jobs; SURVEY.md
  * §2.1 O2–O5). These are the canonical "whole plan" tests: a correct
  * engine must pick filter-pushdown → prune → broadcast-dims →
  * shuffle-on-fact-keys without hand-holding.
  *
  * Float discipline: revenue funnels through per-row integer cents
  * (FLOOR(price·(1−disc)·100+0.5) — one float product evaluated in the
  * same order on both engines, then exact bigint sums). Statistics
  * (ANOVA) keep sums and sums-of-squares exact (bigint / decimal(38,0)
  * vs DuckDB HUGEINT) and go float only in the final scalar formula.
  */
object TpchQueries {

  /** Per-lineitem revenue in exact integer cents: the single float
    * product `price · (1 − discount) · 100` evaluates left-to-right
    * identically on both engines before the FLOOR.
    */
  private def revCents =
    floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100 + 0.5)
      .cast("long")

  /** TPC-H Q3 (shipping priority): top-10 unshipped orders by revenue
    * for one market segment. Plan shape: the segment filter prunes
    * customer before its join to orders (both pushed to the parquet
    * scan), the customer⋈orders join shrinks the fact side before the
    * orderkey shuffle against lineitem, and the final top-10 is a
    * TakeOrdered over the partial-aggregated revenue — no global sort.
    */
  private val tpchQ3 = Q(
    "q_tpch_q3",
    (spark, dir) => {
      val cut = lit("1998-06-15").cast("timestamp")
      val c = Tables(spark, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"))
      val o = Tables(spark, dir, "orders")
        .filter(col("o_orderdate") < cut)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
      val l = Tables(spark, dir, "lineitem")
        .filter(col("l_shipdate") > cut)
        .select(col("l_orderkey"), revCents.as("cents"))
      c.join(o, col("c_custkey") === col("o_custkey"))
        .join(l, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(sum(col("cents")).cast("bigint").as("revenue_cents"))
        .orderBy(col("revenue_cents").desc, col("l_orderkey"))
        .limit(10)
        .select(col("l_orderkey"), col("revenue_cents"), col("o_orderdate"))
    },
    Some("""SELECT l_orderkey,
              CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents,
              o_orderdate
            FROM customer
            JOIN orders ON c_custkey = o_custkey
            JOIN lineitem ON l_orderkey = o_orderkey
            WHERE c_mktsegment = 'BUILDING'
              AND o_orderdate < TIMESTAMP '1998-06-15'
              AND l_shipdate > TIMESTAMP '1998-06-15'
            GROUP BY l_orderkey, o_orderdate
            ORDER BY revenue_cents DESC, l_orderkey LIMIT 10"""))

  /** TPC-H Q5 (local supplier volume): revenue per nation for one region
    * and one order year, where the supplying and buying nations match.
    * Plan shape: nation⋈region is a dimension chain (bounded — broadcast
    * on both engines), supplier and customer carry only their keys +
    * nationkey into the fact joins, and the one big shuffle is
    * lineitem⋈orders on orderkey; everything after aggregates to a
    * nation-bounded relation.
    */
  private val tpchQ5 = Q(
    "q_tpch_q5",
    (spark, dir) => {
      val n = Tables(spark, dir, "nation")
        .join(Tables(spark, dir, "region"), col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "ASIA")
        .select(col("n_nationkey"), col("n_name"))
      val s = Tables(spark, dir, "supplier")
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("s_nationkey"), col("n_name"))
      val c = Tables(spark, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey"))
      val o = Tables(spark, dir, "orders")
        .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        .select(col("o_orderkey"), col("o_custkey"))
      val l = Tables(spark, dir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"), revCents.as("cents"))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(s, col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .groupBy(col("n_name"))
        .agg(sum(col("cents")).cast("bigint").as("revenue_cents"))
        .orderBy(col("revenue_cents").desc, col("n_name"))
    },
    Some("""SELECT n_name,
              CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'ASIA'
              AND o_orderdate >= TIMESTAMP '1997-01-01'
              AND o_orderdate < TIMESTAMP '1998-01-01'
            GROUP BY n_name
            ORDER BY revenue_cents DESC, n_name"""))

  /** One-way ANOVA F test: does mean order value differ across the five
    * order priorities? Per-group n/Σx/Σx² from one partial+final hash
    * aggregate over exact integers (Σx² in decimal(38,0) — a bigint
    * would overflow once group revenue passes ~$10⁹, i.e. long before
    * 100 TB; DuckDB mirrors with HUGEINT). The float section (between /
    * within sums of squares, F, η²) runs over the group-bounded 5-row
    * relation, so pround(4) absorbs accumulation-order ulp — the chi2
    * discipline (StatsTests.scala).
    */
  private val anova = Q(
    "q_anova",
    (spark, dir) => {
      val cents = floor(col("o_totalprice") * 100 + 0.5).cast("long")
      val g = Tables(spark, dir, "orders")
        .select(col("o_orderpriority").as("grp"), cents.as("x"))
        .groupBy(col("grp"))
        .agg(count(lit(1)).cast("bigint").as("n"),
          sum(col("x")).cast("bigint").as("s"),
          sum((col("x") * col("x")).cast(DecimalType(38, 0))).as("q"))
      g.agg(
          count(lit(1)).cast("int").as("k"),
          sum(col("n")).cast("bigint").as("nt"),
          sum(col("s")).cast("bigint").as("st"),
          sum(col("q").cast("double")).as("qt"),
          sum(col("s").cast("double") * col("s").cast("double") /
            col("n").cast("double")).as("ssb_part"))
        .select(col("k"), col("nt").as("n"),
          (col("ssb_part") - col("st").cast("double") * col("st").cast("double") /
            col("nt").cast("double")).as("ssb"),
          (col("qt") - col("ssb_part")).as("ssw"))
        .select(col("k"), col("n"),
          pround((col("ssb") / (col("k") - 1).cast("double")) /
            (col("ssw") / (col("n") - col("k")).cast("double")), 4).as("f"),
          pround(col("ssb") / (col("ssb") + col("ssw")), 4).as("eta2"))
    },
    Some("""WITH x AS (SELECT o_orderpriority AS grp,
                  CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS x
                FROM orders),
            g AS (SELECT grp, CAST(COUNT(*) AS BIGINT) AS n,
                    CAST(SUM(x) AS BIGINT) AS s,
                    SUM(CAST(x * x AS HUGEINT)) AS q
                  FROM x GROUP BY grp),
            t AS (SELECT CAST(COUNT(*) AS INT) AS k,
                    CAST(SUM(n) AS BIGINT) AS nt,
                    CAST(SUM(s) AS BIGINT) AS st,
                    SUM(CAST(q AS DOUBLE)) AS qt,
                    SUM(CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) AS ssb_part
                  FROM g),
            ss AS (SELECT k, nt AS n,
                     ssb_part - CAST(st AS DOUBLE) * CAST(st AS DOUBLE) / CAST(nt AS DOUBLE) AS ssb,
                     qt - ssb_part AS ssw
                   FROM t)
            SELECT k, n,
              FLOOR(((ssb / CAST(k - 1 AS DOUBLE)) / (ssw / CAST(n - k AS DOUBLE)))
                * 10000 + 0.5) / 10000 AS f,
              FLOOR((ssb / (ssb + ssw)) * 10000 + 0.5) / 10000 AS eta2
            FROM ss"""))

  /** Exponentially weighted moving average of daily revenue with α = 1/2
    * truncated at 20 days of memory (weight < 1e-6 beyond): the decay
    * weights 2^(20−gap) are exact powers of two, so the weighted sums
    * stay exact integers (decimal(38,0) / HUGEINT — daily cents · 2^20
    * outgrows a bigint near petabyte scale) and only the final
    * normalizing division is float. The fan-out is an equi-join — each
    * day's revenue is exploded to the ≤ 21 target days it decays into,
    * then hash-joined back on the target date — not a range self-join,
    * so the shape stays linear in the date domain. The daily aggregate
    * underneath is partial+final over the full fact table (date-domain
    * histogram idiom, ~2.4k distinct days in the fixture).
    */
  private val ewma = Q(
    "q_ewma",
    (spark, dir) => {
      val daily = Tables(spark, dir, "orders")
        .groupBy(col("o_orderdate").as("d"))
        .agg(sum(floor(col("o_totalprice") * 100 + 0.5).cast("long"))
          .cast("bigint").as("cents"))
      val fan = daily
        .select(col("d").as("src_d"), col("cents").as("src_cents"),
          explode(sequence(lit(0), lit(20))).as("g"))
        .select(expr("src_d + make_dt_interval(g)").as("d"),
          col("src_cents"), expr("shiftleft(1L, 20 - g)").as("w"))
      daily.join(fan, "d")
        .groupBy(col("d"), col("cents"))
        .agg(sum((col("src_cents") * col("w")).cast(DecimalType(38, 0))).as("num"),
          sum(col("w")).cast("bigint").as("den"))
        .select(col("d"), col("cents"),
          pround(col("num").cast("double") / col("den").cast("double"), 2)
            .as("ewma_cents"))
        .orderBy(col("d"))
    },
    Some("""WITH daily AS (SELECT o_orderdate AS d,
                  CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
                FROM orders GROUP BY 1),
            fan AS (SELECT a.d + g * INTERVAL 1 DAY AS d,
                      a.cents AS src_cents,
                      CAST(1 << (20 - g) AS BIGINT) AS w
                    FROM daily a, UNNEST(generate_series(0, 20)) AS u(g))
            SELECT b.d, b.cents,
              FLOOR((CAST(SUM(CAST(src_cents * w AS HUGEINT)) AS DOUBLE)
                / CAST(SUM(w) AS DOUBLE)) * 100 + 0.5) / 100 AS ewma_cents
            FROM daily b JOIN fan ON fan.d = b.d
            GROUP BY b.d, b.cents
            ORDER BY b.d"""))

  /** TPC-H Q10 (returned-item reporting): the top-20 customers by
    * revenue lost to returns in one quarter. Plan shape: the quarter
    * filter prunes orders at the scan, the returnflag filter prunes
    * lineitem at the scan, orders⋈lineitem is the one fact-fact shuffle
    * (orderkey), the aggregate runs BEFORE the customer join so the
    * join's left side is customer-bounded, nation broadcasts, and the
    * head is TakeOrdered — no global sort of customers.
    */
  private val tpchQ10 = Q(
    "q_tpch_q10",
    (spark, dir) => {
      val o = Tables(spark, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
        .select(col("o_orderkey"), col("o_custkey"))
      val l = Tables(spark, dir, "lineitem")
        .filter(col("l_returnflag") === "R")
        .select(col("l_orderkey"), revCents.as("cents"))
      val rev = o.join(l, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_custkey"))
        .agg(sum(col("cents")).cast("bigint").as("revenue_cents"))
      val c = Tables(spark, dir, "customer")
        .join(broadcast(Tables(spark, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
      rev.join(c, col("o_custkey") === col("c_custkey"))
        .orderBy(col("revenue_cents").desc, col("c_custkey"))
        .limit(20)
        .select(col("c_custkey"), col("c_name"), col("revenue_cents"),
          pround(col("c_acctbal"), 2).as("acctbal"), col("n_name"))
    },
    Some("""WITH rev AS (SELECT o_custkey,
                  CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents
                FROM orders JOIN lineitem ON l_orderkey = o_orderkey
                WHERE o_orderdate >= TIMESTAMP '1996-01-01'
                  AND o_orderdate < TIMESTAMP '1996-04-01'
                  AND l_returnflag = 'R'
                GROUP BY o_custkey)
            SELECT c_custkey, c_name, revenue_cents,
              FLOOR(c_acctbal * 100 + 0.5) / 100 AS acctbal, n_name
            FROM rev
            JOIN customer ON c_custkey = o_custkey
            JOIN nation ON c_nationkey = n_nationkey
            ORDER BY revenue_cents DESC, c_custkey LIMIT 20"""))

  val all: Seq[Q] = Seq(tpchQ3, tpchQ5, anova, ewma, tpchQ10)
}
