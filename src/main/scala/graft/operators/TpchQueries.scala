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

  /** TPC-H Q7 (volume shipping): bilateral trade between two nations by
    * ship year. Plan shape: nation filters to the 2-row pair and
    * broadcasts into supplier and customer, shrinking both to
    * nation-bounded key lists; supplier (tiny) broadcasts into the
    * lineitem scan so the date-filtered fact rows carry supp_nation
    * before any shuffle; the one fact-fact shuffle is lineitem⋈orders on
    * orderkey; the customer join then runs on the custkey shuffle with
    * the pair predicate applied before the year aggregate. Within the
    * 2-nation universe the bilateral condition reduces to
    * supp_nation ≠ cust_nation, but both engines evaluate the explicit
    * pair form for parity.
    */
  private val tpchQ7 = Q(
    "q_tpch_q7",
    (spark, dir) => {
      val n = Tables(spark, dir, "nation")
        .filter(col("n_name").isin("NATION_18", "NATION_19"))
        .select(col("n_nationkey"), col("n_name"))
      val s = Tables(spark, dir, "supplier")
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      val c = Tables(spark, dir, "customer")
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("n_name").as("cust_nation"))
      val o = Tables(spark, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"))
      val l = Tables(spark, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .select(col("l_orderkey"), col("l_suppkey"),
          year(col("l_shipdate")).cast("int").as("l_year"), revCents.as("cents"))
      l.join(broadcast(s), col("l_suppkey") === col("s_suppkey"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .filter((col("supp_nation") === "NATION_18" && col("cust_nation") === "NATION_19") ||
          (col("supp_nation") === "NATION_19" && col("cust_nation") === "NATION_18"))
        .groupBy(col("supp_nation"), col("cust_nation"), col("l_year"))
        .agg(sum(col("cents")).cast("bigint").as("revenue_cents"))
        .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
    },
    Some("""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
              CAST(year(l_shipdate) AS INT) AS l_year,
              CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents
            FROM lineitem
            JOIN orders ON o_orderkey = l_orderkey
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN customer ON c_custkey = o_custkey
            JOIN nation n1 ON s_nationkey = n1.n_nationkey
            JOIN nation n2 ON c_nationkey = n2.n_nationkey
            WHERE ((n1.n_name = 'NATION_18' AND n2.n_name = 'NATION_19')
                OR (n1.n_name = 'NATION_19' AND n2.n_name = 'NATION_18'))
              AND l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1998-01-01'
            GROUP BY 1, 2, 3
            ORDER BY supp_nation, cust_nation, l_year"""))

  /** TPC-H Q18 (large-volume customers): orders whose total quantity
    * exceeds 300 units, with their customers, by order value. Plan
    * shape: the HAVING aggregate runs on lineitem ALONE (partial+final
    * hash agg on orderkey — no join touches the full fact table), the
    * surviving big-order relation is threshold-selective, so AQE
    * converts both downstream joins (orders on orderkey, customer on
    * custkey) to broadcasts at runtime from observed size — the static
    * planner can't know an aggregate's output cardinality, which is
    * exactly what adaptive re-planning is for. Quantities and prices
    * funnel through integer cents; the float order key never crosses
    * engines.
    */
  private val tpchQ18 = Q(
    "q_tpch_q18",
    (spark, dir) => {
      val big = Tables(spark, dir, "lineitem")
        .select(col("l_orderkey"),
          floor(col("l_quantity") * 100 + 0.5).cast("long").as("q"))
        .groupBy(col("l_orderkey"))
        .agg(sum(col("q")).cast("bigint").as("qty_cents"))
        .filter(col("qty_cents") > 30000L)
      val o = Tables(spark, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
          floor(col("o_totalprice") * 100 + 0.5).cast("long").cast("bigint")
            .as("price_cents"))
      val c = Tables(spark, dir, "customer")
        .select(col("c_custkey"), col("c_name"))
      big.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .orderBy(col("price_cents").desc, col("o_orderdate"), col("o_orderkey"))
        .limit(100)
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          col("o_orderdate"), col("price_cents"),
          pround(col("qty_cents").cast("double") / 100, 2).as("qty"))
    },
    Some("""WITH big AS (SELECT l_orderkey,
                  CAST(SUM(CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT)) AS BIGINT) AS qty_cents
                FROM lineitem GROUP BY l_orderkey
                HAVING SUM(CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT)) > 30000)
            SELECT c_name, c_custkey, o_orderkey, o_orderdate,
              CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS price_cents,
              FLOOR((CAST(qty_cents AS DOUBLE) / 100) * 100 + 0.5) / 100 AS qty
            FROM big
            JOIN orders ON o_orderkey = l_orderkey
            JOIN customer ON c_custkey = o_custkey
            ORDER BY price_cents DESC, o_orderdate, o_orderkey LIMIT 100"""))

  /** TPC-H Q6 (forecast revenue change): the canonical scan-only query —
    * one filter over three pushable predicates and a scalar aggregate.
    * Plan shape: every predicate reaches the parquet scan (PushedFilters
    * shows shipdate range, discount band, quantity cap), no join, no
    * shuffle beyond the final 1-row partial+final agg. The revenue here
    * is price·discount (the forecast delta), not price·(1−discount) —
    * its own FLOOR-cents funnel. The discount band compares the same
    * parquet doubles against the same literals on both engines.
    */
  private val tpchQ6 = Q(
    "q_tpch_q6",
    (spark, dir) => {
      Tables(spark, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
          col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
          col("l_quantity") < 24)
        .agg(count(lit(1)).cast("bigint").as("n_lines"),
          sum(floor(col("l_extendedprice") * col("l_discount") * 100 + 0.5)
            .cast("long")).cast("bigint").as("revenue_cents"))
    },
    Some("""SELECT CAST(COUNT(*) AS BIGINT) AS n_lines,
              CAST(SUM(CAST(FLOOR(l_extendedprice * l_discount * 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate < TIMESTAMP '1998-01-01'
              AND l_discount BETWEEN 0.05 AND 0.07
              AND l_quantity < 24"""))

  /** TPC-H Q13 (customer order distribution): how many customers placed
    * k orders, including k = 0. Plan shape: orders aggregates to
    * per-custkey counts ALONE (partial+final on custkey — the fact table
    * is never joined raw), then customer LEFT-joins the customer-bounded
    * count relation and missing customers coalesce to zero; the outer
    * histogram aggregate runs over a customer-bounded relation. Joining
    * first and counting o_orderkey per group would shuffle the full
    * fact-join output; this shape shuffles each table exactly once.
    */
  private val tpchQ13 = Q(
    "q_tpch_q13",
    (spark, dir) => {
      val ocnt = Tables(spark, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).cast("bigint").as("cnt"))
      Tables(spark, dir, "customer").select(col("c_custkey"))
        .join(ocnt, col("c_custkey") === col("o_custkey"), "left_outer")
        .select(coalesce(col("cnt"), lit(0L)).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).cast("bigint").as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    },
    Some("""WITH ocnt AS (SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS cnt
                FROM orders GROUP BY o_custkey)
            SELECT COALESCE(cnt, 0) AS c_count,
              CAST(COUNT(*) AS BIGINT) AS custdist
            FROM customer LEFT OUTER JOIN ocnt ON c_custkey = o_custkey
            GROUP BY 1
            ORDER BY custdist DESC, c_count DESC"""))

  /** TPC-H Q14 (promotion effect): the share of one month's revenue
    * carried by promo-typed parts. Plan shape: the month filter prunes
    * the lineitem scan to ~1/84 of the fact table before the partkey
    * join; part carries only (partkey, promo-flag); the conditional and
    * unconditional sums come from ONE partial+final aggregate (a single
    * pass, not two joined subqueries). The percentage divides two exact
    * bigint cent sums and rounds portably.
    */
  private val tpchQ14 = Q(
    "q_tpch_q14",
    (spark, dir) => {
      val p = Tables(spark, dir, "part")
        .select(col("p_partkey"), (col("p_type") === "PROMO").as("promo"))
      Tables(spark, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-02-01").cast("timestamp"))
        .select(col("l_partkey"), revCents.as("cents"))
        .join(p, col("l_partkey") === col("p_partkey"))
        .agg(
          sum(when(col("promo"), col("cents")).otherwise(0L))
            .cast("bigint").as("promo_cents"),
          sum(col("cents")).cast("bigint").as("total_cents"))
        .select(col("promo_cents"), col("total_cents"),
          pround(lit(100.0) * col("promo_cents").cast("double") /
            col("total_cents").cast("double"), 4).as("promo_revenue_pct"))
    },
    Some("""WITH j AS (SELECT CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT) AS cents,
                  p_type = 'PROMO' AS promo
                FROM lineitem JOIN part ON l_partkey = p_partkey
                WHERE l_shipdate >= TIMESTAMP '1997-01-01'
                  AND l_shipdate < TIMESTAMP '1997-02-01'),
            s AS (SELECT CAST(SUM(CASE WHEN promo THEN cents ELSE 0 END) AS BIGINT) AS promo_cents,
                    CAST(SUM(cents) AS BIGINT) AS total_cents
                  FROM j)
            SELECT promo_cents, total_cents,
              FLOOR((100.0 * CAST(promo_cents AS DOUBLE) / CAST(total_cents AS DOUBLE))
                * 10000 + 0.5) / 10000 AS promo_revenue_pct
            FROM s"""))

  /** TPC-H Q19 (discounted revenue, disjunctive predicates): revenue
    * from three OR'd (brand, size-range, quantity-range) baskets — the
    * canonical test that a mixed-table disjunction doesn't defeat the
    * planner. Plan shape: the join stays a partkey equi-join with the
    * disjunction as a post-join filter (it references both sides), BUT
    * the part side is pre-filtered by the IMPLIED union bound
    * (brand ∈ the three baskets, size ≤ the largest range) — the manual
    * predicate-strengthening that pushes 88% of part, and with it most
    * of lineitem via the join, out of the shuffle. DuckDB evaluates the
    * original disjunction; the added Spark filter is implied, so results
    * agree exactly.
    */
  private val tpchQ19 = Q(
    "q_tpch_q19",
    (spark, dir) => {
      val p = Tables(spark, dir, "part")
        // implied by the disjunction below — pushed to the part scan
        .filter(col("p_brand").isin("Brand#1", "Brand#2", "Brand#3") &&
          col("p_size").between(1, 30))
        .select(col("p_partkey"), col("p_brand"), col("p_size"))
      Tables(spark, dir, "lineitem")
        .select(col("l_partkey"), col("l_quantity"), revCents.as("cents"))
        .join(p, col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#1" && col("p_size").between(1, 10) &&
            col("l_quantity").between(1, 15)) ||
          (col("p_brand") === "Brand#2" && col("p_size").between(1, 20) &&
            col("l_quantity").between(10, 25)) ||
          (col("p_brand") === "Brand#3" && col("p_size").between(1, 30) &&
            col("l_quantity").between(20, 35)))
        .agg(count(lit(1)).cast("bigint").as("n_lines"),
          sum(col("cents")).cast("bigint").as("revenue_cents"))
    },
    Some("""SELECT CAST(COUNT(*) AS BIGINT) AS n_lines,
              CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10
                AND l_quantity BETWEEN 1 AND 15)
               OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 20
                AND l_quantity BETWEEN 10 AND 25)
               OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 30
                AND l_quantity BETWEEN 20 AND 35)"""))

  /** TPC-H Q22 (global sales opportunity): wealthy-but-dormant customers
    * per nation — balance strictly above the positive-balance mean, no
    * orders in the trailing window. Plan shape: the 1-row mean aggregate
    * broadcasts; the above-mean test is pure integer arithmetic
    * (cents·n > total — no float mean crosses engines, and the product
    * stays under Long range until ~10¹⁰ customers); the dormancy test is
    * a LEFT-ANTI join against the date-pruned orders scan; the final
    * aggregate runs on the nation-bounded survivor relation.
    */
  private val tpchQ22 = Q(
    "q_tpch_q22",
    (spark, dir) => {
      val cust = Tables(spark, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey").cast("int").as("c_nationkey"),
          floor(col("c_acctbal") * 100 + 0.5).cast("long").as("cents"))
      val t = broadcast(cust.filter(col("cents") > 0L)
        .agg(count(lit(1)).cast("bigint").as("n"),
          sum(col("cents")).cast("bigint").as("tot")))
      val recent = Tables(spark, dir, "orders")
        .filter(col("o_orderdate") >= lit("2001-01-01").cast("timestamp"))
        .select(col("o_custkey"))
      cust.crossJoin(t)
        .filter(col("cents") * col("n") > col("tot"))
        .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).cast("bigint").as("numcust"),
          sum(col("cents")).cast("bigint").as("totacctbal_cents"))
        .orderBy(col("c_nationkey"))
    },
    Some("""WITH cust AS (SELECT c_custkey, CAST(c_nationkey AS INT) AS c_nationkey,
                  CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) AS cents
                FROM customer),
            t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                    CAST(SUM(cents) AS BIGINT) AS tot
                  FROM cust WHERE cents > 0)
            SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS numcust,
              CAST(SUM(cents) AS BIGINT) AS totacctbal_cents
            FROM cust, t
            WHERE cents * n > tot
              AND NOT EXISTS (SELECT 1 FROM orders o
                WHERE o.o_custkey = cust.c_custkey
                  AND o.o_orderdate >= TIMESTAMP '2001-01-01')
            GROUP BY c_nationkey
            ORDER BY c_nationkey"""))

  /** TPC-H Q8 (national market share): one supplier nation's share of a
    * region's imports of one part type, by order year. The widest join in
    * the suite — 8 relations — and the canonical test that a star plan
    * stays dimension-broadcast all the way up. Plan shape: region filter
    * → nation → customer keys (each broadcast); type filter prunes part
    * at the scan; supplier carries its nation name through a broadcast;
    * the one fact-fact shuffle is lineitem⋈orders; both share sums come
    * from ONE conditional aggregate over the year-bounded relation.
    */
  private val tpchQ8 = Q(
    "q_tpch_q8",
    (spark, dir) => {
      val n1 = Tables(spark, dir, "nation")
        .join(broadcast(Tables(spark, dir, "region")
          .filter(col("r_name") === "AMERICA")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey").as("c_nk"))
      val c = Tables(spark, dir, "customer")
        .join(broadcast(n1), col("c_nationkey") === col("c_nk"))
        .select(col("c_custkey"))
      val s = Tables(spark, dir, "supplier")
        .join(broadcast(Tables(spark, dir, "nation")
          .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))),
          col("s_nationkey") === col("s_nk"))
        .select(col("s_suppkey"), col("supp_nation"))
      val p = Tables(spark, dir, "part")
        .filter(col("p_type") === "ECONOMY")
        .select(col("p_partkey"))
      val o = Tables(spark, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        .select(col("o_orderkey"), col("o_custkey"),
          year(col("o_orderdate")).cast("int").as("o_year"))
      Tables(spark, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
          revCents.as("cents"))
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .join(broadcast(s), col("l_suppkey") === col("s_suppkey"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .groupBy(col("o_year"))
        .agg(sum(when(col("supp_nation") === "NATION_18", col("cents"))
            .otherwise(0L)).cast("bigint").as("nation_cents"),
          sum(col("cents")).cast("bigint").as("total_cents"))
        .select(col("o_year"), col("nation_cents"), col("total_cents"),
          pround(col("nation_cents").cast("double") /
            col("total_cents").cast("double"), 4).as("mkt_share"))
        .orderBy(col("o_year"))
    },
    Some("""SELECT CAST(year(o_orderdate) AS INT) AS o_year,
              CAST(SUM(CASE WHEN n2.n_name = 'NATION_18'
                THEN CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)
                ELSE 0 END) AS BIGINT) AS nation_cents,
              CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS total_cents,
              FLOOR((CAST(SUM(CASE WHEN n2.n_name = 'NATION_18'
                  THEN CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)
                  ELSE 0 END) AS DOUBLE)
                / CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS DOUBLE))
                * 10000 + 0.5) / 10000 AS mkt_share
            FROM lineitem
            JOIN part ON p_partkey = l_partkey
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN orders ON o_orderkey = l_orderkey
            JOIN customer ON c_custkey = o_custkey
            JOIN nation n1 ON c_nationkey = n1.n_nationkey
            JOIN region ON n1.n_regionkey = r_regionkey
            JOIN nation n2 ON s_nationkey = n2.n_nationkey
            WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
              AND o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate < TIMESTAMP '1998-01-01'
            GROUP BY 1
            ORDER BY o_year"""))

  /** TPC-H Q15 (top supplier): the supplier(s) with maximum revenue in
    * one quarter — the view + scalar-max shape, with ties kept exactly.
    * Plan shape: the quarter filter prunes the fact scan; revenue
    * aggregates per suppkey (partial+final — supplier-bounded output);
    * the 1-row max broadcasts back over that bounded relation, so the
    * tie-preserving equality filter never re-shuffles; supplier names
    * join the ≥1-row winners last. Integer-cent equality makes the tie
    * semantics exact on both engines — the float-revenue version of this
    * query is famously nondeterministic.
    */
  private val tpchQ15 = Q(
    "q_tpch_q15",
    (spark, dir) => {
      val rev = Tables(spark, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
        .groupBy(col("l_suppkey"))
        .agg(sum(revCents).cast("bigint").as("total_cents"))
      val mx = broadcast(rev.agg(max(col("total_cents")).as("mx")))
      rev.crossJoin(mx)
        .filter(col("total_cents") === col("mx"))
        .join(Tables(spark, dir, "supplier"),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("total_cents"))
        .orderBy(col("s_suppkey"))
    },
    Some("""WITH rev AS (SELECT l_suppkey,
                  CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS total_cents
                FROM lineitem
                WHERE l_shipdate >= TIMESTAMP '1997-01-01'
                  AND l_shipdate < TIMESTAMP '1997-04-01'
                GROUP BY l_suppkey)
            SELECT s_suppkey, s_name, total_cents
            FROM rev JOIN supplier ON s_suppkey = l_suppkey
            WHERE total_cents = (SELECT MAX(total_cents) FROM rev)
            ORDER BY s_suppkey"""))

  /** TPC-H Q17 (small-quantity-order revenue): revenue from orders of
    * one brand's parts at under 20% of that part's average order
    * quantity — the correlated-scalar-subquery-per-group shape. Plan
    * shape: the brand filter cuts part to ~4% and broadcasts; the
    * per-part quantity statistics aggregate over the ALREADY
    * brand-filtered lineitem (the unfiltered per-part aggregate would
    * scan 25× more — the oracle mirrors the same pushdown); the
    * correlation is a partkey equi-join back; the threshold test
    * 5·qty_cents·n < tot_cents is pure integer arithmetic (no float
    * average crosses engines; the product is bounded by the ~constant
    * lines-per-part ratio, nowhere near Long range).
    */
  private val tpchQ17 = Q(
    "q_tpch_q17",
    (spark, dir) => {
      val qCents = floor(col("l_quantity") * 100 + 0.5).cast("long")
      val p = Tables(spark, dir, "part")
        .filter(col("p_brand") === "Brand#1")
        .select(col("p_partkey"))
      val l = Tables(spark, dir, "lineitem")
        .select(col("l_partkey"), qCents.as("qc"), revCents.as("cents"))
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      val pq = l.groupBy(col("l_partkey").as("pk"))
        .agg(count(lit(1)).cast("bigint").as("n"),
          sum(col("qc")).cast("bigint").as("tot"))
      l.join(pq, col("l_partkey") === col("pk"))
        .filter(lit(5L) * col("qc") * col("n") < col("tot"))
        .agg(count(lit(1)).cast("bigint").as("n_lines"),
          sum(col("cents")).cast("bigint").as("revenue_cents"))
        .select(col("n_lines"), col("revenue_cents"),
          pround(col("revenue_cents").cast("double") / 700.0, 2).as("avg_yearly"))
    },
    Some("""WITH l AS (SELECT l_partkey,
                  CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT) AS qc,
                  CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT) AS cents
                FROM lineitem JOIN part ON p_partkey = l_partkey
                WHERE p_brand = 'Brand#1'),
            pq AS (SELECT l_partkey AS pk, CAST(COUNT(*) AS BIGINT) AS n,
                    CAST(SUM(qc) AS BIGINT) AS tot
                  FROM l GROUP BY 1)
            SELECT CAST(COUNT(*) AS BIGINT) AS n_lines,
              CAST(SUM(cents) AS BIGINT) AS revenue_cents,
              FLOOR((CAST(SUM(cents) AS DOUBLE) / 700.0) * 100 + 0.5) / 100 AS avg_yearly
            FROM l JOIN pq ON l_partkey = pk
            WHERE 5 * qc * n < tot"""))

  /** TPC-H Q1 (pricing summary report) — faithful to the spec shape
    * (the fixture carries every Q1 column): one partial+final hash
    * aggregate over the shipped slice, grouped by the 6 (returnflag,
    * linestatus) cells. Money funnels: base price in exact cents,
    * discount/tax in exact basis points; disc_price = cents × (10⁴−bp)
    * and charge = cents × (10⁴−bp) × (10⁴+bp) accumulate in
    * decimal(38,0) (the q_welch_t posture — the per-row charge term is
    * ~10¹⁵, so a bigint SUM wraps past ~10⁴ rows; DuckDB mirrors with
    * HUGEINT then casts). Averages are exact integer divisions of the
    * sums (centi-units), so no float ever aggregates.
    *
    * Output contract (round 12): the decimal accumulators exceed 2⁵³
    * at any realistic sf, which the drive-by hash comparison coerces
    * through float64 — so the OUTPUT re-encodes each decimal sum as
    * two exact int64 splits (`div`/`mod` — DuckDB `//`/`%` on HUGEINT
    * mirrors Spark decimal(38,0) `div` exactly): sum_disc_price in
    * whole cents·bp÷10⁴ + remainder, sum_charge in cents·bp²÷10⁸ +
    * remainder. Both splits stay below 2⁵³ past sf100 and the spec
    * columns are exactly reconstructible (hi·10ⁿ + lo).
    */
  private val tpchQ1 = Q(
    "q_tpch_q1",
    (spark, dir) => {
      val l = Tables(spark, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("2001-08-06").cast("timestamp"))
        .select(col("l_returnflag"), col("l_linestatus"),
          floor(col("l_quantity") + 0.5).cast("long").as("qty"),
          floor(col("l_extendedprice") * 100 + 0.5).cast("long").as("extc"),
          floor(col("l_discount") * 10000 + 0.5).cast("long").as("dbp"),
          floor(col("l_tax") * 10000 + 0.5).cast("long").as("tbp"))
      val extd = col("extc").cast(DecimalType(19, 0))
      l.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("qty")).cast("bigint").as("sum_qty"),
          sum(col("extc")).cast("bigint").as("sum_base_price_c"),
          sum(extd * (lit(10000) - col("dbp")).cast(DecimalType(19, 0)))
            .cast(DecimalType(38, 0)).as("sum_disc_price_cbp"),
          sum(extd * (lit(10000) - col("dbp")).cast(DecimalType(19, 0))
            * (lit(10000) + col("tbp")).cast(DecimalType(19, 0)))
            .cast(DecimalType(38, 0)).as("sum_charge_cbp2"),
          sum(col("dbp")).cast("bigint").as("sum_disc_bp"),
          count(lit(1)).cast("bigint").as("count_order"))
        .select(col("l_returnflag"), col("l_linestatus"), col("sum_qty"),
          col("sum_base_price_c"),
          expr("sum_disc_price_cbp div 10000").as("sum_disc_price_hi"),
          expr("cast(sum_disc_price_cbp % 10000 as bigint)").as("sum_disc_price_lo"),
          expr("sum_charge_cbp2 div 100000000").as("sum_charge_hi"),
          expr("cast(sum_charge_cbp2 % 100000000 as bigint)").as("sum_charge_lo"),
          expr("sum_qty * 100 div count_order").as("avg_qty_centi"),
          expr("sum_base_price_c div count_order").as("avg_price_c"),
          expr("sum_disc_bp div count_order").as("avg_disc_bp"),
          col("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },
    Some("""WITH l AS (SELECT l_returnflag, l_linestatus,
                   CAST(FLOOR(l_quantity + 0.5) AS BIGINT) AS qty,
                   CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS extc,
                   CAST(FLOOR(l_discount * 10000 + 0.5) AS BIGINT) AS dbp,
                   CAST(FLOOR(l_tax * 10000 + 0.5) AS BIGINT) AS tbp
                 FROM lineitem WHERE l_shipdate <= TIMESTAMP '2001-08-06')
            SELECT l_returnflag, l_linestatus,
              CAST(SUM(qty) AS BIGINT) AS sum_qty,
              CAST(SUM(extc) AS BIGINT) AS sum_base_price_c,
              CAST(SUM(extc * (10000 - dbp)) // 10000 AS BIGINT) AS sum_disc_price_hi,
              CAST(SUM(extc * (10000 - dbp)) % 10000 AS BIGINT) AS sum_disc_price_lo,
              CAST(SUM(extc * (10000 - dbp) * (10000 + tbp)) // 100000000 AS BIGINT) AS sum_charge_hi,
              CAST(SUM(extc * (10000 - dbp) * (10000 + tbp)) % 100000000 AS BIGINT) AS sum_charge_lo,
              CAST(SUM(qty) * 100 // COUNT(*) AS BIGINT) AS avg_qty_centi,
              CAST(SUM(extc) // COUNT(*) AS BIGINT) AS avg_price_c,
              CAST(SUM(dbp) // COUNT(*) AS BIGINT) AS avg_disc_bp,
              CAST(COUNT(*) AS BIGINT) AS count_order
            FROM l GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus"""))

  /** TPC-H Q2 (minimum-cost supplier), adapted to the fixture: there is
    * no partsupp table, so the part↔supplier offer relation is the
    * DISTINCT (part, supplier, unit cost) set observed in lineitem,
    * with unit cost = FLOOR(extendedprice·100/quantity + 0.5) — one
    * float division evaluated in the same order on both engines, then
    * exact integer cents. The correlated-min shape is intact: per part
    * the MIN unit cost among region-eligible suppliers, re-joined to
    * keep exactly the offers achieving it. Plan shape: dimension chain
    * (nation⋈region) broadcasts into supplier; parts filter-pushes
    * size/type to the scan; the min-per-part aggregate and the
    * achieving-offer join reuse the same partitioning.
    */
  private val tpchQ2 = Q(
    "q_tpch_q2",
    (spark, dir) => {
      val eligible = Tables(spark, dir, "supplier")
        .join(broadcast(Tables(spark, dir, "nation")
          .join(Tables(spark, dir, "region"), col("n_regionkey") === col("r_regionkey"))
          .filter(col("r_name") === "EUROPE")
          .select(col("n_nationkey"), col("n_name"))),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("s_name"), col("n_name"),
          floor(col("s_acctbal") * 100 + 0.5).cast("long").as("s_acctbal_c"))
      val parts = Tables(spark, dir, "part")
        .filter(col("p_size") === 15 && col("p_type") === "STANDARD")
        .select(col("p_partkey"))
      val offers = graft.Caches.persisted(
        Tables(spark, dir, "lineitem")
          .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
          .join(broadcast(eligible.select(col("s_suppkey"))),
            col("l_suppkey") === col("s_suppkey"))
          .select(col("p_partkey"), col("l_suppkey"),
            floor(col("l_extendedprice") * 100.0 / col("l_quantity") + 0.5)
              .cast("long").as("uc_c"))
          .distinct())
      val minc = offers.groupBy(col("p_partkey").as("mpk"))
        .agg(min(col("uc_c")).as("min_uc"))
      offers
        .join(minc, col("p_partkey") === col("mpk") && col("uc_c") === col("min_uc"))
        .select(col("p_partkey"), col("l_suppkey"), col("uc_c"))
        .join(broadcast(eligible), col("l_suppkey") === col("s_suppkey"))
        .select(col("s_acctbal_c"), col("s_name"), col("n_name"),
          col("p_partkey"), col("uc_c"))
        .orderBy(col("s_acctbal_c").desc, col("n_name"), col("s_name"), col("p_partkey"))
        .limit(100)
    },
    Some("""WITH eligible AS (SELECT s_suppkey, s_name, n_name,
                   CAST(FLOOR(s_acctbal * 100 + 0.5) AS BIGINT) AS s_acctbal_c
                 FROM supplier
                 JOIN nation ON s_nationkey = n_nationkey
                 JOIN region ON n_regionkey = r_regionkey
                 WHERE r_name = 'EUROPE'),
            offers AS (SELECT DISTINCT p_partkey, l_suppkey,
                   CAST(FLOOR(l_extendedprice * 100.0 / l_quantity + 0.5) AS BIGINT) AS uc_c
                 FROM lineitem
                 JOIN part ON l_partkey = p_partkey
                 JOIN eligible ON l_suppkey = s_suppkey
                 WHERE p_size = 15 AND p_type = 'STANDARD'),
            minc AS (SELECT p_partkey AS mpk, MIN(uc_c) AS min_uc
                     FROM offers GROUP BY 1)
            SELECT e.s_acctbal_c, e.s_name, e.n_name, o.p_partkey, o.uc_c
            FROM offers o
            JOIN minc ON o.p_partkey = mpk AND o.uc_c = min_uc
            JOIN eligible e ON o.l_suppkey = e.s_suppkey
            ORDER BY e.s_acctbal_c DESC, e.n_name, e.s_name, o.p_partkey
            LIMIT 100"""))

  /** TPC-H Q4 (order priority checking), adapted: the fixture lacks
    * commitdate/receiptdate, so the "late" witness is a lineitem shipped
    * more than 30 days after the order date — the EXISTS semi-join shape
    * (one quarter of orders, counted by priority) is intact. Plan
    * shape: the date filter pushes to the orders scan; the semi join is
    * the only shuffle and carries keys + two dates.
    */
  private val tpchQ4 = Q(
    "q_tpch_q4",
    (spark, dir) => {
      val o = Tables(spark, dir, "orders")
        .filter(col("o_orderdate") >= lit("1997-03-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-06-01").cast("timestamp"))
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
          col("o_orderpriority"))
      val l = Tables(spark, dir, "lineitem")
        .select(col("l_orderkey"), col("l_shipdate"))
      o.join(l, col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAYS"),
          "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).cast("bigint").as("order_count"))
        .orderBy(col("o_orderpriority"))
    },
    Some("""SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
            FROM orders
            WHERE o_orderdate >= TIMESTAMP '1997-03-01'
              AND o_orderdate < TIMESTAMP '1997-06-01'
              AND EXISTS (SELECT 1 FROM lineitem
                          WHERE l_orderkey = o_orderkey
                            AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
            GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  /** TPC-H Q9 (product type profit), adapted: no partsupp.supplycost in
    * the fixture, so unit cost is proxied at half the part's retail
    * price (exact: cents(retail)·qty integer-halved per row). Profit =
    * revenue cents − cost cents, summed per (supplier nation, order
    * year) — the spec's shape: a part-name class filter fanned through
    * the full fact chain into a nation×year rollup. Plan shape: part
    * and supplier dimensions broadcast; the one big shuffle is
    * lineitem⋈orders on orderkey; everything after is partial+final
    * into ≤ nations×years rows.
    */
  private val tpchQ9 = Q(
    "q_tpch_q9",
    (spark, dir) => {
      val p = Tables(spark, dir, "part")
        .filter(col("p_name").like("%widget%"))
        .select(col("p_partkey"),
          floor(col("p_retailprice") * 100 + 0.5).cast("long").as("retailc"))
      val s = Tables(spark, dir, "supplier")
        .join(broadcast(Tables(spark, dir, "nation")
          .select(col("n_nationkey"), col("n_name"))),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name"))
      val o = Tables(spark, dir, "orders")
        .select(col("o_orderkey"), year(col("o_orderdate")).as("o_year"))
      Tables(spark, dir, "lineitem")
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .join(broadcast(s), col("l_suppkey") === col("s_suppkey"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .select(col("n_name"), col("o_year"),
          (revCents - expr("(cast(floor(l_quantity + 0.5) as bigint) * retailc) div 2"))
            .as("profit_c"))
        .groupBy(col("n_name"), col("o_year"))
        .agg(sum(col("profit_c")).cast("bigint").as("sum_profit_c"))
        .orderBy(col("n_name"), col("o_year").desc)
    },
    Some("""SELECT n_name, o_year, CAST(SUM(profit_c) AS BIGINT) AS sum_profit_c
            FROM (SELECT n_name, CAST(year(o_orderdate) AS INT) AS o_year,
                    CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)
                      - (CAST(FLOOR(l_quantity + 0.5) AS BIGINT)
                         * CAST(FLOOR(p_retailprice * 100 + 0.5) AS BIGINT)) // 2
                      AS profit_c
                  FROM lineitem
                  JOIN part ON l_partkey = p_partkey
                  JOIN supplier ON l_suppkey = s_suppkey
                  JOIN nation ON s_nationkey = n_nationkey
                  JOIN orders ON l_orderkey = o_orderkey
                  WHERE p_name LIKE '%widget%')
            GROUP BY n_name, o_year ORDER BY n_name, o_year DESC"""))

  /** TPC-H Q11 (important stock identification), adapted: no
    * partsupp.availqty×supplycost, so a part's "value" is the revenue
    * cents booked through one nation's suppliers, and the HAVING
    * threshold is SCALE-INVARIANT — parts worth more than twice the
    * mean part value, as the exact integer comparison
    * value·n_parts > 2·total (the spec's fixed fraction-of-total is
    * degenerate off its design scale: at 10× the parts it admits
    * nothing, at 0.1× everything). Shape intact: group-per-part vs a
    * broadcast 1-row grand total. Plan shape: the nation's suppliers
    * broadcast into the fact scan; per-part partial+final sum; the
    * 1-row total joins broadcast-nested-loop; top-100 head.
    */
  private val tpchQ11 = Q(
    "q_tpch_q11",
    (spark, dir) => {
      val s3 = Tables(spark, dir, "supplier")
        .filter(col("s_nationkey") === 3).select(col("s_suppkey"))
      val pv = graft.Caches.persisted(
        Tables(spark, dir, "lineitem")
          .join(broadcast(s3), col("l_suppkey") === col("s_suppkey"))
          .select(col("l_partkey"), revCents.as("cents"))
          .groupBy(col("l_partkey"))
          .agg(sum(col("cents")).cast("bigint").as("value_c")))
      val total = pv.agg(sum(col("value_c")).cast("bigint").as("total_c"),
        count(lit(1)).cast("bigint").as("np"))
      // the scale-invariant threshold compares two big products; both
      // run in decimal(38,0) (DuckDB HUGEINT) — value_c·np at large sf
      // wraps a silent non-ANSI bigint multiply while DuckDB raises,
      // breaking the cross-engine match exactly where the docstring
      // claims scale invariance (ADVICE r11; the q_welch_t posture)
      pv.crossJoin(broadcast(total))
        .filter(col("value_c").cast(DecimalType(38, 0)) * col("np") >
          col("total_c").cast(DecimalType(38, 0)) * 2)
        .select(col("l_partkey"), col("value_c"))
        .orderBy(col("value_c").desc, col("l_partkey"))
        .limit(100)
    },
    Some("""WITH pv AS (SELECT l_partkey,
                   CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS value_c
                 FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
                 WHERE s_nationkey = 3
                 GROUP BY l_partkey),
            total AS (SELECT CAST(SUM(value_c) AS BIGINT) AS total_c,
                        CAST(COUNT(*) AS BIGINT) AS np FROM pv)
            SELECT l_partkey, value_c FROM pv, total
            WHERE CAST(value_c AS HUGEINT) * np > CAST(total_c AS HUGEINT) * 2
            ORDER BY value_c DESC, l_partkey LIMIT 100"""))

  /** TPC-H Q12 (shipping modes and order priority), adapted: no
    * shipmode/receiptdate in the fixture, so the two-class census runs
    * per returnflag over lines shipped in 1997 more than 60 days after
    * their order date; the CASE-sum split (URGENT/HIGH vs the rest) is
    * the spec's. One join + one partial+final aggregate.
    */
  private val tpchQ12 = Q(
    "q_tpch_q12",
    (spark, dir) => {
      val o = Tables(spark, dir, "orders")
        .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      Tables(spark, dir, "lineitem")
        .filter(col("l_returnflag").isin("A", "R") &&
          col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .select(col("l_orderkey"), col("l_returnflag"), col("l_shipdate"))
        .join(o, col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
        .groupBy(col("l_returnflag"))
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L))
            .cast("bigint").as("high_line_count"),
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L).otherwise(1L))
            .cast("bigint").as("low_line_count"))
        .orderBy(col("l_returnflag"))
    },
    Some("""SELECT l_returnflag,
              CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                            THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
              CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                            THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE l_returnflag IN ('A', 'R')
              AND l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate < TIMESTAMP '1998-01-01'
              AND l_shipdate > o_orderdate + INTERVAL 60 DAY
            GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** TPC-H Q16 (parts/supplier relationship), adapted: the
    * part↔supplier bridge is the DISTINCT (partkey, suppkey) pair set
    * from lineitem (no partsupp), and the excluded-supplier subquery
    * (spec: complaint comments) is suppliers with negative account
    * balance — the NOT-IN anti-join shape is intact. Distinct-supplier
    * counts per (brand, type, size) cell. Plan shape: the map-side
    * distinct bounds the shuffle to unique pairs; the exclusion set
    * broadcasts as an anti join; countDistinct lands on a
    * cell-bounded relation.
    */
  private val tpchQ16 = Q(
    "q_tpch_q16",
    (spark, dir) => {
      val p = Tables(spark, dir, "part")
        .filter(col("p_brand") =!= "Brand#5" && col("p_type") =!= "MEDIUM" &&
          col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45))
        .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
      val excl = Tables(spark, dir, "supplier")
        .filter(col("s_acctbal") < 0).select(col("s_suppkey"))
      val bridge = Tables(spark, dir, "lineitem")
        .select(col("l_partkey"), col("l_suppkey")).distinct()
        .join(broadcast(excl), col("l_suppkey") === col("s_suppkey"), "left_anti")
      bridge.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), col("p_type"), col("p_size"))
        .agg(countDistinct(col("l_suppkey")).cast("bigint").as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
    },
    Some("""SELECT p_brand, p_type, p_size,
              CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
            FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) b
            JOIN part ON l_partkey = p_partkey
            WHERE p_brand <> 'Brand#5' AND p_type <> 'MEDIUM'
              AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
              AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
            GROUP BY p_brand, p_type, p_size
            ORDER BY supplier_cnt DESC, p_brand, p_type, p_size"""))

  /** TPC-H Q20 (potential part promotion), adapted: no
    * partsupp.availqty, so the "excess stock" witness for a (supplier,
    * part) pair is 1997 shipments exceeding half the pair's all-time
    * shipments (exact integers: 2·q97 > qtotal, q97 > 0) over a
    * part-name class, for one nation's suppliers — the nested-agg +
    * semi-join shape is intact. Plan shape: per-pair partial+final
    * conditional sums, then a distinct-supplier semi join into the
    * nation-filtered dimension.
    */
  private val tpchQ20 = Q(
    "q_tpch_q20",
    (spark, dir) => {
      val p = Tables(spark, dir, "part")
        .filter(col("p_name").like("small %")).select(col("p_partkey"))
      val pair = Tables(spark, dir, "lineitem")
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .groupBy(col("l_suppkey"), col("l_partkey"))
        .agg(
          sum(when(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1998-01-01").cast("timestamp"),
            floor(col("l_quantity") + 0.5).cast("long")).otherwise(0L)).as("q97"),
          sum(floor(col("l_quantity") + 0.5).cast("long")).as("qtot"))
        .filter(col("q97") > 0 && col("q97") * 2 > col("qtot"))
        .select(col("l_suppkey")).distinct()
      Tables(spark, dir, "supplier")
        .filter(col("s_nationkey") === 3)
        .join(pair, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select(col("s_name"),
          floor(col("s_acctbal") * 100 + 0.5).cast("long").as("s_acctbal_c"))
        .orderBy(col("s_name"))
    },
    Some("""WITH pair AS (SELECT l_suppkey,
                   SUM(CASE WHEN l_shipdate >= TIMESTAMP '1997-01-01'
                             AND l_shipdate < TIMESTAMP '1998-01-01'
                            THEN CAST(FLOOR(l_quantity + 0.5) AS BIGINT)
                            ELSE 0 END) AS q97,
                   SUM(CAST(FLOOR(l_quantity + 0.5) AS BIGINT)) AS qtot
                 FROM lineitem JOIN part ON l_partkey = p_partkey
                 WHERE p_name LIKE 'small %'
                 GROUP BY l_suppkey, l_partkey)
            SELECT s_name, CAST(FLOOR(s_acctbal * 100 + 0.5) AS BIGINT) AS s_acctbal_c
            FROM supplier
            WHERE s_nationkey = 3
              AND s_suppkey IN (SELECT l_suppkey FROM pair
                                WHERE q97 > 0 AND q97 * 2 > qtot)
            ORDER BY s_name"""))

  /** TPC-H Q21 (suppliers who kept orders waiting), adapted: "late" is
    * shipping more than 90 days after the order date (no
    * receipt/commit dates), over finished ('F') orders. The spec's
    * exists/not-exists double self-join is REFORMULATED as one
    * aggregation per order — distinct suppliers, distinct LATE
    * suppliers, and the sole late supplier via MAX — keeping orders
    * with ≥ 2 suppliers and exactly 1 late one. Same answer, one
    * shuffle on orderkey instead of three lineitem self-joins: the
    * formulation you'd want at 100 TB.
    */
  private val tpchQ21 = Q(
    "q_tpch_q21",
    (spark, dir) => {
      val o = Tables(spark, dir, "orders")
        .filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey"), col("o_orderdate"))
      val late = col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS")
      val perOrder = Tables(spark, dir, "lineitem")
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"))
        .agg(
          countDistinct(col("l_suppkey")).as("n_supp"),
          countDistinct(when(late, col("l_suppkey"))).as("n_late"),
          max(when(late, col("l_suppkey"))).as("late_supp"))
        .filter(col("n_supp") >= 2 && col("n_late") === 1)
      perOrder.groupBy(col("late_supp"))
        .agg(count(lit(1)).cast("bigint").as("numwait"))
        .join(broadcast(Tables(spark, dir, "supplier")
          .select(col("s_suppkey"), col("s_name"))),
          col("late_supp") === col("s_suppkey"))
        .select(col("s_name"), col("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(100)
    },
    Some("""WITH perorder AS (SELECT l_orderkey,
                   COUNT(DISTINCT l_suppkey) AS n_supp,
                   COUNT(DISTINCT CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
                                       THEN l_suppkey END) AS n_late,
                   MAX(CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
                            THEN l_suppkey END) AS late_supp
                 FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                 WHERE o_orderstatus = 'F'
                 GROUP BY l_orderkey)
            SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
            FROM perorder JOIN supplier ON late_supp = s_suppkey
            WHERE n_supp >= 2 AND n_late = 1
            GROUP BY s_name
            ORDER BY numwait DESC, s_name LIMIT 100"""))

  val all: Seq[Q] = Seq(tpchQ3, tpchQ5, anova, ewma, tpchQ10, tpchQ7, tpchQ18,
    tpchQ6, tpchQ13, tpchQ14, tpchQ19, tpchQ22, tpchQ8, tpchQ15, tpchQ17,
    tpchQ1, tpchQ2, tpchQ4, tpchQ9, tpchQ11, tpchQ12, tpchQ16, tpchQ20, tpchQ21)
}
