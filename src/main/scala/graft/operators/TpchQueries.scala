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

  val all: Seq[Q] = Seq(tpchQ3, tpchQ5, anova, ewma, tpchQ10, tpchQ7, tpchQ18,
    tpchQ6, tpchQ13, tpchQ14, tpchQ19, tpchQ22, tpchQ8, tpchQ15, tpchQ17)
}
