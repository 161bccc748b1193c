package graft.operators

import graft.{Q, Tables}
import graft.functions.Portable.pround
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The relational operator inventory (SURVEY.md §2.3 [mr] rows): projection,
  * filter, aggregation, every join kind, sort/limit, set ops, rollup, window
  * functions and scalar-function queries — all plain DataFrame ops so that
  * Catalyst handles pushdown, pruning, join selection and partial
  * aggregation. Scale notes per query are in the Scaladoc.
  */
object Relational {

  /** σ/π — predicate + projection; both reach the parquet scan
    * (PushedFilters + ReadSchema), so at 100 TB this reads only 3 columns
    * of the row groups surviving min/max pruning.
    */
  private val filterProject = Q(
    "q_filter_project",
    (spark, dir) => {
      Tables(spark, dir, "lineitem")
        .filter(col("l_quantity") > 30)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
        // (l_orderkey, l_linenumber) is NOT unique in the synthetic data;
        // l_quantity joins the sort so the order is total over the output
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
    },
    Some("""SELECT l_orderkey, l_linenumber, l_quantity
            FROM lineitem WHERE l_quantity > 30
            ORDER BY l_orderkey, l_linenumber, l_quantity"""))

  /** TPC-H Q1 shape: hash aggregate with partial (map-side) aggregation —
    * the combiner the reference engine lacks. Four groups regardless of
    * scale, so the shuffle moves only num_partitions × 4 rows.
    */
  private val aggPricing = Q(
    "q_agg_pricing",
    (spark, dir) => {
      Tables(spark, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          // sums over the whole table: round at 2 decimals so the
          // accumulation-order float drift (~1e-6 at 1e9 magnitudes) stays
          // orders of magnitude inside the rounding boundary
          pround(sum(col("l_quantity")), 2).as("sum_qty"),
          pround(sum(col("l_extendedprice")), 2).as("sum_base"),
          pround(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc"),
          pround(avg(col("l_quantity")), 4).as("avg_qty"),
          count(lit(1)).as("cnt"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },
    Some("""SELECT l_returnflag, l_linestatus,
              FLOOR((SUM(l_quantity)) * 100 + 0.5) / 100 AS sum_qty,
              FLOOR((SUM(l_extendedprice)) * 100 + 0.5) / 100 AS sum_base,
              FLOOR((SUM(l_extendedprice * (1 - l_discount))) * 100 + 0.5) / 100 AS sum_disc,
              FLOOR((AVG(l_quantity)) * 10000 + 0.5) / 10000 AS avg_qty,
              CAST(COUNT(*) AS BIGINT) AS cnt
            FROM lineitem GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus"""))

  /** DISTINCT — a shuffle on the projected column only (pruned scan). */
  private val distinctQ = Q(
    "q_distinct",
    (spark, dir) =>
      Tables(spark, dir, "customer")
        .select(col("c_mktsegment"))
        .distinct()
        .orderBy(col("c_mktsegment")),
    Some("SELECT DISTINCT c_mktsegment FROM customer ORDER BY c_mktsegment"))

  /** Inner equi-join + aggregate. At scale both sides shuffle on the join
    * key (sort-merge / shuffled hash via AQE); the aggregate reuses the
    * join's hash partitioning on c_custkey, so no extra exchange.
    */
  private val joinEqui = Q(
    "q_join_equi",
    (spark, dir) => {
      val c = Tables(spark, dir, "customer")
      val o = Tables(spark, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "inner")
        .groupBy(col("c_custkey"), col("c_name"))
        .agg(
          count(lit(1)).as("n_orders"),
          pround(sum(col("o_totalprice")), 4).as("total_price"))
        .orderBy(col("c_custkey"))
    },
    Some("""SELECT c_custkey, c_name, CAST(COUNT(*) AS BIGINT) AS n_orders,
              FLOOR((SUM(o_totalprice)) * 10000 + 0.5) / 10000 AS total_price
            FROM customer JOIN orders ON c_custkey = o_custkey
            GROUP BY c_custkey, c_name ORDER BY c_custkey"""))

  /** Map-side (broadcast) join: region is 5 rows at any scale — the
    * explicit broadcast() guarantees no shuffle of the fact side.
    */
  private val joinBroadcast = Q(
    "q_join_broadcast",
    (spark, dir) => {
      val n = Tables(spark, dir, "nation")
      val r = Tables(spark, dir, "region")
      n.join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .select(col("n_name"), col("r_name"))
        .orderBy(col("n_name"))
    },
    Some("""SELECT n_name, r_name FROM nation JOIN region
            ON n_regionkey = r_regionkey ORDER BY n_name"""))

  /** Left semi join (EXISTS). The build side is only the join key column. */
  private val joinSemi = Q(
    "q_join_semi",
    (spark, dir) => {
      val c = Tables(spark, dir, "customer")
      val o = Tables(spark, dir, "orders").select(col("o_custkey"))
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    },
    Some("""SELECT c_custkey, c_name FROM customer c
            WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c.c_custkey)
            ORDER BY c_custkey"""))

  /** Left anti join (NOT EXISTS). */
  private val joinAnti = Q(
    "q_join_anti",
    (spark, dir) => {
      val c = Tables(spark, dir, "customer")
      val o = Tables(spark, dir, "orders").select(col("o_custkey"))
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    },
    Some("""SELECT c_custkey, c_name FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c.c_custkey)
            ORDER BY c_custkey"""))

  /** Global top-k: Spark plans TakeOrderedAndProject — per-partition top-k
    * then a k-row merge on the driver; no full sort at any scale. Ordering
    * is on the *rounded* price so both engines break ties identically.
    */
  private val topk = Q(
    "q_topk",
    (spark, dir) =>
      Tables(spark, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          pround(col("o_totalprice"), 4).as("price"))
        .orderBy(col("price").desc, col("o_orderkey"))
        .limit(10),
    Some("""SELECT o_orderkey, o_custkey, FLOOR((o_totalprice) * 10000 + 0.5) / 10000 AS price
            FROM orders ORDER BY price DESC, o_orderkey LIMIT 10"""))

  /** UNION / INTERSECT / EXCEPT in one tagged result. */
  private val setOps = Q(
    "q_set_ops",
    (spark, dir) => {
      val c = Tables(spark, dir, "customer").select(col("c_nationkey").as("k"))
      val s = Tables(spark, dir, "supplier").select(col("s_nationkey").as("k"))
      val u = c.union(s).distinct().withColumn("op", lit("union"))
      val i = c.intersect(s).withColumn("op", lit("intersect"))
      val e = c.except(s).withColumn("op", lit("except"))
      u.unionByName(i).unionByName(e)
        .select(col("op"), col("k"))
        .orderBy(col("op"), col("k"))
    },
    Some("""SELECT 'union' AS op, k FROM
              (SELECT c_nationkey AS k FROM customer UNION SELECT s_nationkey FROM supplier)
            UNION ALL
            SELECT 'intersect' AS op, k FROM
              (SELECT c_nationkey AS k FROM customer INTERSECT SELECT s_nationkey FROM supplier)
            UNION ALL
            SELECT 'except' AS op, k FROM
              (SELECT c_nationkey AS k FROM customer EXCEPT SELECT s_nationkey FROM supplier)
            ORDER BY op, k"""))

  /** Hierarchical aggregate (ROLLUP). NULL ordering pinned explicitly —
    * Spark sorts nulls first by default, DuckDB last.
    */
  private val rollupQ = Q(
    "q_rollup",
    (spark, dir) => {
      val n = Tables(spark, dir, "nation")
      val r = Tables(spark, dir, "region")
      n.join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(asc_nulls_first("r_name"), asc_nulls_first("n_name"))
    },
    Some("""SELECT r_name, n_name, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM nation JOIN region ON n_regionkey = r_regionkey
            GROUP BY ROLLUP(r_name, n_name)
            ORDER BY r_name NULLS FIRST, n_name NULLS FIRST"""))

  /** GROUPING SETS with grouping() indicators — exercised through the
    * engine's SQL surface (spark.sql over temp views) rather than the
    * DataFrame DSL, proving both entry points share one Catalyst plan.
    */
  private val groupingSets = Q(
    "q_grouping_sets",
    (spark, dir) => {
      Tables(spark, dir, "nation").createOrReplaceTempView("nation_v")
      Tables(spark, dir, "region").createOrReplaceTempView("region_v")
      spark.sql("""
        SELECT r_name, n_name,
          CAST(grouping(r_name) AS INT) AS g_r,
          CAST(grouping(n_name) AS INT) AS g_n,
          COUNT(*) AS cnt
        FROM nation_v JOIN region_v ON n_regionkey = r_regionkey
        GROUP BY GROUPING SETS ((r_name), (n_name), ())
        ORDER BY g_r, g_n, r_name NULLS FIRST, n_name NULLS FIRST""")
    },
    Some("""SELECT r_name, n_name,
              CAST(GROUPING(r_name) AS INT) AS g_r,
              CAST(GROUPING(n_name) AS INT) AS g_n,
              CAST(COUNT(*) AS BIGINT) AS cnt
            FROM nation JOIN region ON n_regionkey = r_regionkey
            GROUP BY GROUPING SETS ((r_name), (n_name), ())
            ORDER BY g_r, g_n, r_name NULLS FIRST, n_name NULLS FIRST"""))

  /** Ranking window: top-5 customers per market segment by balance. */
  private val windowRank = Q(
    "q_window_rank",
    (spark, dir) => {
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      Tables(spark, dir, "customer")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5)
        .select(col("c_mktsegment"), col("rn"), col("c_custkey"), col("c_name"))
        .orderBy(col("c_mktsegment"), col("rn"))
    },
    Some("""SELECT c_mktsegment, CAST(rn AS INT) AS rn, c_custkey, c_name FROM (
              SELECT c_mktsegment, c_custkey, c_name,
                row_number() OVER (PARTITION BY c_mktsegment
                  ORDER BY c_acctbal DESC, c_custkey) AS rn
              FROM customer)
            WHERE rn <= 5 ORDER BY c_mktsegment, rn"""))

  /** Analytic window with an explicit ROWS frame: per-customer running
    * revenue. Accumulation order is pinned by the window ORDER BY, so the
    * running double sum is bit-identical across engines.
    */
  private val windowRunning = Q(
    "q_window_running",
    (spark, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables(spark, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          pround(sum(col("o_totalprice")).over(w), 4).as("running"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },
    Some("""SELECT o_custkey, o_orderkey,
              FLOOR((SUM(o_totalprice) OVER (PARTITION BY o_custkey
                ORDER BY o_orderdate, o_orderkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) * 10000 + 0.5) / 10000 AS running
            FROM orders ORDER BY o_custkey, o_orderkey"""))

  /** String scalar functions: UPPER / SUBSTR / LENGTH / LIKE / concat. */
  private val stringFuncs = Q(
    "q_string_funcs",
    (spark, dir) =>
      Tables(spark, dir, "part")
        .filter(col("p_name").like("%a%"))
        .select(
          col("p_partkey"),
          upper(col("p_brand")).as("brand_u"),
          substring(col("p_name"), 1, 5).as("name5"),
          length(col("p_type")).cast("bigint").as("type_len"),
          concat_ws("-", col("p_brand"), col("p_type")).as("brand_type"))
        .orderBy(col("p_partkey")),
    Some("""SELECT p_partkey, UPPER(p_brand) AS brand_u,
              SUBSTR(p_name, 1, 5) AS name5,
              CAST(LENGTH(p_type) AS BIGINT) AS type_len,
              p_brand || '-' || p_type AS brand_type
            FROM part WHERE p_name LIKE '%a%' ORDER BY p_partkey"""))

  /** Date scalar functions: year/month extraction feeding an aggregate. */
  private val dateFuncs = Q(
    "q_date_funcs",
    (spark, dir) =>
      Tables(spark, dir, "orders")
        .groupBy(
          year(col("o_orderdate")).as("y"),
          month(col("o_orderdate")).as("m"))
        .agg(
          count(lit(1)).as("cnt"),
          pround(sum(col("o_totalprice")), 2).as("sum_price"))
        .orderBy(col("y"), col("m")),
    Some("""SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS y,
              CAST(EXTRACT(month FROM o_orderdate) AS INT) AS m,
              CAST(COUNT(*) AS BIGINT) AS cnt,
              FLOOR((SUM(o_totalprice)) * 100 + 0.5) / 100 AS sum_price
            FROM orders GROUP BY 1, 2 ORDER BY y, m"""))

  /** Math scalar functions: arithmetic, ABS, SQRT, ROUND over an aggregate. */
  private val mathFuncs = Q(
    "q_math_funcs",
    (spark, dir) =>
      Tables(spark, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          pround(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
          pround(avg(abs(col("l_tax") - col("l_discount"))), 4).as("avg_absdiff"),
          pround(sqrt(sum(col("l_quantity"))), 4).as("sqrt_qty"))
        .orderBy(col("l_returnflag")),
    Some("""SELECT l_returnflag,
              FLOOR((SUM(l_extendedprice * (1 - l_discount))) * 100 + 0.5) / 100 AS revenue,
              FLOOR((AVG(ABS(l_tax - l_discount))) * 10000 + 0.5) / 10000 AS avg_absdiff,
              FLOOR((SQRT(SUM(l_quantity))) * 10000 + 0.5) / 10000 AS sqrt_qty
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** Top-1 per group via ranking window — the scalable per-group top-k
    * shape (single shuffle on the partition key, no self-join).
    */
  private val topkPerGroup = Q(
    "q_topk_per_group",
    (spark, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables(spark, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("o_custkey"), col("o_orderkey"),
          pround(col("o_totalprice"), 4).as("price"))
        .orderBy(col("o_custkey"))
    },
    Some("""SELECT o_custkey, o_orderkey, FLOOR((o_totalprice) * 10000 + 0.5) / 10000 AS price
            FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                    row_number() OVER (PARTITION BY o_custkey
                      ORDER BY o_totalprice DESC, o_orderkey) AS rn
                  FROM orders)
            WHERE rn = 1 ORDER BY o_custkey"""))

  /** CUBE — all grouping-set combinations; NULLS FIRST pinned like rollup. */
  private val cubeQ = Q(
    "q_cube",
    (spark, dir) => {
      val n = Tables(spark, dir, "nation")
      val r = Tables(spark, dir, "region")
      n.join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .cube(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(asc_nulls_first("r_name"), asc_nulls_first("n_name"))
    },
    Some("""SELECT r_name, n_name, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM nation JOIN region ON n_regionkey = r_regionkey
            GROUP BY CUBE(r_name, n_name)
            ORDER BY r_name NULLS FIRST, n_name NULLS FIRST"""))

  /** Analytic window battery: lag/lead (offsets), ntile, percent_rank, and
    * a default RANGE frame (peers share the running value).
    */
  private val windowAnalytics = Q(
    "q_window_analytics",
    (spark, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      Tables(spark, dir, "orders")
        .select(
          col("o_custkey"), col("o_orderkey"),
          pround(lag(col("o_totalprice"), 1).over(w), 4).as("prev_price"),
          pround(lead(col("o_totalprice"), 1).over(w), 4).as("next_price"),
          ntile(4).over(w).as("quartile"),
          pround(percent_rank().over(w), 4).as("pct_rank"),
          pround(sum(col("o_totalprice"))
            .over(Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"))), 4)
            .as("range_sum"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },
    Some("""SELECT o_custkey, o_orderkey,
              FLOOR((lag(o_totalprice, 1) OVER w) * 10000 + 0.5) / 10000 AS prev_price,
              FLOOR((lead(o_totalprice, 1) OVER w) * 10000 + 0.5) / 10000 AS next_price,
              CAST(ntile(4) OVER w AS INT) AS quartile,
              FLOOR((percent_rank() OVER w) * 10000 + 0.5) / 10000 AS pct_rank,
              FLOOR((SUM(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate
                RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) * 10000 + 0.5) / 10000 AS range_sum
            FROM orders
            WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
            ORDER BY o_custkey, o_orderkey"""))

  /** PIVOT: per-year order counts spread across status columns (Spark's
    * pivot with explicit values; the oracle states the same contract as
    * filtered aggregation).
    */
  private val pivotQ = Q(
    "q_pivot",
    (spark, dir) =>
      Tables(spark, dir, "orders")
        .groupBy(year(col("o_orderdate")).as("y"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .select(col("y"),
          coalesce(col("F"), lit(0L)).as("cnt_f"),
          coalesce(col("O"), lit(0L)).as("cnt_o"),
          coalesce(col("P"), lit(0L)).as("cnt_p"))
        .orderBy(col("y")),
    Some("""SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS y,
              CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS cnt_f,
              CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS cnt_o,
              CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS cnt_p
            FROM orders GROUP BY 1 ORDER BY y"""))

  /** Full outer join: per-nation customer vs supplier counts — nations
    * present on only one side survive with NULL on the other (the join
    * family's missing member next to inner/broadcast/semi/anti/asof/
    * range/salted).
    */
  private val joinOuter = Q(
    "q_join_outer",
    (spark, dir) => {
      val c = Tables(spark, dir, "customer")
        .groupBy(col("c_nationkey").as("k")).agg(count(lit(1)).as("n_cust"))
      val s = Tables(spark, dir, "supplier")
        .groupBy(col("s_nationkey").as("k")).agg(count(lit(1)).as("n_supp"))
      c.join(s, Seq("k"), "full_outer")
        .select(col("k"), col("n_cust"), col("n_supp"))
        .orderBy(col("k"))
    },
    Some("""SELECT COALESCE(c.k, s.k) AS k, c.n_cust, s.n_supp
            FROM (SELECT c_nationkey AS k, CAST(COUNT(*) AS BIGINT) AS n_cust
                  FROM customer GROUP BY 1) c
            FULL OUTER JOIN (SELECT s_nationkey AS k, CAST(COUNT(*) AS BIGINT) AS n_supp
                             FROM supplier GROUP BY 1) s
              ON c.k = s.k
            ORDER BY k"""))

  /** Bag-semantics set operations (UNION ALL / INTERSECT ALL / EXCEPT
    * ALL): multiplicities preserved, unlike q_set_ops' set semantics.
    */
  private val setOpsAll = Q(
    "q_set_ops_all",
    (spark, dir) => {
      val c = Tables(spark, dir, "customer").select(col("c_nationkey").as("k"))
      val s = Tables(spark, dir, "supplier").select(col("s_nationkey").as("k"))
      val u = c.unionAll(s).withColumn("op", lit("union_all"))
      val i = c.intersectAll(s).withColumn("op", lit("intersect_all"))
      val e = c.exceptAll(s).withColumn("op", lit("except_all"))
      u.unionByName(i).unionByName(e)
        .select(col("op"), col("k"))
        .orderBy(col("op"), col("k"))
    },
    Some("""SELECT 'union_all' AS op, k FROM
              (SELECT c_nationkey AS k FROM customer UNION ALL SELECT s_nationkey FROM supplier)
            UNION ALL
            SELECT 'intersect_all' AS op, k FROM
              (SELECT c_nationkey AS k FROM customer INTERSECT ALL SELECT s_nationkey FROM supplier)
            UNION ALL
            SELECT 'except_all' AS op, k FROM
              (SELECT c_nationkey AS k FROM customer EXCEPT ALL SELECT s_nationkey FROM supplier)
            ORDER BY op, k"""))

  /** Unpivot (melt): wide measure columns to (metric, value) rows — the
    * inverse of q_pivot, all measures double so the melted column is
    * type-stable. Values pass through untouched (no arithmetic), so the
    * hash compare is exact.
    */
  private val unpivotQ = Q(
    "q_unpivot",
    (spark, dir) =>
      Tables(spark, dir, "lineitem")
        .filter(col("l_orderkey") < 50)
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_extendedprice"), col("l_discount")),
          "metric", "value")
        // (l_orderkey, l_linenumber) is NOT unique in the synthetic data
        // — value joins the sort to keep the order total
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("metric"), col("value")),
    Some("""SELECT l_orderkey, l_linenumber, metric, value FROM (
              SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric, l_quantity AS value
              FROM lineitem WHERE l_orderkey < 50
              UNION ALL
              SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice
              FROM lineitem WHERE l_orderkey < 50
              UNION ALL
              SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
              FROM lineitem WHERE l_orderkey < 50)
            ORDER BY l_orderkey, l_linenumber, metric, value"""))

  /** Navigation window functions with explicit full-partition frames:
    * first/last/nth order per customer plus cume_dist. The frame is
    * spelled out (ROWS UNBOUNDED PRECEDING..UNBOUNDED FOLLOWING) because
    * last_value/nth_value under the default frame see only the prefix.
    */
  private val windowFrames = Q(
    "q_window_frames",
    (spark, dir) => {
      val order = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val full = order.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables(spark, dir, "orders")
        .filter(col("o_custkey") < 50)
        .select(col("o_custkey"), col("o_orderkey"),
          first(col("o_orderkey")).over(full).as("first_order"),
          last(col("o_orderkey")).over(full).as("last_order"),
          nth_value(col("o_orderkey"), 2).over(full).as("second_order"),
          pround(cume_dist().over(order), 4).as("cd"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },
    Some("""SELECT o_custkey, o_orderkey,
              first_value(o_orderkey) OVER w_full AS first_order,
              last_value(o_orderkey) OVER w_full AS last_order,
              nth_value(o_orderkey, 2) OVER w_full AS second_order,
              FLOOR((cume_dist() OVER w_ord) * 10000 + 0.5) / 10000 AS cd
            FROM orders WHERE o_custkey < 50
            WINDOW
              w_ord AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
              w_full AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
            ORDER BY o_custkey, o_orderkey"""))

  /** Explicit cartesian product over two broadcast-sized dims — the only
    * join kind still missing from the declared surface. Deliberately
    * bounded: a cross join is only ever sane when at least one side is
    * tiny (Catalyst plans BroadcastNestedLoopJoin); big-big cartesian at
    * scale is a design error, not an operator gap.
    */
  private val crossJoin = Q(
    "q_cross_join",
    (spark, dir) => {
      val r = Tables(spark, dir, "region").select(col("r_regionkey"), col("r_name"))
      val n = Tables(spark, dir, "nation").select(col("n_nationkey"), col("n_name"))
      r.crossJoin(n)
        .select(col("r_name"), col("n_name"),
          (col("r_regionkey") * 100 + col("n_nationkey")).as("pair_id"))
        .orderBy(col("pair_id"))
    },
    Some("""SELECT r_name, n_name, r_regionkey * 100 + n_nationkey AS pair_id
            FROM region CROSS JOIN nation ORDER BY pair_id"""))

  /** Ordered string aggregation (LISTAGG / string_agg): per-region
    * comma-joined nation roster. `collect_list` has no deterministic
    * order under shuffles, so the list is `array_sort`ed before joining —
    * the portable spelling of `string_agg(... ORDER BY ...)`. Per-group
    * state is the group's values (bounded by group cardinality, like any
    * listagg); at 100 TB you'd cap roster groups or pre-aggregate, which
    * the nation/region shape models.
    */
  private val stringAgg = Q(
    "q_string_agg",
    (spark, dir) => {
      val r = Tables(spark, dir, "region").select(col("r_regionkey"), col("r_name"))
      val n = Tables(spark, dir, "nation").select(col("n_regionkey"), col("n_name"))
      r.join(n, col("r_regionkey") === col("n_regionkey"))
        .groupBy(col("r_name"))
        .agg(
          concat_ws(",", array_sort(collect_list(col("n_name")))).as("nations"),
          count(lit(1)).as("n_nations"))
        .orderBy(col("r_name"))
    },
    Some("""SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations,
              CAST(COUNT(*) AS BIGINT) AS n_nations
            FROM region JOIN nation ON r_regionkey = n_regionkey
            GROUP BY r_name ORDER BY r_name"""))

  /** argmin/argmax with a deterministic tiebreak: per market segment, the
    * customer holding the max (and min) account balance. Spark's
    * `max_by`/`min_by` are tie-nondeterministic, so both sides use the
    * lexicographic struct-extremum idiom (compare (balance, name), then
    * project the name) — same trick as q_mode. One partial+final
    * aggregate, constant state per group: safe at any scale.
    */
  private val argMinMax = Q(
    "q_argminmax",
    (spark, dir) => {
      Tables(spark, dir, "customer")
        .groupBy(col("c_mktsegment"))
        .agg(
          max(struct(col("c_acctbal"), col("c_name"))).as("mx"),
          min(struct(col("c_acctbal"), col("c_name"))).as("mn"))
        .select(col("c_mktsegment"),
          col("mx.c_name").as("top_name"),
          pround(col("mx.c_acctbal"), 4).as("top_bal"),
          col("mn.c_name").as("bot_name"),
          pround(col("mn.c_acctbal"), 4).as("bot_bal"))
        .orderBy(col("c_mktsegment"))
    },
    Some("""WITH rk AS (SELECT c_mktsegment, c_name, c_acctbal,
              ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                ORDER BY c_acctbal DESC, c_name DESC) AS rmax,
              ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                ORDER BY c_acctbal ASC, c_name ASC) AS rmin
            FROM customer)
            SELECT c_mktsegment,
              MAX(CASE WHEN rmax = 1 THEN c_name END) AS top_name,
              FLOOR(MAX(CASE WHEN rmax = 1 THEN c_acctbal END) * 10000 + 0.5) / 10000 AS top_bal,
              MAX(CASE WHEN rmin = 1 THEN c_name END) AS bot_name,
              FLOOR(MAX(CASE WHEN rmin = 1 THEN c_acctbal END) * 10000 + 0.5) / 10000 AS bot_bal
            FROM rk GROUP BY c_mktsegment ORDER BY c_mktsegment"""))

  /** 2-D Pareto skyline (dominance query): orders not dominated on
    * (earlier date, higher price) — o' dominates o iff date' ≤ date and
    * price' ≥ price with one strict. Computed scale-safely: per-date
    * maxima by hash aggregate (distributed), a strict-prefix running max
    * over the *bounded date domain* (a ~2.4k-row window, the histogram
    * idiom — never a global sort of the table), then a broadcast join
    * back for a map-side dominance filter: o survives iff its price
    * beats every strictly-earlier date's max and matches its own date's
    * max. Equal (date, price) duplicates dominate neither and both
    * survive, which the oracle replays with the same prefix-max CTE.
    */
  private val skyline = Q(
    "q_skyline",
    (spark, dir) => {
      val o = Tables(spark, dir, "orders")
        .select(col("o_orderkey"), col("o_orderdate"), col("o_totalprice"))
      val perDate = o.groupBy(col("o_orderdate").as("d"))
        .agg(max(col("o_totalprice")).as("dmax"))
      val wPrefix = Window.orderBy(col("d"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val prefix = perDate.withColumn("prevmax",
        coalesce(max(col("dmax")).over(wPrefix), lit(Double.MinValue)))
      o.join(broadcast(prefix), col("o_orderdate") === col("d"))
        .filter(col("o_totalprice") > col("prevmax") &&
          col("o_totalprice") === col("dmax"))
        .select(col("o_orderkey"), col("o_orderdate"),
          pround(col("o_totalprice"), 4).as("price"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
    },
    Some("""WITH pd AS (SELECT o_orderdate AS d, MAX(o_totalprice) AS dmax
                        FROM orders GROUP BY o_orderdate),
            pf AS (SELECT d, dmax,
                     COALESCE(MAX(dmax) OVER (ORDER BY d
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       -1.7976931348623157e308) AS prevmax
                   FROM pd)
            SELECT o_orderkey, o_orderdate,
              FLOOR(o_totalprice * 10000 + 0.5) / 10000 AS price
            FROM orders JOIN pf ON o_orderdate = pf.d
            WHERE o_totalprice > prevmax AND o_totalprice = dmax
            ORDER BY o_orderdate, o_orderkey"""))

  /** Lag-1 autocorrelation of the daily revenue series — the time-series
    * screening statistic. Daily totals are one distributed hash
    * aggregate; the lagged pairing is a self-join of the ~2.4k-row daily
    * series on date+1 (broadcast both sides at any scale); corr runs over
    * that bounded relation. Spark and DuckDB both implement sample
    * correlation (q_stats_agg precedent), and the normalization keeps
    * summation-order ulp inside pround(4).
    */
  private val autocorr = Q(
    "q_autocorr",
    (spark, dir) => {
      val daily = Tables(spark, dir, "orders")
        .groupBy(col("o_orderdate").as("d"))
        .agg(sum(col("o_totalprice")).as("rev"))
      val lagged = daily.select((col("d") - expr("INTERVAL 1 DAY")).as("d"),
        col("rev").as("rev_next"))
      daily.join(lagged, "d")
        .agg(count(lit(1)).as("n_pairs"),
          pround(corr(col("rev"), col("rev_next")), 4).as("autocorr_lag1"))
    },
    Some("""WITH daily AS (SELECT o_orderdate AS d, SUM(o_totalprice) AS rev
                           FROM orders GROUP BY o_orderdate),
            pairs AS (SELECT a.rev, b.rev AS rev_next
                      FROM daily a JOIN daily b ON b.d = a.d + INTERVAL 1 DAY)
            SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
              FLOOR((corr(rev, rev_next)) * 10000 + 0.5) / 10000 AS autocorr_lag1
            FROM pairs"""))

  /** 7-day trailing moving average of daily revenue. Revenue funnels
    * through exact integer cents (per-order FLOOR(price·100+0.5)), so the
    * windowed sums are bit-identical on both engines and only the final
    * division is float. The unpartitioned window runs over the bounded
    * daily series (date-domain histogram idiom — ~2.4k rows regardless of
    * table size; the per-day aggregate underneath is partial+final and
    * fully distributed).
    */
  private val rollingAvg = Q(
    "q_rolling_avg",
    (spark, dir) => {
      val daily = Tables(spark, dir, "orders")
        .groupBy(col("o_orderdate").as("d"))
        .agg(sum(floor(col("o_totalprice") * 100 + 0.5).cast("long"))
          .cast("bigint").as("cents"))
      val w = Window.orderBy(col("d")).rowsBetween(-6, 0)
      daily.select(col("d"), col("cents"),
          pround(sum(col("cents")).over(w).cast("double") /
            count(lit(1)).over(w).cast("double"), 2).as("ma7_cents"))
        .orderBy(col("d"))
    },
    Some("""WITH daily AS (SELECT o_orderdate AS d,
                  CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
                FROM orders GROUP BY 1)
            SELECT d, cents,
              FLOOR((CAST(SUM(cents) OVER w AS DOUBLE)
                / CAST(COUNT(*) OVER w AS DOUBLE)) * 100 + 0.5) / 100 AS ma7_cents
            FROM daily
            WINDOW w AS (ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
            ORDER BY d"""))

  val all: Seq[Q] = Seq(
    filterProject, aggPricing, distinctQ, joinEqui, joinBroadcast, joinSemi,
    joinAnti, topk, setOps, rollupQ, cubeQ, groupingSets, windowRank, windowRunning,
    windowAnalytics, pivotQ, stringFuncs, dateFuncs, mathFuncs, topkPerGroup,
    windowFrames, joinOuter, setOpsAll, unpivotQ, crossJoin, stringAgg, argMinMax,
    skyline, autocorr, rollingAvg)
}
