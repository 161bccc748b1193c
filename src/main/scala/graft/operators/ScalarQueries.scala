package graft.operators

import graft.{Q, Tables}
import graft.functions.Portable.pround
import org.apache.spark.sql.expressions.Window
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

  /** Approximate distinct (HLL++). HLL sketches aren't bit-compatible
    * across engines (SURVEY.md §7.3), so the estimate itself can't be
    * hash-compared — instead the query emits the oracle-checkable exact
    * counts alongside a bound-check flag asserting the HLL estimate lands
    * within a declared ±5% relative error (sketch precision rsd = 0.01,
    * so the bound carries real margin at small cardinalities); the
    * DuckDB oracle asserts the flag is 1. A drifting sketch turns the
    * flag to 0 and fails the hash gate, so the approximation accuracy is
    * genuinely driver-checked, not merely declared.
    */
  private val approxDistinct = Q(
    "q_approx_distinct",
    (spark, dir) =>
      Tables(spark, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_partkey")).as("exact_parts"),
          countDistinct(col("l_orderkey")).as("exact_orders"),
          approx_count_distinct(col("l_partkey"), 0.01).as("ap"),
          approx_count_distinct(col("l_orderkey"), 0.01).as("ao"))
        .select(col("l_returnflag"), col("exact_parts"), col("exact_orders"),
          ((abs(col("ap") - col("exact_parts")) / col("exact_parts") <= 0.05) &&
            (abs(col("ao") - col("exact_orders")) / col("exact_orders") <= 0.05))
            .cast("int").as("approx_within_5pct"))
        .orderBy(col("l_returnflag")),
    Some("""SELECT l_returnflag,
              CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
              CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
              CAST(1 AS INT) AS approx_within_5pct
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** Statistical aggregates: stddev/variance/correlation/covariance.
    * Accumulation-order drift is ~1e-12 relative; pround absorbs it.
    */
  private val statsAgg = Q(
    "q_stats_agg",
    (spark, dir) =>
      Tables(spark, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          pround(stddev_samp(col("l_quantity")), 4).as("sd_qty"),
          pround(var_samp(col("l_quantity")), 4).as("var_qty"),
          pround(corr(col("l_quantity"), col("l_extendedprice")), 4).as("corr_qp"),
          pround(covar_samp(col("l_quantity"), col("l_extendedprice")), 2).as("covar_qp"))
        .orderBy(col("l_returnflag")),
    Some("""SELECT l_returnflag,
              FLOOR((stddev_samp(l_quantity)) * 10000 + 0.5) / 10000 AS sd_qty,
              FLOOR((var_samp(l_quantity)) * 10000 + 0.5) / 10000 AS var_qty,
              FLOOR((corr(l_quantity, l_extendedprice)) * 10000 + 0.5) / 10000 AS corr_qp,
              FLOOR((covar_samp(l_quantity, l_extendedprice)) * 100 + 0.5) / 100 AS covar_qp
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** Exact interpolated percentiles — same definition as Spark's
    * `percentile` / DuckDB's `quantile_cont` (linear interpolation on
    * the sorted values), but computed DISTRIBUTED via
    * `Ranks.exactPercentiles` (sort + row-number arithmetic) instead of
    * the built-in aggregate, which buffers every group value in one
    * aggregation buffer and OOMs once a group outgrows an executor. One
    * sorted pass per measure; no task ever holds a whole group.
    */
  private val percentile = Q(
    "q_percentile",
    (spark, dir) => {
      val li = Tables(spark, dir, "lineitem")
      val qty = graft.functions.Ranks
        .exactPercentiles(li, "l_returnflag", "l_quantity", Seq(0.25, 0.5, 0.9))
        .groupBy(col("l_returnflag"))
        .agg(
          pround(min(when(col("p") === 0.25, col("v"))), 4).as("p25"),
          pround(min(when(col("p") === 0.5, col("v"))), 4).as("p50"),
          pround(min(when(col("p") === 0.9, col("v"))), 4).as("p90"))
      val price = graft.functions.Ranks
        .exactPercentiles(li, "l_returnflag", "l_extendedprice", Seq(0.5))
        .select(col("l_returnflag"), pround(col("v"), 2).as("p50_price"))
      qty.join(price, "l_returnflag").orderBy(col("l_returnflag"))
    },
    Some("""SELECT l_returnflag,
              FLOOR((quantile_cont(l_quantity, 0.25)) * 10000 + 0.5) / 10000 AS p25,
              FLOOR((quantile_cont(l_quantity, 0.5)) * 10000 + 0.5) / 10000 AS p50,
              FLOOR((quantile_cont(l_quantity, 0.9)) * 10000 + 0.5) / 10000 AS p90,
              FLOOR((quantile_cont(l_extendedprice, 0.5)) * 100 + 0.5) / 100 AS p50_price
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** Scale-safe approximate percentiles — the 100 TB twin of q_percentile.
    * Spark's exact `percentile` buffers every group value in one
    * aggregation buffer (executor OOM at scale, SCALE.md); engine-native
    * sketches (approx_percentile / approx_quantile) aren't cross-engine
    * comparable. This takes the portable middle path: a fixed-grid
    * histogram (unit-width bins — one partial+final count aggregate), a
    * cumulative window over the ~50-row histogram (NOT the raw table),
    * and the percentile approximated as the first bin whose cumulative
    * count crosses q*N. Deterministic in both engines, so the hash gate
    * checks it exactly; error is bounded by the bin width by construction.
    */
  private val percentileApprox = Q(
    "q_percentile_approx",
    (spark, dir) => {
      val hist = Tables(spark, dir, "lineitem")
        .groupBy(col("l_returnflag").as("flag"),
          floor(col("l_quantity")).cast("bigint").as("bin"))
        .agg(count(lit(1)).as("c"))
      val byFlag = Window.partitionBy(col("flag"))
      // null-ordering pinned explicitly (determinism rule 7)
      hist
        .withColumn("cum", sum(col("c")).over(byFlag.orderBy(col("bin").asc_nulls_first)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("n", sum(col("c")).over(byFlag))
        .groupBy(col("flag"))
        .agg(
          min(when(col("cum") >= col("n") * 0.25, col("bin"))).as("p25_bin"),
          min(when(col("cum") >= col("n") * 0.5, col("bin"))).as("p50_bin"),
          min(when(col("cum") >= col("n") * 0.9, col("bin"))).as("p90_bin"))
        .orderBy(col("flag"))
    },
    Some("""WITH h AS (SELECT l_returnflag AS flag, CAST(FLOOR(l_quantity) AS BIGINT) AS bin,
                  CAST(COUNT(*) AS BIGINT) AS c
                FROM lineitem GROUP BY 1, 2),
            cum AS (SELECT flag, bin,
                  CAST(SUM(c) OVER (PARTITION BY flag ORDER BY bin NULLS FIRST
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
                  CAST(SUM(c) OVER (PARTITION BY flag) AS BIGINT) AS n
                FROM h)
            SELECT flag,
              MIN(CASE WHEN cum >= n * 0.25 THEN bin END) AS p25_bin,
              MIN(CASE WHEN cum >= n * 0.5 THEN bin END) AS p50_bin,
              MIN(CASE WHEN cum >= n * 0.9 THEN bin END) AS p90_bin
            FROM cum GROUP BY flag ORDER BY flag"""))

  /** Second string-function battery: pad/replace/reverse/left. */
  private val stringFuncs2 = Q(
    "q_string_funcs2",
    (spark, dir) =>
      Tables(spark, dir, "customer")
        .select(
          col("c_custkey"),
          lpad(col("c_custkey").cast("string"), 8, "0").as("key_pad"),
          regexp_replace(col("c_name"), "Customer", "Cust").as("short_name"),
          reverse(col("c_mktsegment")).as("seg_rev"),
          expr("left(c_name, 4)").as("name4"))
        .orderBy(col("c_custkey")),
    Some("""SELECT c_custkey, lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS key_pad,
              replace(c_name, 'Customer', 'Cust') AS short_name,
              reverse(c_mktsegment) AS seg_rev,
              left(c_name, 4) AS name4
            FROM customer ORDER BY c_custkey"""))

  /** Second date battery: month truncation, day arithmetic, day-of-week,
    * month end. Engines' dow origins differ (Spark 1=Sun, DuckDB 0=Sun) —
    * normalized explicitly.
    */
  private val dateFuncs2 = Q(
    "q_date_funcs2",
    (spark, dir) =>
      Tables(spark, dir, "orders")
        .select(
          col("o_orderkey"),
          to_date(date_trunc("month", col("o_orderdate"))).as("month_start"),
          datediff(col("o_orderdate"), lit("1992-01-01")).as("days_since"),
          dayofweek(col("o_orderdate")).as("dow"),
          last_day(col("o_orderdate")).as("month_end"))
        .orderBy(col("o_orderkey")),
    Some("""SELECT o_orderkey,
              CAST(date_trunc('month', CAST(o_orderdate AS TIMESTAMP)) AS DATE) AS month_start,
              CAST(date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS INT) AS days_since,
              CAST(EXTRACT(dow FROM o_orderdate) + 1 AS INT) AS dow,
              last_day(CAST(o_orderdate AS DATE)) AS month_end
            FROM orders ORDER BY o_orderkey"""))

  /** MapType surface: per-lang source→count maps built with
    * map_from_entries, probed with element_at (missing key → NULL), and
    * enumerated via sorted map_keys. The map is assembled from a grouped
    * aggregate, so construction order never affects the declared output.
    */
  private val mapFuncs = Q(
    "q_map_funcs",
    (spark, dir) => {
      val counts = Tables(spark, dir, "documents")
        .groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("cnt"))
      counts
        .groupBy(col("lang"))
        .agg(map_from_entries(collect_list(struct(col("source"), col("cnt")))).as("m"))
        .select(col("lang"),
          size(col("m")).as("n_sources"),
          element_at(col("m"), "src0").as("src0_cnt"),
          element_at(col("m"), "no_such_source").as("missing_cnt"),
          concat_ws(",", sort_array(map_keys(col("m")))).as("sources"))
        .orderBy(col("lang"))
    },
    Some("""WITH c AS (SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS cnt
                       FROM documents GROUP BY lang, source)
            SELECT lang, CAST(COUNT(*) AS INT) AS n_sources,
              MAX(CASE WHEN source = 'src0' THEN cnt END) AS src0_cnt,
              CAST(NULL AS BIGINT) AS missing_cnt,
              string_agg(source, ',' ORDER BY source) AS sources
            FROM c GROUP BY lang ORDER BY lang"""))

  /** StructType surface: argmax via lexicographic struct max —
    * max(struct(price, orderkey)) picks the highest price and breaks ties
    * on the highest orderkey, then getField projects the components back
    * out. The oracle replays the identical tiebreak with a ranking window.
    */
  private val structFuncs = Q(
    "q_struct_funcs",
    (spark, dir) =>
      Tables(spark, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(max(struct(col("o_totalprice"), col("o_orderkey"))).as("best"),
          count(lit(1)).as("n_orders"))
        .select(col("o_custkey"),
          col("best").getField("o_orderkey").as("best_order"),
          pround(col("best").getField("o_totalprice"), 2).as("best_price"),
          col("n_orders"))
        .orderBy(col("o_custkey")),
    Some("""SELECT o_custkey, o_orderkey AS best_order,
              FLOOR((o_totalprice) * 100 + 0.5) / 100 AS best_price, n_orders
            FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                    CAST(COUNT(*) OVER (PARTITION BY o_custkey) AS BIGINT) AS n_orders,
                    row_number() OVER (PARTITION BY o_custkey
                      ORDER BY o_totalprice DESC, o_orderkey DESC) AS rn
                  FROM orders)
            WHERE rn = 1 ORDER BY o_custkey"""))

  /** Bitwise function battery: popcount, shifts, and/or/xor. (Spark
    * bitwiseXOR == DuckDB xor — rule 5 of the portable-hashing
    * discipline, here declared as a user-facing capability.)
    */
  private val bitFuncs = Q(
    "q_bit_funcs",
    (spark, dir) =>
      Tables(spark, dir, "lineitem")
        .filter(col("l_orderkey") < 100)
        .select(col("l_orderkey"), col("l_linenumber"),
          bit_count(col("l_partkey")).cast("int").as("bits"),
          shiftleft(col("l_linenumber"), 2).cast("int").as("shl"),
          shiftright(col("l_partkey"), 1).as("shr"),
          col("l_partkey").bitwiseAND(lit(255L)).as("band"),
          col("l_partkey").bitwiseOR(lit(255L)).as("bor"),
          col("l_partkey").bitwiseXOR(lit(255L)).as("bxor"))
        // bxor is injective in l_partkey, making the sort total over the
        // non-unique (l_orderkey, l_linenumber) pairs
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("bxor")),
    Some("""SELECT l_orderkey, l_linenumber,
              CAST(bit_count(l_partkey) AS INT) AS bits,
              CAST(l_linenumber << 2 AS INT) AS shl,
              l_partkey >> 1 AS shr,
              l_partkey & 255 AS band,
              l_partkey | 255 AS bor,
              xor(l_partkey, 255) AS bxor
            FROM lineitem WHERE l_orderkey < 100
            ORDER BY l_orderkey, l_linenumber, bxor"""))

  /** Second array battery: sort, reverse, min/max, position/contains,
    * concat — pure element shuffling and comparisons on float arrays, no
    * arithmetic, so cross-engine equality is exact. (array_distinct is
    * compared through sort_array: DuckDB's list_distinct does not
    * preserve first-occurrence order.)
    *
    * Array-valued results are serialized to fixed-point CSV strings
    * (FLOOR(x*10^4+0.5) integers joined with ',') — the driver's checker
    * sorts result columns with pandas, which cannot hash raw arrays, and
    * float→string formatting is not portable across engines while
    * integer→string is. Same discipline as q_inverted_index.
    */
  private val arrayFuncs2 = Q(
    "q_array_funcs2",
    (spark, dir) => {
      val e4 = slice(col("embedding"), 1, 4)
      import graft.functions.Portable.pcsv
      Tables(spark, dir, "embeddings")
        .filter(col("vec_id") < 100)
        .select(col("vec_id"),
          pcsv(array_sort(e4), 4).as("sorted4"),
          pcsv(reverse(e4), 4).as("rev4"),
          array_max(e4).as("max4"),
          array_min(e4).as("min4"),
          array_position(e4, element_at(col("embedding"), 3)).cast("int").as("pos3"),
          array_contains(e4, element_at(col("embedding"), 1)).cast("int").as("has1"),
          size(concat(e4, slice(col("embedding"), 5, 2))).as("cat6"))
        .orderBy(col("vec_id"))
    },
    Some("""SELECT vec_id,
              array_to_string(list_transform(CAST(list_sort(embedding[1:4]) AS DOUBLE[]),
                x -> CAST(CAST(FLOOR(x * 10000 + 0.5) AS BIGINT) AS VARCHAR)), ',') AS sorted4,
              array_to_string(list_transform(CAST(list_reverse(embedding[1:4]) AS DOUBLE[]),
                x -> CAST(CAST(FLOOR(x * 10000 + 0.5) AS BIGINT) AS VARCHAR)), ',') AS rev4,
              list_max(embedding[1:4]) AS max4,
              list_min(embedding[1:4]) AS min4,
              list_position(embedding[1:4], embedding[3]) AS pos3,
              CAST(CASE WHEN list_contains(embedding[1:4], embedding[1])
                   THEN 1 ELSE 0 END AS INT) AS has1,
              CAST(len(list_concat(embedding[1:4], embedding[5:6])) AS INT) AS cat6
            FROM embeddings WHERE vec_id < 100 ORDER BY vec_id"""))

  /** Third string battery: padding, translate, repeat, reverse,
    * split_part, position, left/right.
    */
  private val stringFuncs3 = Q(
    "q_string_funcs3",
    (spark, dir) =>
      Tables(spark, dir, "part")
        .select(col("p_partkey"),
          lpad(col("p_brand"), 12, "*").as("lp"),
          rpad(col("p_brand"), 12, "*").as("rp"),
          translate(col("p_type"), "ae", "@3").as("tr"),
          repeat(col("p_brand"), 2).as("rep"),
          reverse(col("p_name")).as("rev"),
          expr("split_part(p_type, ' ', 1)").as("first_word"),
          locate("a", col("p_name")).cast("int").as("pos_a"),
          expr("left(p_name, 4)").as("l4"),
          expr("right(p_name, 4)").as("r4"))
        .orderBy(col("p_partkey")),
    Some("""SELECT p_partkey,
              lpad(p_brand, 12, '*') AS lp,
              rpad(p_brand, 12, '*') AS rp,
              translate(p_type, 'ae', '@3') AS tr,
              repeat(p_brand, 2) AS rep,
              reverse(p_name) AS rev,
              split_part(p_type, ' ', 1) AS first_word,
              CAST(strpos(p_name, 'a') AS INT) AS pos_a,
              left(p_name, 4) AS l4,
              right(p_name, 4) AS r4
            FROM part ORDER BY p_partkey"""))

  /** Third date battery: interval arithmetic, add_months, quarter
    * extraction and truncation, month spans.
    */
  private val dateFuncs3 = Q(
    "q_date_funcs3",
    (spark, dir) =>
      Tables(spark, dir, "orders")
        .filter(col("o_orderkey") < 200)
        .select(col("o_orderkey"),
          to_date(col("o_orderdate") + expr("INTERVAL 30 DAY")).as("plus30"),
          to_date(col("o_orderdate") - expr("INTERVAL 1 WEEK")).as("minus1w"),
          add_months(col("o_orderdate"), 3).as("plus3m"),
          quarter(col("o_orderdate")).as("q"),
          to_date(date_trunc("quarter", col("o_orderdate"))).as("q_start"),
          (year(col("o_orderdate")) * 12 + month(col("o_orderdate"))
            - (1992 * 12 + 1)).as("months_since"))
        .orderBy(col("o_orderkey")),
    Some("""SELECT o_orderkey,
              CAST(CAST(o_orderdate AS TIMESTAMP) + INTERVAL 30 DAY AS DATE) AS plus30,
              CAST(CAST(o_orderdate AS TIMESTAMP) - INTERVAL 1 WEEK AS DATE) AS minus1w,
              CAST(CAST(o_orderdate AS TIMESTAMP) + INTERVAL 3 MONTH AS DATE) AS plus3m,
              CAST(EXTRACT(quarter FROM o_orderdate) AS INT) AS q,
              CAST(date_trunc('quarter', CAST(o_orderdate AS TIMESTAMP)) AS DATE) AS q_start,
              CAST(EXTRACT(year FROM o_orderdate) * 12 + EXTRACT(month FROM o_orderdate)
                - (1992 * 12 + 1) AS INT) AS months_since
            FROM orders WHERE o_orderkey < 200 ORDER BY o_orderkey"""))

  /** User-facing higher-order lambda functions (transform / filter /
    * aggregate / zip_with) — declared as a capability even though the
    * engine's own hot paths use the native expressions instead (the HOFs
    * evaluate interpreted; see plans.TokenStats). Arithmetic restricted
    * to exact ops (x*2 on floats widened to double, left-fold sums in
    * index order) so equality is bitwise.
    */
  private val hofFuncs = Q(
    "q_hof_funcs",
    (spark, dir) => {
      val e4 = slice(col("embedding"), 1, 4)
      // `doubled` is array-valued → serialized via Portable.pcsv (the
      // driver's checker cannot sort raw arrays; FIXTURES.md).
      Tables(spark, dir, "embeddings")
        .filter(col("vec_id") < 100)
        .select(col("vec_id"),
          graft.functions.Portable.pcsv(
            transform(e4, x => x.cast("double") * 2.0), 4).as("doubled"),
          size(filter(e4, x => x > 0.0f)).as("n_pos"),
          pround(aggregate(e4, lit(0.0), (acc, x) => acc + x.cast("double")), 4).as("sum4"),
          pround(aggregate(zip_with(e4, slice(col("embedding"), 5, 4),
              (a, b) => a.cast("double") * b.cast("double")),
            lit(0.0), (acc, v) => acc + v), 4).as("dot45"))
        .orderBy(col("vec_id"))
    },
    Some("""SELECT vec_id,
              array_to_string(list_transform(CAST(embedding[1:4] AS DOUBLE[]),
                x -> CAST(CAST(FLOOR(x * 2.0 * 10000 + 0.5) AS BIGINT) AS VARCHAR)), ',') AS doubled,
              CAST(len(list_filter(embedding[1:4], x -> x > 0.0)) AS INT) AS n_pos,
              FLOOR((list_aggregate(CAST(embedding[1:4] AS DOUBLE[]), 'sum')) * 10000 + 0.5)
                / 10000 AS sum4,
              FLOOR((list_aggregate(
                  list_transform(list_zip(CAST(embedding[1:4] AS DOUBLE[]),
                                          CAST(embedding[5:8] AS DOUBLE[])),
                                 t -> t[1] * t[2]), 'sum')) * 10000 + 0.5) / 10000 AS dot45
            FROM embeddings WHERE vec_id < 100 ORDER BY vec_id"""))

  /** Boolean aggregates: bool_and / bool_or plus filtered counting.
    * (Spark count_if == DuckDB's COUNT(*) FILTER — same BIGINT result.)
    */
  private val boolAgg = Q(
    "q_bool_agg",
    (spark, dir) =>
      Tables(spark, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          bool_and(col("l_quantity") > 0).as("all_positive"),
          bool_or(col("l_discount") > 0.09).as("any_deep_discount"),
          count_if(col("l_tax") > 0.03).as("n_taxed"),
          count_if(col("l_linenumber") === 1).as("n_first_lines"))
        .orderBy(col("l_returnflag")),
    Some("""SELECT l_returnflag,
              bool_and(l_quantity > 0) AS all_positive,
              bool_or(l_discount > 0.09) AS any_deep_discount,
              CAST(COUNT(*) FILTER (WHERE l_tax > 0.03) AS BIGINT) AS n_taxed,
              CAST(COUNT(*) FILTER (WHERE l_linenumber = 1) AS BIGINT) AS n_first_lines
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** Transcendental math battery: ln / exp / sqrt / explicit powers.
    * Everything funnels through an average before rounding — per-value
    * last-ulp libm drift between the JVM and DuckDB stays ~1e-15 relative
    * on O(10) magnitudes, far inside pround(4)'s knife edge. (Sums are
    * deliberately avoided: they amplify ulp drift linearly with row
    * count.)
    */
  private val mathFuncs2 = Q(
    "q_math_funcs2",
    (spark, dir) =>
      Tables(spark, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          pround(avg(log(col("l_extendedprice"))), 4).as("avg_ln_price"),
          pround(avg(sqrt(col("l_quantity"))), 4).as("avg_sqrt_qty"),
          pround(exp(avg(log(lit(1.0) + col("l_discount")))), 4).as("geo_mean_disc"),
          pround(avg(col("l_tax") * col("l_tax")), 6).as("avg_tax_sq"))
        .orderBy(col("l_returnflag")),
    Some("""SELECT l_returnflag,
              FLOOR((AVG(ln(l_extendedprice))) * 10000 + 0.5) / 10000 AS avg_ln_price,
              FLOOR((AVG(sqrt(l_quantity))) * 10000 + 0.5) / 10000 AS avg_sqrt_qty,
              FLOOR((exp(AVG(ln(1.0 + l_discount)))) * 10000 + 0.5) / 10000 AS geo_mean_disc,
              FLOOR((AVG(l_tax * l_tax)) * 1000000 + 0.5) / 1000000 AS avg_tax_sq
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** Statistical mode with a deterministic tiebreak: the most frequent
    * order priority per order status; ties break to the lexicographically
    * smallest priority. min(struct(-cnt, prio)) realizes (count DESC,
    * value ASC) as a single lexicographic aggregate — no window over the
    * raw table, just two partial+final aggregations.
    */
  private val modeAgg = Q(
    "q_mode",
    (spark, dir) =>
      Tables(spark, dir, "orders")
        .groupBy(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy(col("o_orderstatus"))
        .agg(min(struct((-col("cnt")).as("neg"), col("o_orderpriority").as("p"))).as("best"),
          sum(col("cnt")).as("n_orders"))
        .select(col("o_orderstatus"),
          col("best.p").as("mode_priority"),
          (-col("best.neg")).cast("bigint").as("mode_count"),
          col("n_orders").cast("bigint").as("n_orders"))
        .orderBy(col("o_orderstatus")),
    Some("""WITH c AS (SELECT o_orderstatus, o_orderpriority,
                    CAST(COUNT(*) AS BIGINT) AS cnt
                  FROM orders GROUP BY 1, 2),
            r AS (SELECT o_orderstatus, o_orderpriority, cnt,
                    CAST(SUM(cnt) OVER (PARTITION BY o_orderstatus) AS BIGINT) AS n_orders,
                    row_number() OVER (PARTITION BY o_orderstatus
                      ORDER BY cnt DESC, o_orderpriority ASC) AS rn
                  FROM c)
            SELECT o_orderstatus, o_orderpriority AS mode_priority,
              cnt AS mode_count, n_orders
            FROM r WHERE rn = 1 ORDER BY o_orderstatus"""))

  /** Distribution shape: per-segment skewness and excess kurtosis from
    * standardized moments. Engine-native skewness()/kurtosis() differ in
    * bias correction across engines, so both sides compute the identical
    * two-pass formula: broadcast the per-segment (mu, sigma) moment table
    * back onto the rows (the q_zscore_outlier scale pattern — no
    * whole-segment windows) and average z³ / z⁴ written as explicit
    * products (pow() is another portability trap).
    */
  private val skewMoments = Q(
    "q_skew_moments",
    (spark, dir) => {
      val cust = Tables(spark, dir, "customer")
      val moments = cust.groupBy(col("c_mktsegment"))
        .agg(avg(col("c_acctbal")).as("mu"),
          stddev_samp(col("c_acctbal")).as("sigma"))
      val z = (col("c_acctbal") - col("mu")) / col("sigma")
      cust.join(broadcast(moments), "c_mktsegment")
        .select(col("c_mktsegment"), (z * z * z).as("z3"), (z * z * z * z).as("z4"))
        .groupBy(col("c_mktsegment"))
        .agg(pround(avg(col("z3")), 4).as("skewness"),
          pround(avg(col("z4")) - 3.0, 4).as("excess_kurtosis"))
        .orderBy(col("c_mktsegment"))
    },
    Some("""WITH m AS (SELECT c_mktsegment, AVG(c_acctbal) AS mu,
                    stddev_samp(c_acctbal) AS sigma
                  FROM customer GROUP BY c_mktsegment),
            z AS (SELECT c.c_mktsegment,
                    (c.c_acctbal - m.mu) / m.sigma AS z
                  FROM customer c JOIN m USING (c_mktsegment))
            SELECT c_mktsegment,
              FLOOR((AVG(z * z * z)) * 10000 + 0.5) / 10000 AS skewness,
              FLOOR((AVG(z * z * z * z) - 3.0) * 10000 + 0.5) / 10000 AS excess_kurtosis
            FROM z GROUP BY c_mktsegment ORDER BY c_mktsegment"""))

  /** Count-min-sketch heavy hitters: the exact top-10 part keys by
    * line-item count, each cross-checked against a CMS frequency estimate
    * (eps = 5e-4, confidence 0.99, fixed seed). Like q_approx_distinct,
    * the sketch value itself isn't cross-engine comparable, so the output
    * carries the oracle-checkable exact counts plus a flag asserting the
    * CMS guarantees: exact ≤ estimate (certain — CMS never undercounts)
    * and estimate ≤ exact + 4·eps·N (the per-hash-row overshoot exceeds
    * k·eps·N with probability ≤ 1/(2k) by Markov, so the min over the 5
    * rows exceeds the 4× slack with probability ≲ (1/8)⁵ ≈ 3e-5 — wide
    * enough that the flag only flips for a genuinely broken sketch, not
    * an unlucky dataset, while still asserting 0.2%-of-N accuracy). A
    * broken or drifting sketch flips the flag and fails the hash gate.
    * The sketch
    * build is one distributed pass (counter arrays merge additively, so
    * the result is partition-order independent); only the fixed-size
    * sketch and the 10-row top-k ever reach the driver.
    *
    * EAGER BUILDER: unlike every other query, constructing this
    * DataFrame runs two lineitem scans immediately (`countMinSketch` and
    * the top-10 collect are driver-side sketch probes, not plan nodes).
    * Keep it out of plan-inspection paths — ExplainAll skips it for this
    * reason — and treat build-time as query-time in any harness.
    */
  private val heavyHitters = Q(
    "q_heavy_hitters",
    (spark, dir) => {
      import spark.implicits._
      val eps = 0.0005
      val li = Tables(spark, dir, "lineitem").select(col("l_partkey"))
      val cms = li.stat.countMinSketch("l_partkey", eps, 0.99, 42)
      val slack = 4L * math.ceil(eps * cms.totalCount()).toLong
      val top = li.groupBy(col("l_partkey")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("l_partkey")).limit(10)
        .collect() // bounded: exactly the 10-row result head
        .map { r =>
          val k = r.getLong(0); val c = r.getLong(1)
          val est = cms.estimateCount(java.lang.Long.valueOf(k))
          (k, c, if (est >= c && est <= c + slack) 1 else 0)
        }.toSeq
      top.toDF("l_partkey", "cnt", "cms_bound_ok").orderBy(col("l_partkey"))
    },
    Some("""WITH top AS (SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS cnt
              FROM lineitem GROUP BY l_partkey
              ORDER BY cnt DESC, l_partkey LIMIT 10)
            SELECT l_partkey, cnt, CAST(1 AS INT) AS cms_bound_ok
            FROM top ORDER BY l_partkey"""))

  val all: Seq[Q] = Seq(regexFuncs, condFuncs, approxDistinct, statsAgg,
    percentile, percentileApprox, stringFuncs2, dateFuncs2, mapFuncs,
    structFuncs, bitFuncs, arrayFuncs2, stringFuncs3, dateFuncs3, hofFuncs,
    boolAgg, mathFuncs2, modeAgg, skewMoments, heavyHitters)
}
