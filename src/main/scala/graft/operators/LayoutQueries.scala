package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Data-LAYOUT engineering queries — the write-side techniques that decide
  * how much of a 100 TB table a query actually reads (Z-order clustering
  * for zone-map skipping; incremental maintenance so yesterday's 100 TB is
  * never recomputed). Companions: q_bucketed_join (hash-bucket layout for
  * exchange-free joins), q_schema_drift / q_column_profile (the stats that
  * drive these decisions).
  */
object LayoutQueries {

  /** Z-ORDER locality audit — measures, in exact integers, WHY lakehouse
    * optimizers re-cluster on a Z-curve (Delta/Iceberg OPTIMIZE ZORDER;
    * Morton 1966): rows are assigned to 64 chunks two ways — by ingest
    * order (the l_orderkey proxy) and by the 16-bit Morton interleave of
    * the two filter dimensions (l_partkey, l_suppkey bucketed to 8 bits
    * each) — and each chunk keeps its zone map (per-dimension min/max,
    * exactly what parquet row-group stats are). For the canonical quarter-
    * grid predicate (bx ≤ 127 AND by ≤ 127) the audit reports, per layout:
    * chunk count, total zone-map bounding-box area (the locality metric),
    * chunks a zone-map scan can SKIP (bbox disjoint from the predicate
    * box) and the rows inside them. Ingest order correlates with neither
    * dimension, so its zone maps span the whole grid and skip ~nothing;
    * the Z-layout's chunks are spatially compact and skip ~3/4 of the
    * data — the number that justifies paying the re-cluster write.
    *
    * Everything is value-based integer arithmetic — bucketing by
    * `v·256 div (max+1)`, chunking by `z·64 div 2¹⁶` — so there is no
    * window, no sample, and no float anywhere; the oracle replays the
    * identical bit interleave with `>>`/`<<`/`&`.
    *
    * Scale posture (100 TB): the dimension maxima are a 1-row broadcast;
    * bucket/interleave/chunk are pure per-row projections; the zone maps
    * are one (layout, chunk) partial+final aggregate over 128 groups, and
    * the verdict is a 2-row rollup. At production scale the same plan
    * computes real zone maps as the OPTIMIZE job's final pass.
    */
  private val zorderLocality = Q(
    "q_zorder_locality",
    (spark, dir) => {
      val li = Tables(spark, dir, "lineitem")
        .select(col("l_partkey"), col("l_suppkey"), col("l_orderkey"))
      val mx = broadcast(li.agg(max(col("l_partkey")).as("maxp"),
        max(col("l_suppkey")).as("maxs"), max(col("l_orderkey")).as("maxok")))
      val zExpr = (0 until 8).map(i =>
        s"shiftleft(shiftright(bx, $i) & 1, ${2 * i}) + " +
          s"shiftleft(shiftright(by, $i) & 1, ${2 * i + 1})").mkString(" + ")
      val g = li.crossJoin(mx)
        .select(expr("l_partkey * 256 div (maxp + 1)").as("bx"),
          expr("l_suppkey * 256 div (maxs + 1)").as("by"),
          expr("l_orderkey * 64 div (maxok + 1)").as("rchunk"))
        .withColumn("zchunk", expr(s"($zExpr) * 64 div 65536"))
      // one stack generator instead of a self-union: the union's two
      // branches would each re-derive the scan subtree (4 parquet scans);
      // the generator fans the same row into both layouts off ONE scan
      val stacked = g.select(
        expr("stack(2, 'zorder', zchunk, 'roworder', rchunk) as (layout, chunk)"),
        col("bx"), col("by"))
      val zones = stacked.groupBy(col("layout"), col("chunk"))
        .agg(count(lit(1)).as("n"),
          min(col("bx")).as("minbx"), max(col("bx")).as("maxbx"),
          min(col("by")).as("minby"), max(col("by")).as("maxby"))
      zones.groupBy(col("layout"))
        .agg(count(lit(1)).cast("bigint").as("n_chunks"),
          sum((col("maxbx") - col("minbx") + 1) *
            (col("maxby") - col("minby") + 1)).cast("bigint").as("sum_bbox_area"),
          sum(when(col("minbx") > 127 || col("minby") > 127, 1L).otherwise(0L))
            .cast("bigint").as("n_skippable"),
          sum(when(col("minbx") > 127 || col("minby") > 127, col("n")).otherwise(0L))
            .cast("bigint").as("skippable_rows"))
        .orderBy(col("layout"))
    },
    Some {
      val zExpr = (0 until 8).map(i =>
        s"(((bx >> $i) & 1) << ${2 * i}) + (((by >> $i) & 1) << ${2 * i + 1})")
        .mkString(" + ")
      s"""WITH mx AS (SELECT MAX(l_partkey) AS maxp, MAX(l_suppkey) AS maxs,
                        MAX(l_orderkey) AS maxok FROM lineitem),
          g AS (SELECT l_partkey * 256 // (maxp + 1) AS bx,
                  l_suppkey * 256 // (maxs + 1) AS by,
                  l_orderkey * 64 // (maxok + 1) AS rchunk
                FROM lineitem, mx),
          z AS (SELECT bx, by, rchunk, ($zExpr) * 64 // 65536 AS zchunk FROM g),
          stacked AS (SELECT 'zorder' AS layout, zchunk AS chunk, bx, by FROM z
                      UNION ALL
                      SELECT 'roworder', rchunk, bx, by FROM z),
          zones AS (SELECT layout, chunk, COUNT(*) AS n,
                      MIN(bx) AS minbx, MAX(bx) AS maxbx,
                      MIN(by) AS minby, MAX(by) AS maxby
                    FROM stacked GROUP BY layout, chunk)
          SELECT layout, CAST(COUNT(*) AS BIGINT) AS n_chunks,
            CAST(SUM((maxbx - minbx + 1) * (maxby - minby + 1)) AS BIGINT)
              AS sum_bbox_area,
            CAST(SUM(CASE WHEN minbx > 127 OR minby > 127 THEN 1 ELSE 0 END)
              AS BIGINT) AS n_skippable,
            CAST(SUM(CASE WHEN minbx > 127 OR minby > 127 THEN n ELSE 0 END)
              AS BIGINT) AS skippable_rows
          FROM zones GROUP BY layout ORDER BY layout"""
    })

  /** Incremental view maintenance — the contract that lets a 100 TB
    * pipeline fold in a daily drop without recomputing history: orders
    * splits into base/delta at its date midpoint (the q_schema_drift
    * split); the per-priority revenue aggregate is maintained BOTH ways —
    * full recompute vs base-aggregate + delta-aggregate merged by sum —
    * and the audit reports the (identically zero) differences as proof
    * the aggregate is algebraic/distributive (Gray et al., Data Cube,
    * ICDE'96 taxonomy). The third block documents the class boundary the
    * same way: COUNT DISTINCT is NOT sum-mergeable — the naive
    * base+delta distinct-customer sum exceeds the true full distinct by
    * exactly the cross-vintage repeat customers, a real business metric
    * (repeat_custs) that the wrong merge silently inflates. Sketch
    * twins (q_approx_distinct's HLL posture) are how production merges
    * distincts incrementally.
    *
    * Scale posture: one broadcast date span; base/delta/full are
    * partial+final integer-cents aggregates over priority (5 groups);
    * the distinct legs are the exact two-level expand; everything joins
    * on the 5-row priority key.
    */
  private val incrementalAgg = Q(
    "q_incremental_agg",
    (spark, dir) => {
      val o = Tables(spark, dir, "orders")
      val span = broadcast(o.agg(min(col("o_orderdate")).as("dmin"),
        max(col("o_orderdate")).as("dmax")))
      val tagged = o.crossJoin(span)
        .select(col("o_orderpriority").as("pri"), col("o_custkey"),
          expr("cast(floor(o_totalprice * 100 + 0.5) as bigint)").as("cents"),
          when(datediff(col("o_orderdate"), col("dmin")) * 2 <=
            datediff(col("dmax"), col("dmin")), lit("base")).otherwise(lit("delta"))
            .as("vintage"))
      val halves = tagged.groupBy(col("pri"), col("vintage"))
        .agg(sum(col("cents")).as("c"), count(lit(1)).as("n"),
          countDistinct(col("o_custkey")).as("d"))
      val incr = halves.groupBy(col("pri"))
        .agg(sum(col("c")).as("incr_cents"), sum(col("n")).as("incr_n"),
          sum(col("d")).as("naive_dcust_sum"))
      val full = tagged.groupBy(col("pri"))
        .agg(sum(col("cents")).as("full_cents"), count(lit(1)).as("full_n"),
          countDistinct(col("o_custkey")).as("full_dcust"))
      full.join(incr, "pri")
        .select(col("pri").as("o_orderpriority"),
          col("full_cents").cast("bigint").as("full_cents"),
          col("incr_cents").cast("bigint").as("incr_cents"),
          (col("full_cents") - col("incr_cents")).cast("bigint").as("diff_cents"),
          col("full_n").cast("bigint").as("full_n"),
          col("incr_n").cast("bigint").as("incr_n"),
          col("full_dcust").cast("bigint").as("full_dcust"),
          col("naive_dcust_sum").cast("bigint").as("naive_dcust_sum"),
          (col("naive_dcust_sum") - col("full_dcust")).cast("bigint")
            .as("repeat_custs"))
        .orderBy(col("o_orderpriority"))
    },
    Some("""WITH span AS (SELECT MIN(o_orderdate) AS dmin, MAX(o_orderdate) AS dmax
                          FROM orders),
            tagged AS (SELECT o_orderpriority AS pri, o_custkey,
                         CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
                         CASE WHEN (CAST(o_orderdate AS DATE) - CAST(span.dmin AS DATE)) * 2 <=
                                   (CAST(span.dmax AS DATE) - CAST(span.dmin AS DATE))
                              THEN 'base' ELSE 'delta' END AS vintage
                       FROM orders, span),
            halves AS (SELECT pri, vintage, SUM(cents) AS c, COUNT(*) AS n,
                         COUNT(DISTINCT o_custkey) AS d
                       FROM tagged GROUP BY pri, vintage),
            incr AS (SELECT pri, SUM(c) AS incr_cents, SUM(n) AS incr_n,
                       SUM(d) AS naive_dcust_sum
                     FROM halves GROUP BY pri),
            fl AS (SELECT pri, SUM(cents) AS full_cents, COUNT(*) AS full_n,
                     COUNT(DISTINCT o_custkey) AS full_dcust
                   FROM tagged GROUP BY pri)
            SELECT fl.pri AS o_orderpriority,
              CAST(full_cents AS BIGINT) AS full_cents,
              CAST(incr_cents AS BIGINT) AS incr_cents,
              CAST(full_cents - incr_cents AS BIGINT) AS diff_cents,
              CAST(full_n AS BIGINT) AS full_n,
              CAST(incr_n AS BIGINT) AS incr_n,
              CAST(full_dcust AS BIGINT) AS full_dcust,
              CAST(naive_dcust_sum AS BIGINT) AS naive_dcust_sum,
              CAST(naive_dcust_sum - full_dcust AS BIGINT) AS repeat_custs
            FROM fl JOIN incr ON fl.pri = incr.pri
            ORDER BY o_orderpriority"""))

  val all: Seq[Q] = Seq(zorderLocality, incrementalAgg)
}
