package graft.operators

import graft.{Q, Tables}
import graft.functions.Portable.pround
import graft.functions.{Prefix, TextOps}
import org.apache.spark.sql.functions._

/** Training-batch preparation operators: the steps between a cleaned
  * corpus and a training run — sequence packing, length bucketing,
  * mixture sampling, canonicalization dedup, feature scaling. The
  * reference engine has none of this surface (SURVEY.md §2.2); these are
  * north-star pipeline operators like the dedup family.
  */
object TrainPrepQueries {

  /** Whitespace token count per document, shared tokenization with
    * q_token_count (TextOps.tokenStats ⇔ len(list_filter(string_split))).
    */
  private def tokenCounts(spark: org.apache.spark.sql.SparkSession, dir: String) =
    Tables(spark, dir, "documents")
      .select(col("doc_id"),
        TextOps.tokenStats(col("text")).getField("n_tokens").cast("long").as("tc"))

  private val tokensCte =
    """tc AS (SELECT doc_id,
         CAST(len(list_filter(string_split(text, ' '), w -> w <> '')) AS BIGINT) AS tc
       FROM documents)"""

  /** GPT-style sequence packing: concatenate documents in doc_id order
    * and chunk into fixed 512-token blocks; each document starts in pack
    * floor(tokens-before / 512). The running token total comes from the
    * distributed prefix-sum primitive — the packing assignment for any
    * corpus size without an unpartitioned window (512 is a power of two,
    * so the float floor-division is exact on both engines). Output: per
    * pack, how many documents start there and their token mass — the
    * batch-shape audit a packing run ships with.
    */
  private val seqPack = Q(
    "q_seq_pack",
    (spark, dir) => {
      val c = Prefix.withRunningTotals(tokenCounts(spark, dir),
        Seq(col("doc_id")), Seq("tc"))
      c.select(col("tc"),
          floor((col("tc_cum") - col("tc")).cast("double") / 512.0)
            .cast("bigint").as("pack_id"))
        .groupBy(col("pack_id"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("tc")).cast("bigint").as("pack_tokens"))
        .orderBy(col("pack_id"))
    },
    Some(s"""WITH $tokensCte,
             c AS (SELECT doc_id, tc,
                     CAST(SUM(tc) OVER (ORDER BY doc_id) AS BIGINT) AS tc_cum
                   FROM tc),
             p AS (SELECT CAST(FLOOR(CAST(tc_cum - tc AS DOUBLE) / 512.0) AS BIGINT) AS pack_id, tc
                   FROM c)
             SELECT pack_id, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(tc) AS BIGINT) AS pack_tokens
             FROM p GROUP BY pack_id ORDER BY pack_id"""))

  /** Power-of-two length bucketing — the batching histogram (which
    * context lengths dominate, how much padding would fixed batches
    * waste). log2 of an exact integer is ulp-safe: the nearest boundary
    * is log2(1+1/tc) away, orders of magnitude above double error.
    * Output is bounded by log2(max tokens) rows at any scale.
    */
  private val tokenBuckets = Q(
    "q_token_buckets",
    (spark, dir) =>
      tokenCounts(spark, dir)
        .filter(col("tc") >= 1)
        .select(col("tc"),
          pow(lit(2.0), floor(log2(col("tc").cast("double"))))
            .cast("bigint").as("bucket_lo"))
        .groupBy(col("bucket_lo"))
        .agg(count(lit(1)).as("n_docs"),
          min(col("tc")).as("min_tokens"), max(col("tc")).as("max_tokens"),
          sum(col("tc")).cast("bigint").as("tokens"))
        .orderBy(col("bucket_lo")),
    Some(s"""WITH $tokensCte
             SELECT CAST(POWER(2.0, FLOOR(LOG2(CAST(tc AS DOUBLE)))) AS BIGINT) AS bucket_lo,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               MIN(tc) AS min_tokens, MAX(tc) AS max_tokens,
               CAST(SUM(tc) AS BIGINT) AS tokens
             FROM tc WHERE tc >= 1
             GROUP BY bucket_lo ORDER BY bucket_lo"""))

  /** Deterministic mixture sampling: per length tier (short/mid/long by
    * n_chars), keep a tier-specific fraction chosen by an md5-derived
    * 60-bit hash of the doc id — the up/down-weighting step that turns a
    * corpus into a training mix. Hash-threshold sampling is reproducible
    * on any engine and any partitioning (no RNG state), and the realized
    * rate per tier is the audit a mixing run reports. Pure per-row map +
    * one bounded aggregate.
    */
  private val interleave = Q(
    "q_interleave",
    (spark, dir) =>
      Tables(spark, dir, "documents")
        .select(
          when(col("n_chars") < 200, "short")
            .when(col("n_chars") < 400, "mid").otherwise("long").as("tier"),
          conv(substring(md5(concat(lit("mix"), col("doc_id").cast("string"))), 1, 15), 16, 10)
            .cast("long").as("h"))
        .withColumn("rate",
          when(col("tier") === "short", 20)
            .when(col("tier") === "mid", 50).otherwise(100))
        .withColumn("keep", (pmod(col("h"), lit(100)) < col("rate")).cast("int"))
        .groupBy(col("tier"))
        .agg(count(lit(1)).as("n_total"),
          sum(col("keep")).cast("bigint").as("n_kept"),
          pround(sum(col("keep")).cast("double") / count(lit(1)).cast("double"), 4)
            .as("realized_rate"))
        .orderBy(col("tier")),
    Some("""WITH t AS (SELECT CASE WHEN n_chars < 200 THEN 'short'
                         WHEN n_chars < 400 THEN 'mid' ELSE 'long' END AS tier,
                     CAST('0x' || substr(md5('mix' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) AS h
                   FROM documents),
            k AS (SELECT tier,
                    CASE WHEN (h % 100) < (CASE tier WHEN 'short' THEN 20
                      WHEN 'mid' THEN 50 ELSE 100 END) THEN 1 ELSE 0 END AS keep
                  FROM t)
            SELECT tier, CAST(COUNT(*) AS BIGINT) AS n_total,
              CAST(SUM(keep) AS BIGINT) AS n_kept,
              FLOOR((CAST(SUM(keep) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))
                * 10000 + 0.5) / 10000 AS realized_rate
            FROM k GROUP BY tier ORDER BY tier"""))

  /** Canonicalization dedup audit: lowercase, strip non-alphanumerics,
    * collapse runs of spaces, then group by the md5 of the canonical
    * form and report the duplicate-group size histogram (how much of the
    * corpus survives normalization-level dedup). Content-keyed hash
    * aggregates end to end; the histogram is bounded by the largest
    * duplicate cluster.
    */
  private val dedupCanonical = Q(
    "q_dedup_canonical",
    (spark, dir) =>
      Tables(spark, dir, "documents")
        .select(md5(trim(regexp_replace(
          regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""), " +", " ")))
          .as("k"))
        .groupBy(col("k")).agg(count(lit(1)).as("sz"))
        .groupBy(col("sz"))
        .agg(count(lit(1)).as("n_groups"),
          sum(col("sz")).cast("bigint").as("n_docs"))
        .orderBy(col("sz")),
    Some("""WITH k AS (SELECT md5(trim(regexp_replace(
                     regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
                     ' +', ' ', 'g'))) AS k
                   FROM documents),
            g AS (SELECT k, CAST(COUNT(*) AS BIGINT) AS sz FROM k GROUP BY k)
            SELECT sz, CAST(COUNT(*) AS BIGINT) AS n_groups,
              CAST(SUM(sz) AS BIGINT) AS n_docs
            FROM g GROUP BY sz ORDER BY sz"""))

  /** Per-dimension min-max feature scaling of the first 4 embedding
    * dimensions: global (min, max) per dimension by one partial+final
    * aggregate over the posexploded stripes, broadcast back, scale
    * in-place. The stats relation is dimension-bounded; the fact side
    * never shuffles. First 20 vectors reported.
    */
  private val minmaxScale = Q(
    "q_minmax_scale",
    (spark, dir) => {
      val ex = Tables(spark, dir, "embeddings")
        .select(col("vec_id"), posexplode(slice(col("embedding"), 1, 4)).as(Seq("dim", "v")))
      val stats = broadcast(ex.groupBy(col("dim"))
        .agg(min(col("v")).as("mn"), max(col("v")).as("mx")))
      ex.filter(col("vec_id") < 20)
        .join(stats, "dim")
        .select(col("vec_id"), col("dim").cast("int").as("dim"),
          pround((col("v").cast("double") - col("mn").cast("double")) /
            (col("mx").cast("double") - col("mn").cast("double")), 4).as("scaled"))
        .orderBy(col("vec_id"), col("dim"))
    },
    Some("""WITH ex AS (SELECT vec_id, CAST(i - 1 AS INT) AS dim,
                     CAST(embedding[i] AS DOUBLE) AS v
                   FROM embeddings, UNNEST(generate_series(1, 4)) AS u(i)),
            stats AS (SELECT dim, MIN(v) AS mn, MAX(v) AS mx FROM ex GROUP BY dim)
            SELECT vec_id, ex.dim,
              FLOOR(((v - mn) / (mx - mn)) * 10000 + 0.5) / 10000 AS scaled
            FROM ex JOIN stats ON ex.dim = stats.dim
            WHERE vec_id < 20 ORDER BY vec_id, ex.dim"""))

  val all: Seq[Q] = Seq(seqPack, tokenBuckets, interleave, dedupCanonical,
    minmaxScale)
}
