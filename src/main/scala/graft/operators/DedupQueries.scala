package graft.operators

import graft.{Q, Tables}
import graft.functions.Portable.pround
import graft.functions.TextOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication suite over `documents` — the LLM-pipeline operators:
  * exact (hash → keep-first), MinHash+LSH (shingle → minhash → band →
  * bucket-join → jaccard verify), SimHash signatures, and n-gram Jaccard.
  * (Embedding-cosine near-dup lives in VectorQueries.)
  *
  * Every hash is the portable md5-prefix from [[TextOps.hashHex]], so the
  * DuckDB oracles reproduce signatures bit-for-bit.
  *
  * Scale shape: all stages key their shuffles on content-derived values
  * (hash, shingle, (band, signature)) — uniformly distributed, skew-free,
  * and partitionable to any cluster size. Nothing is ever collected to the
  * driver.
  */
object DedupQueries {

  /** Exact dedup: md5 content hash, keep the lowest doc_id per hash. */
  private val dedupExact = Q(
    "q_dedup_exact",
    (spark, dir) => {
      val w = Window.partitionBy(md5(col("text"))).orderBy(col("doc_id"))
      Tables(spark, dir, "documents")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("doc_id"), col("lang"), col("source"))
        .orderBy(col("doc_id"))
    },
    Some("""SELECT doc_id, lang, source FROM (
              SELECT doc_id, lang, source,
                row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
              FROM documents)
            WHERE rn = 1 ORDER BY doc_id"""))

  /** Distinct word-3-gram shingles per doc: (doc_id, sh). */
  private def shingleRel(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .select(col("doc_id"),
        explode(array_distinct(TextOps.shingles(TextOps.words(col("text")), 3))).as("sh"))

  /** MinHash + LSH candidate pairs with exact Jaccard verification.
    *
    * 16 portable hash functions, 4 bands × 4 rows: docs agreeing on all 4
    * minhashes of any band become candidates; candidates are then verified
    * with exact shingle-set Jaccard. This is the full scalable pipeline —
    * the band bucket-join replaces the quadratic all-pairs compare, and
    * every stage is a hash-partitioned groupBy/join.
    */
  private val dedupMinhash = Q(
    "q_dedup_minhash",
    (spark, dir) => {
      val sh = shingleRel(spark, dir).cache()
      val mh = sh
        .withColumn("seed", explode(sequence(lit(0), lit(15))))
        .groupBy(col("doc_id"), col("seed"))
        .agg(min(TextOps.hashHex(col("seed"), col("sh"))).as("mh"))
      val bands = mh
        .groupBy(col("doc_id"), floor(col("seed") / 4).cast("int").as("band"))
        .agg(concat_ws(",",
          transform(sort_array(collect_list(struct(col("seed"), col("mh")))),
            x => x.getField("mh"))).as("sig"))
      val cand = bands.as("a")
        .join(bands.as("b"),
          col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .distinct()
      val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      val inter = cand
        .join(sh.select(col("doc_id").as("doc_a"), col("sh")), "doc_a")
        .join(sh.select(col("doc_id").as("doc_b"), col("sh")), Seq("doc_b", "sh"))
        .groupBy(col("doc_a"), col("doc_b"))
        .agg(count(lit(1)).as("i"))
      inter
        .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("na")), "doc_a")
        .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("nb")), "doc_b")
        .select(col("doc_a"), col("doc_b"),
          pround(col("i").cast("double") / (col("na") + col("nb") - col("i")), 4).as("jaccard"))
        .orderBy(col("doc_a"), col("doc_b"))
    },
    Some("""WITH toks AS (SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS ws
                          FROM documents),
            sh AS (SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS sh
                   FROM toks, UNNEST(generate_series(1, len(ws) - 2)) AS u(i)
                   WHERE len(ws) >= 3),
            mh AS (SELECT doc_id, s,
                     MIN(substr(md5(CAST(s AS VARCHAR) || ':' || sh), 1, 16)) AS mh
                   FROM sh, UNNEST(generate_series(0, 15)) AS t(s)
                   GROUP BY doc_id, s),
            bands AS (SELECT doc_id, CAST(FLOOR(s / 4) AS INT) AS band,
                        string_agg(mh, ',' ORDER BY s) AS sig
                      FROM mh GROUP BY doc_id, CAST(FLOOR(s / 4) AS INT)),
            cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                     FROM bands a JOIN bands b
                       ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id),
            sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
            inter AS (SELECT c.doc_a, c.doc_b, COUNT(*) AS i
                      FROM cand c
                      JOIN sh x ON x.doc_id = c.doc_a
                      JOIN sh y ON y.doc_id = c.doc_b AND y.sh = x.sh
                      GROUP BY c.doc_a, c.doc_b)
            SELECT i.doc_a, i.doc_b,
              FLOOR((CAST(i.i AS DOUBLE) / (sa.n + sb.n - i.i)) * 10000 + 0.5) / 10000 AS jaccard
            FROM inter i
            JOIN sizes sa ON sa.doc_id = i.doc_a
            JOIN sizes sb ON sb.doc_id = i.doc_b
            ORDER BY doc_a, doc_b"""))

  /** SimHash: 16-bit signature from per-hex-char md5 "bit" votes weighted
    * by term frequency. Near-dup docs differ in few signature bits; the
    * signature itself is the oracle-checked artifact.
    */
  private val dedupSimhash = Q(
    "q_dedup_simhash",
    (spark, dir) => {
      val bit = substring(md5(col("w")), col("i"), lit(1))
        .isin("8", "9", "a", "b", "c", "d", "e", "f")
      Tables(spark, dir, "documents")
        .select(col("doc_id"), explode(TextOps.words(col("text"))).as("w"))
        .withColumn("i", explode(sequence(lit(1), lit(16))))
        .groupBy(col("doc_id"), col("i"))
        .agg(sum(when(bit, 1).otherwise(-1)).as("s"))
        .groupBy(col("doc_id"))
        .agg(concat_ws("",
          transform(sort_array(collect_list(struct(col("i"), col("s")))),
            x => when(x.getField("s") > 0, lit("1")).otherwise(lit("0")))).as("simhash16"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH w1 AS (SELECT doc_id, word AS w FROM
                          (SELECT doc_id, UNNEST(string_split(text, ' ')) AS word FROM documents)
                        WHERE word <> ''),
            bits AS (SELECT doc_id, i,
                       SUM(CASE WHEN substr(md5(w), i, 1) IN
                         ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END) AS s
                     FROM w1, UNNEST(generate_series(1, 16)) AS t(i)
                     GROUP BY doc_id, i)
            SELECT doc_id,
              string_agg(CASE WHEN s > 0 THEN '1' ELSE '0' END, '' ORDER BY i) AS simhash16
            FROM bits GROUP BY doc_id ORDER BY doc_id"""))

  /** n-gram Jaccard similarity: exact top-20 most-similar doc pairs within
    * a bounded id window (the exact verifier; minhash-LSH is the candidate
    * generator for unbounded scale).
    */
  private val dedupNgram = Q(
    "q_dedup_ngram",
    (spark, dir) => {
      val sh = shingleRel(spark, dir).filter(col("doc_id") < 40).cache()
      val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      val inter = sh.select(col("doc_id").as("doc_a"), col("sh"))
        .join(sh.select(col("doc_id").as("doc_b"), col("sh")), "sh")
        .filter(col("doc_a") < col("doc_b"))
        .groupBy(col("doc_a"), col("doc_b"))
        .agg(count(lit(1)).as("i"))
      inter
        .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("na")), "doc_a")
        .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("nb")), "doc_b")
        .select(col("doc_a"), col("doc_b"),
          pround(col("i").cast("double") / (col("na") + col("nb") - col("i")), 4).as("jaccard"))
        .orderBy(col("jaccard").desc, col("doc_a"), col("doc_b"))
        .limit(20)
    },
    Some("""WITH toks AS (SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS ws
                          FROM documents WHERE doc_id < 40),
            sh AS (SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS sh
                   FROM toks, UNNEST(generate_series(1, len(ws) - 2)) AS u(i)
                   WHERE len(ws) >= 3),
            sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
            inter AS (SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, COUNT(*) AS i
                      FROM sh x JOIN sh y ON x.sh = y.sh AND x.doc_id < y.doc_id
                      GROUP BY x.doc_id, y.doc_id)
            SELECT i.doc_a, i.doc_b,
              FLOOR((CAST(i.i AS DOUBLE) / (sa.n + sb.n - i.i)) * 10000 + 0.5) / 10000 AS jaccard
            FROM inter i
            JOIN sizes sa ON sa.doc_id = i.doc_a
            JOIN sizes sb ON sb.doc_id = i.doc_b
            ORDER BY jaccard DESC, doc_a, doc_b LIMIT 20"""))

  val all: Seq[Q] = Seq(dedupExact, dedupMinhash, dedupSimhash, dedupNgram)
}
