package graft.operators

import graft.{Caches, Q, Tables}
import graft.functions.Portable.pround
import graft.functions.VectorOps
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (`vec_id`,
  * `embedding array<float>`, `label`): array scalar ops, brute-force cosine
  * top-k as the exact baseline, and a hyperplane-LSH bucketed variant as the
  * scale path. Cosine math is `zip_with`+`aggregate` with double
  * accumulation — codegen'd, no UDF, no shuffle beyond the final top-k.
  */
object VectorQueries {

  /** Deterministic random hyperplanes, derived from md5 so the DuckDB
    * oracle can reproduce them: sign(p, d) = +1 iff the first hex char of
    * md5("p<p>-<d>") has its high bit set. Data-independent constants, so
    * they are computed driver-side and inlined as literal arrays (the plan
    * stays a pure per-row projection — no join against a planes table).
    */
  private[graft] def planeSigns(nPlanes: Int, dims: Int): Seq[Seq[Double]] = {
    val digest = java.security.MessageDigest.getInstance("MD5")
    (0 until nPlanes).map { p =>
      (1 to dims).map { d =>
        val hex = digest.digest(s"p$p-$d".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        if ("89abcdef".contains(hex.head)) 1.0 else -1.0
      }
    }
  }

  private def signedDot(emb: Column, signs: Seq[Double]): Column =
    VectorOps.signedDot(emb, signs.toArray)

  /** Fixture embedding dimensionality, read from the DATA (a bounded
    * driver scalar, the q_knn_join count() precedent) instead of a
    * hardcoded 64, and derived EXACTLY the way every oracle derives it
    * — MAX(len(embedding)) — so a fixture-dim change or a stray NULL
    * embedding can no longer diverge the engines silently (ADVICE r11:
    * the earlier limit(1) head threw on a NULL embedding row and only
    * matched the oracle's MAX under the uniform-dim fixture contract).
    * Empty corpus → 0 dims → empty plane grid on both engines.
    */
  private[graft] def embeddingDim(spark: org.apache.spark.sql.SparkSession,
      dir: String): Int =
    Tables(spark, dir, "embeddings")
      .agg(coalesce(max(size(col("embedding"))), lit(0)))
      .collect()(0).getInt(0)

  /** Scale-adaptive LSH depth: the smallest plane count k ≥ 4 such that
    * the expected bucket population n / 2^k stays ≤ `target` rows — so
    * the within-bucket self-join stays task-sized as the corpus grows
    * (n candidates per row, not n²/2^k total pairs with k pinned at
    * compile time). Pure integer arithmetic (smallest k with
    * target·2^k ≥ n) so the DuckDB oracle reproduces the choice exactly
    * — no float log2 knife edges. Capped at 20 planes (1M buckets);
    * beyond that, band families are the next knob.
    */
  private[graft] def planesFor(n: Long, target: Long = 32L): Int = {
    var k = 4
    while ((target << k) < n && k < 20) k += 1
    k
  }

  /** Scale-adaptive semantic-dedup centroid count: k = max(8, ceil(n /
    * target)) so the expected cluster population stays ≤ `target` rows
    * and the within-cluster pair self-join stays task-sized as the
    * corpus grows (SemDeDup's k ≈ n/target knob, turned from data the
    * same way [[planesFor]] turns the LSH depth). Pure integer
    * arithmetic — (n + target - 1) / target — so the DuckDB oracle
    * reproduces the choice exactly.
    */
  private[graft] def semanticK(n: Long, target: Long = 128L): Int = {
    val k = math.max(8L, (n + target - 1) / target)
    // fail loudly rather than wrap: .toInt on k > Int.MaxValue (n > ~2.7e11
    // at the default target) would silently go negative inside limit(k);
    // past this point the k-centroid broadcast model is the wrong tool
    // anyway and the caller must shard the centroid table.
    require(k <= Int.MaxValue,
      s"semanticK: k=$k exceeds Int range (n=$n, target=$target); " +
        "shard the centroid model instead of broadcasting")
    k.toInt
  }

  /** Array scalar functions: size, element access, element sum. */
  private val arrayFuncs = Q(
    "q_array_funcs",
    (spark, dir) =>
      Tables(spark, dir, "embeddings")
        .select(
          col("vec_id"),
          size(col("embedding")).as("dim"),
          pround(element_at(col("embedding"), 1).cast("double"), 4).as("e1"),
          pround(element_at(col("embedding"), 64).cast("double"), 4).as("e64"),
          pround(VectorOps.arraySum(col("embedding")), 4).as("esum"))
        .orderBy(col("vec_id")),
    Some("""SELECT vec_id, CAST(len(embedding) AS INT) AS dim,
              FLOOR((CAST(embedding[1] AS DOUBLE)) * 10000 + 0.5) / 10000 AS e1,
              FLOOR((CAST(embedding[64] AS DOUBLE)) * 10000 + 0.5) / 10000 AS e64,
              FLOOR((list_sum(CAST(embedding AS DOUBLE[]))) * 10000 + 0.5) / 10000 AS esum
            FROM embeddings ORDER BY vec_id"""))

  /** Exact brute-force KNN: top-10 cosine neighbors of probe vec_id=0.
    * The probe is broadcast, so at scale this is a single pruned scan with
    * a per-partition top-k merge (TakeOrderedAndProject) — no shuffle of
    * the embedding data.
    */
  private val knnBrute = Q(
    "q_knn_brute",
    (spark, dir) => {
      val e = Tables(spark, dir, "embeddings")
      val probe = broadcast(e.filter(col("vec_id") === 0).select(col("embedding").as("p")))
      e.filter(col("vec_id") =!= 0)
        .crossJoin(probe)
        .select(col("vec_id"),
          pround(VectorOps.cosine(col("embedding"), col("p")), 4).as("cos"))
        .orderBy(col("cos").desc, col("vec_id"))
        .limit(10)
    },
    Some("""WITH probe AS (SELECT CAST(embedding AS DOUBLE[]) AS p FROM embeddings WHERE vec_id = 0)
            SELECT vec_id,
              FLOOR((list_cosine_similarity(CAST(embedding AS DOUBLE[]), p)) * 10000 + 0.5) / 10000 AS cos
            FROM embeddings, probe WHERE vec_id <> 0
            ORDER BY cos DESC, vec_id LIMIT 10"""))

  /** Approximate KNN via 4 random-hyperplane LSH bits (16 buckets): only
    * vectors sharing the probe's bucket are scored. The bucket id is a pure
    * per-row projection over inlined sign constants; at scale the candidate
    * scan reads ~1/16th of the data and everything stays shuffle-free up to
    * the final top-k.
    */
  private val knnLsh = Q(
    "q_knn_lsh",
    (spark, dir) => {
      val signs = planeSigns(4, embeddingDim(spark, dir))
      val bucket = concat(
        signs.map(s => when(signedDot(col("embedding"), s) > 0, lit("1")).otherwise(lit("0"))): _*)
      val e = Tables(spark, dir, "embeddings").withColumn("bk", bucket)
      val probe = broadcast(
        e.filter(col("vec_id") === 0).select(col("embedding").as("p"), col("bk").as("pbk")))
      e.filter(col("vec_id") =!= 0)
        .join(probe, col("bk") === col("pbk"))
        .select(col("vec_id"), col("bk"),
          pround(VectorOps.cosine(col("embedding"), col("p")), 4).as("cos"))
        .orderBy(col("cos").desc, col("vec_id"))
        .limit(10)
    },
    Some("""WITH dims AS (SELECT CAST(COALESCE(MAX(len(embedding)), 0) AS BIGINT) AS nd
                          FROM embeddings),
            planes AS (
              SELECT p, d,
                CASE WHEN substr(md5('p' || CAST(p AS VARCHAR) || '-' || CAST(d AS VARCHAR)), 1, 1)
                     IN ('8','9','a','b','c','d','e','f') THEN 1.0 ELSE -1.0 END AS sgn
              FROM dims, UNNEST(generate_series(0, 3)) AS a(p),
                   UNNEST(generate_series(1, dims.nd)) AS b(d)),
            dots AS (SELECT e.vec_id, pl.p,
                       SUM(pl.sgn * CAST(e.embedding[pl.d] AS DOUBLE)) AS dp
                     FROM embeddings e CROSS JOIN planes pl GROUP BY e.vec_id, pl.p),
            buckets AS (SELECT vec_id,
                          string_agg(CASE WHEN dp > 0 THEN '1' ELSE '0' END, '' ORDER BY p) AS bk
                        FROM dots GROUP BY vec_id),
            probe AS (SELECT CAST(e.embedding AS DOUBLE[]) AS p, b.bk AS pbk
                      FROM embeddings e JOIN buckets b ON e.vec_id = b.vec_id
                      WHERE e.vec_id = 0)
            SELECT e.vec_id AS vec_id, b.bk,
              FLOOR((list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), probe.p)) * 10000 + 0.5) / 10000 AS cos
            FROM embeddings e
            JOIN buckets b ON e.vec_id = b.vec_id, probe
            WHERE b.bk = probe.pbk AND e.vec_id <> 0
            ORDER BY cos DESC, e.vec_id LIMIT 10"""))

  /** Embedding-cosine near-duplicate detection: top-20 most-similar pairs
    * within a bounded id window. The bounded all-pairs join is the exact
    * verifier; the LSH bucketing above is the candidate generator at scale.
    */
  private val dedupEmbed = Q(
    "q_dedup_embed",
    (spark, dir) => {
      val e = Tables(spark, dir, "embeddings").filter(col("vec_id") < 100)
      val a = e.select(col("vec_id").as("vec_a"), col("embedding").as("ea"))
      val b = e.select(col("vec_id").as("vec_b"), col("embedding").as("eb"))
      a.join(broadcast(b), col("vec_a") < col("vec_b"))
        .select(col("vec_a"), col("vec_b"),
          pround(VectorOps.cosine(col("ea"), col("eb")), 4).as("cos"))
        .orderBy(col("cos").desc, col("vec_a"), col("vec_b"))
        .limit(20)
    },
    Some("""SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
              FLOOR((list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                           CAST(b.embedding AS DOUBLE[]))) * 10000 + 0.5) / 10000 AS cos
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE a.vec_id < 100 AND b.vec_id < 100
            ORDER BY cos DESC, vec_a, vec_b LIMIT 20"""))

  /** Per-label mean embedding (centroid) via dimension-parallel
    * aggregation: posexplode fans each vector into (dim, value) rows, so
    * the average is a plain partial+final aggregate keyed on
    * (label, dim) — the shape that scales to any vector count because no
    * single task ever holds more than one dimension stripe of state.
    * First 8 dimensions reported.
    */
  private val embedCentroid = Q(
    "q_embed_centroid",
    (spark, dir) =>
      Tables(spark, dir, "embeddings")
        // slice BEFORE exploding: 8 rows per vector enter the shuffle
        // instead of 64 (the projection can't push into the parquet scan,
        // but it can avoid fanning out dimensions we drop anyway)
        .select(col("label"), posexplode(slice(col("embedding"), 1, 8)).as(Seq("dim", "v")))
        .groupBy(col("label"), col("dim"))
        .agg(pround(avg(col("v")), 4).as("centroid"), count(lit(1)).as("n"))
        .orderBy(col("label"), col("dim")),
    Some("""SELECT label, CAST(i - 1 AS INT) AS dim,
              FLOOR((AVG(embedding[i])) * 10000 + 0.5) / 10000 AS centroid,
              CAST(COUNT(*) AS BIGINT) AS n
            FROM embeddings, UNNEST(generate_series(1, len(embedding))) AS u(i)
            WHERE i <= 8 GROUP BY label, i ORDER BY label, dim"""))

  /** KNN similarity *join*: every vector gets its top-3 cosine neighbors
    * from within its LSH bucket — the all-points variant of q_knn_lsh
    * (a probe query answers one lookup; a similarity join materializes
    * the neighbor graph, the input to embedding dedup and clustering).
    * The plane count is data-driven ([[planesFor]]: one cheap count, then
    * the smallest k ≥ 4 keeping expected bucket population ≤ 32), so the
    * bucket equi-join's candidate generation stays linear-per-row as the
    * corpus grows — at sf0.01 (500 vectors) 4 planes, at sf0.1 (2000)
    * 6 planes, at 100 TB the same formula keeps buckets task-sized.
    * Ranking windows partition by vec_a (high cardinality, unbounded
    * parallelism); the DuckDB oracle derives the identical plane count
    * from its own COUNT(*), so both engines bucket identically.
    */
  private val knnJoin = Q(
    "q_knn_join",
    (spark, dir) => {
      // bounded driver scalar (like the k-means model state): row count
      // drives the LSH depth; the scan is metadata-cheap on parquet
      val n = Tables(spark, dir, "embeddings").count()
      val signs = planeSigns(planesFor(n), embeddingDim(spark, dir))
      val bucket = concat(
        signs.map(s => when(signedDot(col("embedding"), s) > 0, lit("1")).otherwise(lit("0"))): _*)
      val e = Tables(spark, dir, "embeddings")
        .select(col("vec_id"), col("embedding"), bucket.as("bk"))
      val a = e.select(col("vec_id").as("vec_a"), col("embedding").as("ea"), col("bk"))
      val b = e.select(col("vec_id").as("vec_b"), col("embedding").as("eb"), col("bk"))
      val cand = a.join(b, "bk").filter(col("vec_a") =!= col("vec_b"))
        .select(col("vec_a"), col("vec_b"),
          pround(VectorOps.cosine(col("ea"), col("eb")), 4).as("cos"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("vec_a")).orderBy(col("cos").desc, col("vec_b"))
      cand.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3 && col("vec_a") < 50)
        .select(col("vec_a"), col("rn").cast("int").as("rn"), col("vec_b"), col("cos"))
        .orderBy(col("vec_a"), col("rn"))
    },
    Some("""WITH np AS (
              SELECT MIN(k) AS np
              FROM UNNEST(generate_series(4, 20)) AS t(k),
                   (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM embeddings) c
              WHERE (CAST(32 AS BIGINT) << k) >= c.n OR k = 20),
            dims AS (SELECT CAST(COALESCE(MAX(len(embedding)), 0) AS BIGINT) AS nd
                     FROM embeddings),
            planes AS (
              SELECT p, d,
                CASE WHEN substr(md5('p' || CAST(p AS VARCHAR) || '-' || CAST(d AS VARCHAR)), 1, 1)
                     IN ('8','9','a','b','c','d','e','f') THEN 1.0 ELSE -1.0 END AS sgn
              FROM np, dims, UNNEST(generate_series(0, np.np - 1)) AS a(p),
                   UNNEST(generate_series(1, dims.nd)) AS b(d)),
            dots AS (SELECT e.vec_id, pl.p,
                       SUM(pl.sgn * CAST(e.embedding[pl.d] AS DOUBLE)) AS dp
                     FROM embeddings e CROSS JOIN planes pl GROUP BY e.vec_id, pl.p),
            buckets AS (SELECT vec_id,
                          string_agg(CASE WHEN dp > 0 THEN '1' ELSE '0' END, '' ORDER BY p) AS bk
                        FROM dots GROUP BY vec_id),
            cand AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                       FLOOR((list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),
                                                     CAST(eb.embedding AS DOUBLE[]))) * 10000 + 0.5) / 10000 AS cos
                     FROM buckets a JOIN buckets b ON a.bk = b.bk AND a.vec_id <> b.vec_id
                     JOIN embeddings ea ON ea.vec_id = a.vec_id
                     JOIN embeddings eb ON eb.vec_id = b.vec_id),
            ranked AS (SELECT vec_a, vec_b, cos,
                         row_number() OVER (PARTITION BY vec_a ORDER BY cos DESC, vec_b) AS rn
                       FROM cand)
            SELECT vec_a, CAST(rn AS INT) AS rn, vec_b, cos
            FROM ranked WHERE rn <= 3 AND vec_a < 50 ORDER BY vec_a, rn"""))

  /** Recall@10 audit of the LSH index against the exact brute-force
    * baseline, for probe vec_id = 0 — the quality gate every approximate
    * similarity index ships with (is the bucketing recalling enough of
    * the true neighbors to be usable?). Both top-10 sets are bounded
    * (TakeOrdered heads), so the intersection join and the census row
    * are driver-scale regardless of corpus size; the expensive parts are
    * exactly the two production query plans being audited.
    */
  private val annRecall = Q(
    "q_ann_recall",
    (spark, dir) => {
      val e = Tables(spark, dir, "embeddings")
      val probe = broadcast(e.filter(col("vec_id") === 0)
        .select(col("embedding").as("p")))
      val brute = e.filter(col("vec_id") =!= 0)
        .crossJoin(probe)
        .select(col("vec_id"),
          pround(VectorOps.cosine(col("embedding"), col("p")), 4).as("cos"))
        .orderBy(col("cos").desc, col("vec_id"))
        .limit(10)
      val signs = planeSigns(4, embeddingDim(spark, dir))
      val bucket = concat(
        signs.map(s => when(signedDot(col("embedding"), s) > 0, lit("1")).otherwise(lit("0"))): _*)
      val eb = e.withColumn("bk", bucket)
      val probeB = broadcast(eb.filter(col("vec_id") === 0)
        .select(col("embedding").as("p"), col("bk").as("pbk")))
      val lsh = eb.filter(col("vec_id") =!= 0)
        .join(probeB, col("bk") === col("pbk"))
        .select(col("vec_id"),
          pround(VectorOps.cosine(col("embedding"), col("p")), 4).as("cos"))
        .orderBy(col("cos").desc, col("vec_id"))
        .limit(10)
      brute.select(col("vec_id"))
        .join(lsh.select(col("vec_id").as("lv")), col("vec_id") === col("lv"), "left")
        .agg(count(lit(1)).cast("int").as("k"),
          count(col("lv")).cast("int").as("hits"))
        .select(col("k"), col("hits"),
          // empty-corpus guard (k = 0): the q_minhash_recall NULL rule
          when(col("k") === 0, lit(null).cast("double"))
            .otherwise(pround(col("hits").cast("double") / col("k").cast("double"), 4))
            .as("recall"))
    },
    Some("""WITH probe0 AS (SELECT CAST(embedding AS DOUBLE[]) AS p FROM embeddings WHERE vec_id = 0),
            brute AS (SELECT vec_id,
                        FLOOR((list_cosine_similarity(CAST(embedding AS DOUBLE[]), p)) * 10000 + 0.5) / 10000 AS cos
                      FROM embeddings, probe0 WHERE vec_id <> 0
                      ORDER BY cos DESC, vec_id LIMIT 10),
            dims AS (SELECT CAST(COALESCE(MAX(len(embedding)), 0) AS BIGINT) AS nd
                     FROM embeddings),
            planes AS (
              SELECT p, d,
                CASE WHEN substr(md5('p' || CAST(p AS VARCHAR) || '-' || CAST(d AS VARCHAR)), 1, 1)
                     IN ('8','9','a','b','c','d','e','f') THEN 1.0 ELSE -1.0 END AS sgn
              FROM dims, UNNEST(generate_series(0, 3)) AS a(p),
                   UNNEST(generate_series(1, dims.nd)) AS b(d)),
            dots AS (SELECT e.vec_id, pl.p,
                       SUM(pl.sgn * CAST(e.embedding[pl.d] AS DOUBLE)) AS dp
                     FROM embeddings e CROSS JOIN planes pl GROUP BY e.vec_id, pl.p),
            buckets AS (SELECT vec_id,
                          string_agg(CASE WHEN dp > 0 THEN '1' ELSE '0' END, '' ORDER BY p) AS bk
                        FROM dots GROUP BY vec_id),
            pb AS (SELECT e.vec_id, CAST(e.embedding AS DOUBLE[]) AS p, b.bk AS pbk
                   FROM embeddings e JOIN buckets b ON e.vec_id = b.vec_id
                   WHERE e.vec_id = 0),
            lsh AS (SELECT e.vec_id,
                      FLOOR((list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), pb.p)) * 10000 + 0.5) / 10000 AS cos
                    FROM embeddings e JOIN buckets b ON e.vec_id = b.vec_id, pb
                    WHERE b.bk = pb.pbk AND e.vec_id <> 0
                    ORDER BY cos DESC, e.vec_id LIMIT 10)
            SELECT CAST(COUNT(*) AS INT) AS k,
              CAST(COUNT(lsh.vec_id) AS INT) AS hits,
              CASE WHEN COUNT(*) = 0 THEN NULL
                   ELSE FLOOR((CAST(COUNT(lsh.vec_id) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))
                     * 10000 + 0.5) / 10000 END AS recall
            FROM brute LEFT JOIN lsh ON brute.vec_id = lsh.vec_id"""))

  /** Semantic (SemDeDup-style) embedding dedup: partition the corpus by
    * nearest seed centroid, then flag within-cluster pairs above a
    * cosine threshold and drop the higher id of each pair. The cluster
    * assignment bounds the candidate self-join to cluster-sized blocks —
    * the same all-pairs-avoidance as the LSH buckets, but semantic: near
    * duplicates land in the same cluster because they are close to the
    * same centroid, not because they hash together. The centroid count
    * is data-driven ([[semanticK]]: one cheap count, then k = max(8,
    * ceil(n/128)) — SemDeDup's k ≈ n/target knob), so cluster blocks
    * stay task-sized at any corpus size instead of growing as n/8; the
    * seeds are the k vectors with the smallest md5(vec_id) — a
    * hash-scattered pick both engines derive identically, not a prefix
    * of the id space. The k×dim seed matrix is driver model state like
    * the k-means trainer's (at 100 TB, where k itself outgrows a
    * broadcast, assignment goes hierarchical/IVF — same recipe, staged).
    * Reported per cluster: members, flagged duplicates, survivors.
    */
  private val dedupSemantic = Q(
    "q_dedup_semantic",
    (spark, dir) => {
      val e = Tables(spark, dir, "embeddings")
        .select(col("vec_id"), col("embedding"))
      // bounded driver scalar: the row count turns the SemDeDup k knob
      val k = semanticK(e.count())
      val cents = e
        .select(col("vec_id"), col("embedding"),
          md5(col("vec_id").cast("string")).as("h"))
        .orderBy(col("h"), col("vec_id"))
        .limit(k)
        .collect() // k×64 floats: driver model state, like the k-means init
        .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
        .toSeq.sortBy(_._1)
      val assigned = Caches.persisted(KMeans.assign(e, cents))
      val a = assigned.select(col("cluster"), col("vec_id").as("vec_a"),
        col("embedding").as("ea"))
      val b = assigned.select(col("cluster"), col("vec_id").as("vec_b"),
        col("embedding").as("eb"))
      val dups = a.join(b, Seq("cluster"))
        .filter(col("vec_a") < col("vec_b") &&
          VectorOps.cosine(col("ea"), col("eb")) >= 0.40)
        .groupBy(col("cluster"))
        .agg(countDistinct(col("vec_b")).cast("bigint").as("n_dupes"))
      assigned.groupBy(col("cluster"))
        .agg(count(lit(1)).cast("bigint").as("n_members"))
        .join(dups, Seq("cluster"), "left")
        .select(col("cluster"), col("n_members"),
          coalesce(col("n_dupes"), lit(0L)).as("n_dupes"),
          (col("n_members") - coalesce(col("n_dupes"), lit(0L))).as("n_kept"))
        .orderBy(col("cluster"))
    },
    Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
            kc AS (SELECT GREATEST(CAST(8 AS BIGINT),
                     (COUNT(*) + 127) // 128) AS k FROM embeddings),
            c0 AS (SELECT vec_id AS cid, v AS c FROM (
                     SELECT vec_id, v,
                       row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS srn
                     FROM e), kc
                   WHERE srn <= kc.k),
            assigned AS (SELECT vec_id, cid AS cluster, v FROM (
                           SELECT e.vec_id, c0.cid, e.v,
                             row_number() OVER (PARTITION BY e.vec_id
                               ORDER BY list_cosine_similarity(e.v, c0.c) DESC, c0.cid) AS rn
                           FROM e CROSS JOIN c0) WHERE rn = 1),
            dups AS (SELECT a.cluster, CAST(COUNT(DISTINCT b.vec_id) AS BIGINT) AS n_dupes
                     FROM assigned a JOIN assigned b
                       ON a.cluster = b.cluster AND a.vec_id < b.vec_id
                      AND list_cosine_similarity(a.v, b.v) >= 0.40
                     GROUP BY a.cluster)
            SELECT a.cluster, CAST(COUNT(*) AS BIGINT) AS n_members,
              COALESCE(MIN(d.n_dupes), 0) AS n_dupes,
              CAST(COUNT(*) AS BIGINT) - COALESCE(MIN(d.n_dupes), 0) AS n_kept
            FROM assigned a LEFT JOIN dups d ON d.cluster = a.cluster
            GROUP BY a.cluster ORDER BY a.cluster"""))

  /** Quantized ANN search — the memory-bound production shape (FAISS's
    * asymmetric distance computation, ADC, here over the scalar-int8
    * codebook q_embed_quantize already calibrates; PQ proper swaps the
    * per-dimension codebook for per-subspace centroids, same funnel).
    * The CORPUS side is quantized to int8 with the per-dimension abs-max
    * scale (4× fewer bytes to scan than float32 — at 100 TB the index
    * that fits in executor memory is the one that gets used); the PROBE
    * stays float. Search runs the quantized scan first — approximate
    * score Σ_d p_d · q_d · (amax_d / 127), each term floored to integer
    * µunits BEFORE the sum so the aggregate is exact integer arithmetic
    * with no float summation-order knife edges (the q_dsir_weights
    * funnel) — keeps the top-50 shortlist, then re-ranks exactly with
    * full-precision cosine and reports recall@10 of the final top-10
    * against the q_knn_brute baseline (the q_ann_recall quality-gate
    * shape).
    *
    * Scale posture: calibration is a 64-row broadcast; the probe is a
    * 64-row broadcast; the quantized scan is one pass with a
    * TakeOrdered(50) head (no shuffle of embedding data beyond the
    * per-vec_id partial sum); the re-rank touches exactly 50 vectors.
    */
  private val knnPq = Q(
    "q_knn_pq",
    (spark, dir) => {
      val e = Tables(spark, dir, "embeddings")
      val x = e.select(col("vec_id"), posexplode(col("embedding")).as(Seq("d0", "xf")))
        .select(col("vec_id"), (col("d0") + 1).as("d"), col("xf").cast("double").as("x"))
      val cal = broadcast(x.groupBy(col("d")).agg(max(abs(col("x"))).as("amax")))
      val xq = x.join(cal, "d")
        .select(col("vec_id"), col("d"), col("amax"),
          when(col("amax") === 0d, lit(0d)).otherwise(
            greatest(lit(-127d), least(lit(127d),
              floor(col("x") / (col("amax") / 127d) + 0.5d)))).as("q"))
      val probeD = broadcast(x.filter(col("vec_id") === 0)
        .select(col("d"), col("x").as("p")))
      val approx = xq.filter(col("vec_id") =!= 0)
        .join(probeD, "d")
        .select(col("vec_id"),
          when(col("amax") === 0d, lit(0L)).otherwise(
            floor(col("p") * col("q") * (col("amax") / lit(127d)) * lit(1e6d))
              .cast("long")).as("t"))
        .groupBy(col("vec_id")).agg(sum(col("t")).as("approx_u"))
      val short50 = approx.orderBy(col("approx_u").desc, col("vec_id")).limit(50)
      val pv = broadcast(e.filter(col("vec_id") === 0)
        .select(col("embedding").as("pvec")))
      val rerank = short50.join(e.select(col("vec_id"), col("embedding")), "vec_id")
        .crossJoin(pv)
        .select(col("vec_id"),
          pround(VectorOps.cosine(col("embedding"), col("pvec")), 4).as("cos"))
        .orderBy(col("cos").desc, col("vec_id"))
        .limit(10)
      val brute = e.filter(col("vec_id") =!= 0)
        .crossJoin(pv)
        .select(col("vec_id"),
          pround(VectorOps.cosine(col("embedding"), col("pvec")), 4).as("cos"))
        .orderBy(col("cos").desc, col("vec_id"))
        .limit(10)
      brute.select(col("vec_id"))
        .join(rerank.select(col("vec_id").as("pq")), col("vec_id") === col("pq"), "left")
        .agg(count(lit(1)).cast("int").as("k"),
          count(col("pq")).cast("int").as("hits"))
        .select(col("k"), col("hits"),
          // empty-corpus guard (k = 0): the q_minhash_recall NULL rule
          when(col("k") === 0, lit(null).cast("double"))
            .otherwise(pround(col("hits").cast("double") / col("k").cast("double"), 4))
            .as("recall"))
    },
    Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
            x AS (SELECT vec_id, t.d, v[t.d] AS x
                  FROM e, UNNEST(generate_series(1, len(v))) AS t(d)),
            cal AS (SELECT d, MAX(ABS(x)) AS amax FROM x GROUP BY d),
            qz AS (SELECT x.vec_id, x.d, cal.amax,
                     CASE WHEN cal.amax = 0 THEN 0
                          ELSE GREATEST(-127, LEAST(127,
                            FLOOR(x.x / (cal.amax / 127) + 0.5)))
                     END AS q
                   FROM x JOIN cal ON x.d = cal.d),
            pr AS (SELECT d, x AS p FROM x WHERE vec_id = 0),
            ap AS (SELECT qz.vec_id,
                     SUM(CASE WHEN qz.amax = 0 THEN 0
                              ELSE CAST(FLOOR(pr.p * qz.q * (qz.amax / 127) * 1000000.0)
                                AS BIGINT) END) AS approx_u
                   FROM qz JOIN pr ON pr.d = qz.d
                   WHERE qz.vec_id <> 0 GROUP BY qz.vec_id),
            short AS (SELECT vec_id FROM ap ORDER BY approx_u DESC, vec_id LIMIT 50),
            pv AS (SELECT v FROM e WHERE vec_id = 0),
            rr AS (SELECT e.vec_id,
                     FLOOR((list_cosine_similarity(e.v, pv.v)) * 10000 + 0.5) / 10000 AS cos
                   FROM e JOIN short s ON e.vec_id = s.vec_id, pv
                   ORDER BY cos DESC, e.vec_id LIMIT 10),
            brute AS (SELECT e.vec_id,
                        FLOOR((list_cosine_similarity(e.v, pv.v)) * 10000 + 0.5) / 10000 AS cos
                      FROM e, pv WHERE e.vec_id <> 0
                      ORDER BY cos DESC, e.vec_id LIMIT 10)
            SELECT CAST(COUNT(*) AS INT) AS k,
              CAST(COUNT(rr.vec_id) AS INT) AS hits,
              CASE WHEN COUNT(*) = 0 THEN NULL
                   ELSE FLOOR((CAST(COUNT(rr.vec_id) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))
                     * 10000 + 0.5) / 10000 END AS recall
            FROM brute LEFT JOIN rr ON brute.vec_id = rr.vec_id"""))

  /** Hard-negative mining — the contrastive-training data prep step
    * (retrieval/embedding trainers sample negatives that are SIMILAR but
    * not top matches; random negatives are too easy and top-k are
    * presumed positives): for each of the 5 probe vectors (vec_id 0–4),
    * the rank-11..30 cosine band over the corpus. This brute arm is the
    * exact baseline; at index scale the same band comes off
    * q_knn_ivf/q_knn_pq's shortlist, identical downstream shape.
    *
    * Scale posture: five bounded TakeOrdered(30) heads (per-partition
    * top-k merges over one probe-broadcast scan each — never a global
    * sort); the rank window runs over the 150-row union only.
    */
  private val hardNegatives = Q(
    "q_hard_negatives",
    (spark, dir) => {
      import org.apache.spark.sql.expressions.Window
      val e = Tables(spark, dir, "embeddings")
      val heads = (0L until 5L).map { p =>
        val probe = broadcast(e.filter(col("vec_id") === p)
          .select(col("embedding").as("pv")))
        e.filter(col("vec_id") =!= p)
          .crossJoin(probe)
          .select(lit(p).as("probe_id"), col("vec_id"),
            pround(VectorOps.cosine(col("embedding"), col("pv")), 4).as("cos"))
          .orderBy(col("cos").desc, col("vec_id"))
          .limit(30)
      }.reduce(_ unionAll _)
      val byProbe = Window.partitionBy(col("probe_id"))
        .orderBy(col("cos").desc, col("vec_id"))
      heads.withColumn("rank", row_number().over(byProbe))
        .filter(col("rank") > 10)
        .select(col("probe_id"), col("rank"), col("vec_id"), col("cos"))
        .orderBy(col("probe_id"), col("rank"))
    },
    Some({
      val arms = (0 until 5).map { p =>
        s"""h$p AS (SELECT $p AS probe_id, e.vec_id,
                      FLOOR((list_cosine_similarity(e.v, pv.v)) * 10000 + 0.5) / 10000 AS cos
                    FROM e, (SELECT v FROM e WHERE vec_id = $p) pv
                    WHERE e.vec_id <> $p
                    ORDER BY cos DESC, e.vec_id LIMIT 30)"""
      }.mkString(",\n")
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
          $arms,
          u AS (SELECT * FROM h0 UNION ALL SELECT * FROM h1 UNION ALL SELECT * FROM h2
                UNION ALL SELECT * FROM h3 UNION ALL SELECT * FROM h4),
          r AS (SELECT probe_id, vec_id, cos,
                  row_number() OVER (PARTITION BY probe_id
                    ORDER BY cos DESC, vec_id) AS rank
                FROM u)
          SELECT CAST(probe_id AS BIGINT) AS probe_id, CAST(rank AS INT) AS rank,
            vec_id, cos
          FROM r WHERE rank > 10 ORDER BY probe_id, rank"""
    }))

  /** Multi-probe LSH (Lv et al. 2007) — recall without more hash
    * tables: beside the probe's own bucket, query the 4 buckets at
    * Hamming distance 1 (one hyperplane bit flipped — the buckets a
    * near-boundary neighbor most likely fell into), and report the
    * single-bucket vs multi-probe candidate counts and true-top-10 hits
    * side by side: the measured recall/candidates trade-off that
    * decides probe depth in production. Ground truth is the bounded
    * brute-force top-10 (the q_knn_brute oracle posture).
    *
    * Scale posture: the probe-key set is 5 strings broadcast into one
    * semi-join against the bucketed scan — candidates grow 5×, hash
    * tables and stored state do not grow at all (the multi-probe
    * claim).
    */
  private val multiprobeLsh = Q(
    "q_multiprobe_lsh",
    (spark, dir) => {
      val signs = planeSigns(4, embeddingDim(spark, dir))
      val bucket = concat(
        signs.map(s => when(signedDot(col("embedding"), s) > 0, lit("1")).otherwise(lit("0"))): _*)
      val e = graft.Caches.persisted(
        Tables(spark, dir, "embeddings").withColumn("bk", bucket))
      val probe = e.filter(col("vec_id") === 0)
        .select(col("embedding").as("p"), col("bk").as("pbk"))
      val flips = (0 until 4).map { i =>
        concat(substring(col("pbk"), 1, i),
          when(substring(col("pbk"), i + 1, 1) === "1", lit("0")).otherwise(lit("1")),
          substring(col("pbk"), i + 2, 4))
      }
      val pkeys = broadcast(probe.select(col("pbk"),
        explode(array(col("pbk") +: flips: _*)).as("pk")))
      val top10 = graft.Caches.persisted(
        e.filter(col("vec_id") =!= 0)
          .crossJoin(broadcast(probe.select(col("p"))))
          .select(col("vec_id"),
            pround(VectorOps.cosine(col("embedding"), col("p")), 4).as("cos"))
          .orderBy(col("cos").desc, col("vec_id")).limit(10)
          .select(col("vec_id").as("tv")))
      val cands = graft.Caches.persisted(
        e.filter(col("vec_id") =!= 0)
          .join(pkeys, col("bk") === col("pk"))
          .select(col("vec_id"), (col("pk") === col("pbk")).as("own"))
          .distinct())
      def report(rel: org.apache.spark.sql.DataFrame, method: String)
          : org.apache.spark.sql.DataFrame =
        rel.join(top10, col("vec_id") === col("tv"), "left")
          .agg(count(lit(1)).cast("bigint").as("n_cand"),
            count(col("tv")).cast("bigint").as("hits10"))
          .select(lit(method).as("method"), col("n_cand"), col("hits10"))
      report(cands.filter(col("own")), "single")
        .unionAll(report(cands, "multiprobe"))
        .orderBy(col("method"))
    },
    Some("""WITH dims AS (SELECT CAST(COALESCE(MAX(len(embedding)), 0) AS BIGINT) AS nd
                          FROM embeddings),
            planes AS (
              SELECT p, d,
                CASE WHEN substr(md5('p' || CAST(p AS VARCHAR) || '-' || CAST(d AS VARCHAR)), 1, 1)
                     IN ('8','9','a','b','c','d','e','f') THEN 1.0 ELSE -1.0 END AS sgn
              FROM dims, UNNEST(generate_series(0, 3)) AS a(p),
                   UNNEST(generate_series(1, dims.nd)) AS b(d)),
            dots AS (SELECT e.vec_id, pl.p,
                       SUM(pl.sgn * CAST(e.embedding[pl.d] AS DOUBLE)) AS dp
                     FROM embeddings e CROSS JOIN planes pl GROUP BY e.vec_id, pl.p),
            buckets AS (SELECT vec_id,
                          string_agg(CASE WHEN dp > 0 THEN '1' ELSE '0' END, '' ORDER BY p) AS bk
                        FROM dots GROUP BY vec_id),
            probe AS (SELECT CAST(e.embedding AS DOUBLE[]) AS p, b.bk AS pbk
                      FROM embeddings e JOIN buckets b ON e.vec_id = b.vec_id
                      WHERE e.vec_id = 0),
            pkeys AS (SELECT pbk, pbk AS pk FROM probe
                      UNION ALL
                      SELECT pbk,
                        substr(pbk, 1, i) ||
                        (CASE WHEN substr(pbk, i + 1, 1) = '1' THEN '0' ELSE '1' END) ||
                        substr(pbk, i + 2, 4) AS pk
                      FROM probe, UNNEST(generate_series(0, 3)) AS u(i)),
            top10 AS (SELECT e.vec_id AS tv
                      FROM embeddings e, probe
                      WHERE e.vec_id <> 0
                      ORDER BY FLOOR((list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), probe.p)) * 10000 + 0.5) / 10000 DESC,
                        e.vec_id LIMIT 10),
            cands AS (SELECT DISTINCT b.vec_id, k.pk = k.pbk AS own
                      FROM buckets b JOIN pkeys k ON b.bk = k.pk
                      WHERE b.vec_id <> 0),
            rep AS (
              SELECT 'single' AS method,
                CAST(COUNT(*) AS BIGINT) AS n_cand,
                CAST(COUNT(*) FILTER (WHERE vec_id IN (SELECT tv FROM top10)) AS BIGINT) AS hits10
              FROM cands WHERE own
              UNION ALL
              SELECT 'multiprobe', CAST(COUNT(*) AS BIGINT),
                CAST(COUNT(*) FILTER (WHERE vec_id IN (SELECT tv FROM top10)) AS BIGINT)
              FROM cands)
            SELECT method, n_cand, hits10 FROM rep ORDER BY method"""))

  /** PERSISTED ANN index + delta probe — the vector twin of
    * q_dedup_incremental's signature store (VERDICT r11 task 3): the
    * base corpus's LSH bucket assignments (vec_id, bucket key, vector)
    * persist ONCE as an 8-bucket sorted external table keyed on the
    * bucket string (the q_bucketed_join sink), and tonight's probe
    * batch (vec_id ≡ 0 mod 10) reads the STORED layout with zero
    * store-side exchange (plan-pinned undemoted; the only exchanges
    * hash the probe-derived relation into the 8 store buckets — probe
    * cost scales with batch mass, not corpus mass). Each probe gets its
    * top-3 cosine neighbors from its bucket's candidates (rounded-then-
    * ranked, vec_id tiebreak — the q_knn_join discipline). Plane depth
    * is data-driven from the BASE population ([[planesFor]]), so the
    * stored index keeps buckets task-sized as the corpus grows.
    *
    * The recall audit rides along on a bounded probe subset (vec_id <
    * 50, ≤5 probes at any sf — the q_knn_join vec_a < 50 posture): hit
    * = 1 iff the index-served neighbor is in that probe's exact
    * brute-force top-3 over the full base side, NULL for unaudited
    * probes. The full probe batch flows through the index channel; only
    * the quadratic ground-truth arm is sampled — exactly what a
    * production recall monitor does.
    *
    * Oracle: DuckDB replays the store contents as pure CTEs (base-count
    * plane depth, identical md5 plane grid, identical round-then-rank),
    * so the replay is exact.
    */
  private val annIncremental = Q(
    "q_ann_incremental",
    (spark, dir) => {
      val key = StoreToken(spark, dir)
      val wh = s"/tmp/graft_annstore_$key"
      val storeT = s"g_ann_store_$key"
      val e = Tables(spark, dir, "embeddings")
      val base = e.filter(col("vec_id") % 10 =!= 0)
      // bounded driver scalars (the q_knn_join precedent): base count
      // drives the stored LSH depth; dim read as MAX(size) like every oracle
      val nBase = base.count()
      val signs = planeSigns(planesFor(nBase), embeddingDim(spark, dir))
      val bucket = concat(
        signs.map(s => when(signedDot(col("embedding"), s) > 0, lit("1")).otherwise(lit("0"))): _*)
      StoreOnce(wh) {
        graft.operators.BucketedWorkspace.cleanupOnExit(wh)
        base.select(col("vec_id"), bucket.as("bk"), col("embedding"))
          .write.mode("overwrite").bucketBy(8, "bk").sortBy("bk")
          .option("path", s"$wh/index").saveAsTable(storeT)
      }
      val store = spark.table(storeT)
        .select(col("vec_id").as("nb"), col("bk"), col("embedding").as("se"))
      val probes = graft.Caches.persisted(
        e.filter(col("vec_id") % 10 === 0)
          .select(col("vec_id").as("pid"), bucket.as("bk"), col("embedding").as("pe")))
      val cand = probes.join(store.hint("merge"), "bk")
        .select(col("pid"),
          pround(VectorOps.cosine(col("pe"), col("se")), 4).as("cos"), col("nb"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("pid")).orderBy(col("cos").desc, col("nb"))
      val ann = cand.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      // ground-truth arm: bounded probe sample × full base side
      val baseAll = e.filter(col("vec_id") % 10 =!= 0)
        .select(col("vec_id").as("xm"), col("embedding").as("xe"))
      val exCand = baseAll
        .crossJoin(broadcast(probes.filter(col("pid") < 50)
          .select(col("pid").as("xp"), col("pe").as("xpe"))))
        .select(col("xp"),
          pround(VectorOps.cosine(col("xpe"), col("xe")), 4).as("xcos"), col("xm"))
      val xw = org.apache.spark.sql.expressions.Window
        .partitionBy(col("xp")).orderBy(col("xcos").desc, col("xm"))
      val exact = exCand.withColumn("xrn", row_number().over(xw))
        .filter(col("xrn") <= 3).select(col("xp"), col("xm"))
      ann.join(exact, col("pid") === col("xp") && col("nb") === col("xm"), "left")
        .select(col("pid").as("probe_id"), col("rn").cast("int").as("rn"),
          col("nb"), col("cos"),
          when(col("pid") >= 50, lit(null).cast("int"))
            .otherwise(when(col("xp").isNotNull, lit(1)).otherwise(lit(0)).cast("int"))
            .as("hit"))
        .orderBy(col("probe_id"), col("rn"))
    },
    Some("""WITH bcnt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM embeddings
                          WHERE vec_id % 10 <> 0),
            np AS (SELECT MIN(k) AS np
                   FROM UNNEST(generate_series(4, 20)) AS t(k), bcnt
                   WHERE (CAST(32 AS BIGINT) << k) >= bcnt.n OR k = 20),
            dims AS (SELECT CAST(COALESCE(MAX(len(embedding)), 0) AS BIGINT) AS nd
                     FROM embeddings),
            planes AS (
              SELECT p, d,
                CASE WHEN substr(md5('p' || CAST(p AS VARCHAR) || '-' || CAST(d AS VARCHAR)), 1, 1)
                     IN ('8','9','a','b','c','d','e','f') THEN 1.0 ELSE -1.0 END AS sgn
              FROM np, dims, UNNEST(generate_series(0, np.np - 1)) AS a(p),
                   UNNEST(generate_series(1, dims.nd)) AS b(d)),
            dots AS (SELECT e.vec_id, pl.p,
                       SUM(pl.sgn * CAST(e.embedding[pl.d] AS DOUBLE)) AS dp
                     FROM embeddings e CROSS JOIN planes pl GROUP BY e.vec_id, pl.p),
            buckets AS (SELECT vec_id,
                          string_agg(CASE WHEN dp > 0 THEN '1' ELSE '0' END, '' ORDER BY p) AS bk
                        FROM dots GROUP BY vec_id),
            store AS (SELECT b.vec_id AS nb, b.bk, CAST(e.embedding AS DOUBLE[]) AS se
                      FROM buckets b JOIN embeddings e ON e.vec_id = b.vec_id
                      WHERE b.vec_id % 10 <> 0),
            probes AS (SELECT b.vec_id AS pid, b.bk, CAST(e.embedding AS DOUBLE[]) AS pe
                       FROM buckets b JOIN embeddings e ON e.vec_id = b.vec_id
                       WHERE b.vec_id % 10 = 0),
            cand AS (SELECT p.pid,
                       FLOOR((list_cosine_similarity(p.pe, s.se)) * 10000 + 0.5) / 10000 AS cos,
                       s.nb
                     FROM probes p JOIN store s ON p.bk = s.bk),
            ranked AS (SELECT pid, cos, nb,
                         row_number() OVER (PARTITION BY pid ORDER BY cos DESC, nb) AS rn
                       FROM cand),
            ann AS (SELECT pid, rn, nb, cos FROM ranked WHERE rn <= 3),
            xcand AS (SELECT p.pid AS xp,
                        FLOOR((list_cosine_similarity(p.pe, s.se)) * 10000 + 0.5) / 10000 AS xcos,
                        s.nb AS xm
                      FROM probes p CROSS JOIN store s WHERE p.pid < 50),
            xranked AS (SELECT xp, xm,
                          row_number() OVER (PARTITION BY xp ORDER BY xcos DESC, xm) AS xrn
                        FROM xcand),
            ex AS (SELECT xp, xm FROM xranked WHERE xrn <= 3)
            SELECT a.pid AS probe_id, CAST(a.rn AS INT) AS rn, a.nb, a.cos,
              CASE WHEN a.pid >= 50 THEN CAST(NULL AS INT)
                   WHEN EXISTS (SELECT 1 FROM ex WHERE ex.xp = a.pid AND ex.xm = a.nb)
                   THEN 1 ELSE 0 END AS hit
            FROM ann a ORDER BY probe_id, rn"""))

  /** Day-2 of the ANN-index loop — index MAINTENANCE (the vector twin
    * of q_store_append): q_ann_incremental proved probes ride a
    * persisted LSH index; this query proves the index GROWS correctly.
    * The base corpus's bucket assignments (vec_id ≡ 2..9 mod 10)
    * persist once (bucketBy(8, bk), the same sink); yesterday's new
    * vectors (≡ 1) APPEND into the same bucketed table via insertInto —
    * one new file per bucket, never a rewrite, and the plane set is the
    * one FIXED AT INGEST (data-driven from the base population;
    * re-deriving planes per append would re-bucket the whole index,
    * i.e. a rebuild — exactly what maintenance must not do). Today's
    * probe batch (≡ 0) reads the GROWN store: top-3 cosine neighbors
    * per probe with a src column attributing each neighbor to
    * base/delta1 — a delta1 neighbor can only appear if the appended
    * files are read, so a live append is visible in the output; the
    * naive replay additionally proves grown-store probes ≡ from-scratch
    * recompute over base ∪ delta1.
    *
    * Scale posture: identical to q_ann_incremental — the grown store
    * rides the stored bucket layout with zero store-side exchange
    * (plan-pinned undemoted); append cost is one bucket-assignment pass
    * over yesterday's vectors; nothing rewrites or re-shuffles the base
    * index.
    */
  private[graft] def annStoreTable(spark: org.apache.spark.sql.SparkSession,
      dir: String): String = s"g_ann_store2_${StoreToken(spark, dir)}"

  /** The INGEST-time bucket expression of the q_ann_store_append index:
    * plane depth from the BASE population (re-deriving planes per append
    * would re-bucket the whole index = a rebuild). */
  private val ingestBucketCache =
    new java.util.concurrent.ConcurrentHashMap[String, Column]()

  private def annIngestBucket(spark: org.apache.spark.sql.SparkSession,
      dir: String): Column =
    // Memoized per (session, dir) — ADVICE r13: the base count() and the
    // dim scan are driver-side model derivation, computed once at ingest
    // in production; q_ann_store_append / q_store_compact / the
    // lifecycle ladder each consult the bucket expression several times
    // per run and must not re-pay two Spark jobs per consult.
    ingestBucketCache.computeIfAbsent(StoreToken(spark, dir), _ => {
      val e = Tables(spark, dir, "embeddings")
      val nBase = e.filter(col("vec_id") % 10 >= 2).count()
      val signs = planeSigns(planesFor(nBase), embeddingDim(spark, dir))
      concat(signs.map(s =>
        when(signedDot(col("embedding"), s) > 0, lit("1")).otherwise(lit("0"))): _*)
    })

  /** The day-2 index append, re-runnable: a [[VintageWrite]] dynamic
    * overwrite of vintage=delta1, bucketed with the ingest-time planes
    * (append-twice ≡ append-once).
    */
  private[graft] def annStoreAppendDelta1(spark: org.apache.spark.sql.SparkSession,
      dir: String): Unit =
    VintageWrite(
      Tables(spark, dir, "embeddings").filter(col("vec_id") % 10 === 1)
        .select(col("vec_id"), annIngestBucket(spark, dir).as("bk"),
          col("embedding"), lit("delta1").as("vintage")),
      annStoreTable(spark, dir))

  /** Builds the grown (base + delta1) vintage-partitioned ANN store once
    * per (session, dir) and returns its table name — shared by
    * q_ann_store_append (the probe path) and q_store_compact (which
    * compacts it). */
  private[graft] def ensureAnnStore(spark: org.apache.spark.sql.SparkSession,
      dir: String): String = {
    val key = StoreToken(spark, dir)
    val wh = s"/tmp/graft_annstore2_$key"
    val storeT = annStoreTable(spark, dir)
    StoreOnce(wh) {
      graft.operators.BucketedWorkspace.cleanupOnExit(wh)
      val bucket = annIngestBucket(spark, dir)
      Tables(spark, dir, "embeddings").filter(col("vec_id") % 10 >= 2)
        .select(col("vec_id"), bucket.as("bk"), col("embedding"))
        .withColumn("vintage", lit("base"))
        .write.mode("overwrite").partitionBy("vintage")
        .bucketBy(8, "bk").sortBy("bk")
        .option("path", s"$wh/index").saveAsTable(storeT)
      // day-2 maintenance: yesterday's vectors land per bucket inside
      // their vintage partition (ingest-time planes) as a dynamic
      // overwrite — idempotent under re-run
      annStoreAppendDelta1(spark, dir)
    }
    storeT
  }

  private val annStoreAppend = Q(
    "q_ann_store_append",
    (spark, dir) => {
      val storeT = ensureAnnStore(spark, dir)
      val e = Tables(spark, dir, "embeddings")
      val bucket = annIngestBucket(spark, dir)
      val store = spark.table(storeT)
        .select(col("vec_id").as("nb"), col("bk"), col("embedding").as("se"))
      val probes = e.filter(col("vec_id") % 10 === 0)
        .select(col("vec_id").as("pid"), bucket.as("bk"), col("embedding").as("pe"))
      val cand = probes.join(store.hint("merge"), "bk")
        .select(col("pid"),
          pround(VectorOps.cosine(col("pe"), col("se")), 4).as("cos"), col("nb"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("pid")).orderBy(col("cos").desc, col("nb"))
      cand.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
        .select(col("pid").as("probe_id"), col("rn").cast("int").as("rn"),
          col("nb"), col("cos"),
          when(col("nb") % 10 === 1, lit("delta1")).otherwise(lit("base")).as("src"))
        .orderBy(col("probe_id"), col("rn"))
    },
    Some("""WITH bcnt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM embeddings
                          WHERE vec_id % 10 >= 2),
            np AS (SELECT MIN(k) AS np
                   FROM UNNEST(generate_series(4, 20)) AS t(k), bcnt
                   WHERE (CAST(32 AS BIGINT) << k) >= bcnt.n OR k = 20),
            dims AS (SELECT CAST(COALESCE(MAX(len(embedding)), 0) AS BIGINT) AS nd
                     FROM embeddings),
            planes AS (
              SELECT p, d,
                CASE WHEN substr(md5('p' || CAST(p AS VARCHAR) || '-' || CAST(d AS VARCHAR)), 1, 1)
                     IN ('8','9','a','b','c','d','e','f') THEN 1.0 ELSE -1.0 END AS sgn
              FROM np, dims, UNNEST(generate_series(0, np.np - 1)) AS a(p),
                   UNNEST(generate_series(1, dims.nd)) AS b(d)),
            dots AS (SELECT e.vec_id, pl.p,
                       SUM(pl.sgn * CAST(e.embedding[pl.d] AS DOUBLE)) AS dp
                     FROM embeddings e CROSS JOIN planes pl GROUP BY e.vec_id, pl.p),
            buckets AS (SELECT vec_id,
                          string_agg(CASE WHEN dp > 0 THEN '1' ELSE '0' END, '' ORDER BY p) AS bk
                        FROM dots GROUP BY vec_id),
            store AS (SELECT b.vec_id AS nb, b.bk, CAST(e.embedding AS DOUBLE[]) AS se
                      FROM buckets b JOIN embeddings e ON e.vec_id = b.vec_id
                      WHERE b.vec_id % 10 <> 0),
            probes AS (SELECT b.vec_id AS pid, b.bk, CAST(e.embedding AS DOUBLE[]) AS pe
                       FROM buckets b JOIN embeddings e ON e.vec_id = b.vec_id
                       WHERE b.vec_id % 10 = 0),
            cand AS (SELECT p.pid,
                       FLOOR((list_cosine_similarity(p.pe, s.se)) * 10000 + 0.5) / 10000 AS cos,
                       s.nb
                     FROM probes p JOIN store s ON p.bk = s.bk),
            ranked AS (SELECT pid, cos, nb,
                         row_number() OVER (PARTITION BY pid ORDER BY cos DESC, nb) AS rn
                       FROM cand)
            SELECT pid AS probe_id, CAST(rn AS INT) AS rn, nb, cos,
              CASE WHEN nb % 10 = 1 THEN 'delta1' ELSE 'base' END AS src
            FROM ranked WHERE rn <= 3 ORDER BY probe_id, rn"""))

  private[graft] def compactStoreTable(spark: org.apache.spark.sql.SparkSession,
      dir: String): String = s"g_ann_compact_${StoreToken(spark, dir)}"

  /** Filesystem paths of the grown and compacted index workspaces — for
    * the file-count assertions in the compaction spec. */
  private[graft] def annStorePath(spark: org.apache.spark.sql.SparkSession,
      dir: String): String = s"/tmp/graft_annstore2_${StoreToken(spark, dir)}/index"
  private[graft] def compactStorePath(spark: org.apache.spark.sql.SparkSession,
      dir: String): String = s"/tmp/graft_anncompact_${StoreToken(spark, dir)}/index"

  /** COMPACTION of the persisted ANN store — the maintenance verb that
    * completes the store lifecycle (create / append / delete /
    * COMPACT): every day-N vintage lands its own bucket files, so at
    * day-365 a bucket holds ~365 files and the "zero-exchange" pinned
    * read pays 365× file-open overhead (the graft-perf small-files
    * lesson). The compactor rewrites the grown store (base + delta1
    * vintage partitions) into ONE file per bucket — the forced bucketed
    * read is already one task per bucket, so the rewrite is
    * SHUFFLE-FREE end to end — while PRESERVING the
    * bucketBy(8, bk) layout: the post-compaction scan is still bucketed
    * and undemoted (plan-pinned), and the query output proves identity
    * IN the output — every probe's top-3 from the pre-compaction store
    * (phase=pre) reappears identically from the compacted store
    * (phase=post). File counts (8 post vs ≥16 pre) are asserted in the
    * compaction spec — a filesystem fact DuckDB cannot oracle.
    *
    * Scale posture: compaction is one zero-exchange bucketed store
    * scan + bucketed write (task i reads bucket i's N files, writes its
    * one), run offline at the operator's chosen cadence; probes before and after ride identical bucketed plans.
    */
  private val storeCompact = Q(
    "q_store_compact",
    (spark, dir) => {
      val srcT = ensureAnnStore(spark, dir)
      val key = StoreToken(spark, dir)
      val wh = s"/tmp/graft_anncompact_$key"
      val cT = compactStoreTable(spark, dir)
      StoreOnce(wh) {
        graft.operators.BucketedWorkspace.cleanupOnExit(wh)
        // SHUFFLE-FREE compaction: force the bucketed read (the planner
        // otherwise auto-disables it for a plain scan and packs the
        // small files into arbitrary tasks, so a task would hold — and
        // write — several buckets); the forced bucketed scan is exactly
        // one task per bucket, so the bucketed write emits one file per
        // bucket with no exchange anywhere
        // ConfLock (ADVICE r13): the toggle+write+restore is atomic vs
        // other conf-mutating store writes sharing this SparkSession
        ConfLock.withConf(spark,
            "spark.sql.sources.bucketing.autoBucketedScan.enabled", "false") {
          spark.table(srcT).select(col("vec_id"), col("bk"), col("embedding"))
            .write.mode("overwrite").bucketBy(8, "bk").sortBy("bk")
            .option("path", s"$wh/index").saveAsTable(cT)
        }
      }
      val e = Tables(spark, dir, "embeddings")
      val bucket = annIngestBucket(spark, dir)
      val probes = graft.Caches.persisted(
        e.filter(col("vec_id") % 10 === 0)
          .select(col("vec_id").as("pid"), bucket.as("bk"), col("embedding").as("pe")))
      def arm(t: String, phase: String): org.apache.spark.sql.DataFrame = {
        val store = spark.table(t)
          .select(col("vec_id").as("nb"), col("bk"), col("embedding").as("se"))
        val cand = probes.join(store.hint("merge"), "bk")
          .select(col("pid"),
            pround(VectorOps.cosine(col("pe"), col("se")), 4).as("cos"), col("nb"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("pid")).orderBy(col("cos").desc, col("nb"))
        cand.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
          .select(lit(phase).as("phase"), col("pid").as("probe_id"),
            col("rn").cast("int").as("rn"), col("nb"), col("cos"),
            when(col("nb") % 10 === 1, lit("delta1")).otherwise(lit("base")).as("src"))
      }
      arm(srcT, "pre").unionAll(arm(cT, "post"))
        .orderBy(col("phase"), col("probe_id"), col("rn"))
    },
    Some("""WITH bcnt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM embeddings
                          WHERE vec_id % 10 >= 2),
            np AS (SELECT MIN(k) AS np
                   FROM UNNEST(generate_series(4, 20)) AS t(k), bcnt
                   WHERE (CAST(32 AS BIGINT) << k) >= bcnt.n OR k = 20),
            dims AS (SELECT CAST(COALESCE(MAX(len(embedding)), 0) AS BIGINT) AS nd
                     FROM embeddings),
            planes AS (
              SELECT p, d,
                CASE WHEN substr(md5('p' || CAST(p AS VARCHAR) || '-' || CAST(d AS VARCHAR)), 1, 1)
                     IN ('8','9','a','b','c','d','e','f') THEN 1.0 ELSE -1.0 END AS sgn
              FROM np, dims, UNNEST(generate_series(0, np.np - 1)) AS a(p),
                   UNNEST(generate_series(1, dims.nd)) AS b(d)),
            dots AS (SELECT e.vec_id, pl.p,
                       SUM(pl.sgn * CAST(e.embedding[pl.d] AS DOUBLE)) AS dp
                     FROM embeddings e CROSS JOIN planes pl GROUP BY e.vec_id, pl.p),
            buckets AS (SELECT vec_id,
                          string_agg(CASE WHEN dp > 0 THEN '1' ELSE '0' END, '' ORDER BY p) AS bk
                        FROM dots GROUP BY vec_id),
            store AS (SELECT b.vec_id AS nb, b.bk, CAST(e.embedding AS DOUBLE[]) AS se
                      FROM buckets b JOIN embeddings e ON e.vec_id = b.vec_id
                      WHERE b.vec_id % 10 <> 0),
            probes AS (SELECT b.vec_id AS pid, b.bk, CAST(e.embedding AS DOUBLE[]) AS pe
                       FROM buckets b JOIN embeddings e ON e.vec_id = b.vec_id
                       WHERE b.vec_id % 10 = 0),
            cand AS (SELECT p.pid,
                       FLOOR((list_cosine_similarity(p.pe, s.se)) * 10000 + 0.5) / 10000 AS cos,
                       s.nb
                     FROM probes p JOIN store s ON p.bk = s.bk),
            ranked AS (SELECT pid, cos, nb,
                         row_number() OVER (PARTITION BY pid ORDER BY cos DESC, nb) AS rn
                       FROM cand),
            top AS (SELECT pid, rn, nb, cos,
                      CASE WHEN nb % 10 = 1 THEN 'delta1' ELSE 'base' END AS src
                    FROM ranked WHERE rn <= 3)
            SELECT phase, pid AS probe_id, CAST(rn AS INT) AS rn, nb, cos, src
            FROM (SELECT 'pre' AS phase, * FROM top
                  UNION ALL SELECT 'post', * FROM top)
            ORDER BY phase, probe_id, rn"""))

  /** q_ann_delete's post-deletion catalog table and path (for the
    * layout pins and file assertions). */
  private[graft] def annDeleteTable(spark: org.apache.spark.sql.SparkSession,
      dir: String): String = s"g_ann_del_${StoreToken(spark, dir)}"
  private[graft] def annDeletePath(spark: org.apache.spark.sql.SparkSession,
      dir: String): String = s"/tmp/graft_anndel_${StoreToken(spark, dir)}/index"

  /** DELETION from the persisted ANN store (VERDICT r13 task 3) —
    * q_store_delete's GDPR verb extended to the vector indexes: purging
    * a document's text is not enough if its EMBEDDING keeps surfacing
    * as someone's nearest neighbor. The grown (base + delta1) LSH store
    * takes a bounded deletion request (vec_id ≡ 5 mod 10): the id set
    * BROADCASTS onto a store anti-join and the survivors rewrite under
    * the SAME bucketBy(8, bk) layout — the post-delete probe still
    * rides the stored buckets with zero store-side exchange
    * (plan-pinned). Today's probe batch reads BOTH stores; the phase
    * column makes the deletion visible in the output: a `pre` top-3
    * neighbor from the purge set has no `post` twin and the
    * lower-ranked survivors move up (the post ranking re-runs over the
    * surviving candidates — exactly what a production index serves
    * after the purge). Property-tested on a planted corpus whose
    * probe's nearest neighbor IS the purged vector.
    *
    * Scale posture: deletion = one store scan + broadcast anti-join +
    * bucketed rewrite (no shuffle of the store on its key — the GDPR
    * request is bounded); for the partition-TARGETED variant that
    * avoids even the full-store rewrite, see q_ivf_delete, whose
    * partition layout makes surgical rewrites possible — the bucketed
    * LSH layout deliberately trades that for exchange-free probes.
    */
  private val annDelete = Q(
    "q_ann_delete",
    (spark, dir) => {
      val srcT = ensureAnnStore(spark, dir)
      val key = StoreToken(spark, dir)
      val wh = s"/tmp/graft_anndel_$key"
      val dT = annDeleteTable(spark, dir)
      StoreOnce(wh) {
        graft.operators.BucketedWorkspace.cleanupOnExit(wh)
        val delIds = broadcast(
          Tables(spark, dir, "embeddings")
            .filter(col("vec_id") % 10 === 5).select(col("vec_id")))
        spark.table(srcT).join(delIds, Seq("vec_id"), "left_anti")
          .select(col("vec_id"), col("bk"), col("embedding"))
          .write.mode("overwrite").bucketBy(8, "bk").sortBy("bk")
          .option("path", s"$wh/index").saveAsTable(dT)
      }
      val e = Tables(spark, dir, "embeddings")
      val bucket = annIngestBucket(spark, dir)
      val probes = graft.Caches.persisted(
        e.filter(col("vec_id") % 10 === 0)
          .select(col("vec_id").as("pid"), bucket.as("bk"), col("embedding").as("pe")))
      def arm(t: String, phase: String): org.apache.spark.sql.DataFrame = {
        val store = spark.table(t)
          .select(col("vec_id").as("nb"), col("bk"), col("embedding").as("se"))
        val cand = probes.join(store.hint("merge"), "bk")
          .select(col("pid"),
            pround(VectorOps.cosine(col("pe"), col("se")), 4).as("cos"), col("nb"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("pid")).orderBy(col("cos").desc, col("nb"))
        cand.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
          .select(lit(phase).as("phase"), col("pid").as("probe_id"),
            col("rn").cast("int").as("rn"), col("nb"), col("cos"),
            when(col("nb") % 10 === 5, lit(1)).otherwise(lit(0)).cast("int")
              .as("purge_set"))
      }
      arm(srcT, "pre").unionAll(arm(dT, "post"))
        .orderBy(col("phase"), col("probe_id"), col("rn"))
    },
    Some("""WITH bcnt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM embeddings
                          WHERE vec_id % 10 >= 2),
            np AS (SELECT MIN(k) AS np
                   FROM UNNEST(generate_series(4, 20)) AS t(k), bcnt
                   WHERE (CAST(32 AS BIGINT) << k) >= bcnt.n OR k = 20),
            dims AS (SELECT CAST(COALESCE(MAX(len(embedding)), 0) AS BIGINT) AS nd
                     FROM embeddings),
            planes AS (
              SELECT p, d,
                CASE WHEN substr(md5('p' || CAST(p AS VARCHAR) || '-' || CAST(d AS VARCHAR)), 1, 1)
                     IN ('8','9','a','b','c','d','e','f') THEN 1.0 ELSE -1.0 END AS sgn
              FROM np, dims, UNNEST(generate_series(0, np.np - 1)) AS a(p),
                   UNNEST(generate_series(1, dims.nd)) AS b(d)),
            dots AS (SELECT e.vec_id, pl.p,
                       SUM(pl.sgn * CAST(e.embedding[pl.d] AS DOUBLE)) AS dp
                     FROM embeddings e CROSS JOIN planes pl GROUP BY e.vec_id, pl.p),
            buckets AS (SELECT vec_id,
                          string_agg(CASE WHEN dp > 0 THEN '1' ELSE '0' END, '' ORDER BY p) AS bk
                        FROM dots GROUP BY vec_id),
            store AS (SELECT b.vec_id AS nb, b.bk, CAST(e.embedding AS DOUBLE[]) AS se
                      FROM buckets b JOIN embeddings e ON e.vec_id = b.vec_id
                      WHERE b.vec_id % 10 <> 0),
            probes AS (SELECT b.vec_id AS pid, b.bk, CAST(e.embedding AS DOUBLE[]) AS pe
                       FROM buckets b JOIN embeddings e ON e.vec_id = b.vec_id
                       WHERE b.vec_id % 10 = 0),
            cand AS (SELECT p.pid,
                       FLOOR((list_cosine_similarity(p.pe, s.se)) * 10000 + 0.5) / 10000 AS cos,
                       s.nb
                     FROM probes p JOIN store s ON p.bk = s.bk),
            rpre AS (SELECT pid, cos, nb,
                       row_number() OVER (PARTITION BY pid ORDER BY cos DESC, nb) AS rn
                     FROM cand),
            rpost AS (SELECT pid, cos, nb,
                        row_number() OVER (PARTITION BY pid ORDER BY cos DESC, nb) AS rn
                      FROM cand WHERE nb % 10 <> 5)
            SELECT phase, pid AS probe_id, CAST(rn AS INT) AS rn, nb, cos,
              CASE WHEN nb % 10 = 5 THEN 1 ELSE 0 END AS purge_set
            FROM (SELECT 'pre' AS phase, pid, rn, nb, cos FROM rpre WHERE rn <= 3
                  UNION ALL
                  SELECT 'post', pid, rn, nb, cos FROM rpost WHERE rn <= 3)
            ORDER BY phase, probe_id, rn"""))

  /** q_store_lifecycle's tables and workspace: the laddered store, its
    * compacted successor, and the rung ledger path. */
  private[graft] def lifecycleStore(spark: org.apache.spark.sql.SparkSession,
      dir: String): (String, String, String) = {
    val key = StoreToken(spark, dir)
    (s"g_lc_store_$key", s"g_lc_compact_$key", s"/tmp/graft_lcstore_$key")
  }

  /** The lifecycle ladder's ingest-time bucket expression: plane depth
    * from ITS base population (vec_id ≡ 4..9 mod 10 — fixed at ingest,
    * like every store's model state). */
  private def lifecycleBucket(spark: org.apache.spark.sql.SparkSession,
      dir: String): Column =
    ingestBucketCache.computeIfAbsent(StoreToken(spark, dir) + ":lc", _ => {
      val e = Tables(spark, dir, "embeddings")
      val nBase = e.filter(col("vec_id") % 10 >= 4).count()
      val signs = planeSigns(planesFor(nBase), embeddingDim(spark, dir))
      concat(signs.map(s =>
        when(signedDot(col("embedding"), s) > 0, lit("1")).otherwise(lit("0"))): _*)
    })

  /** THE DAY-N LIFECYCLE LADDER (VERDICT r13 task 4): every store verb
    * was proven on a base+delta1 store in isolation; day-365 operation
    * is the verbs COMPOSED on one store — this query drives a single
    * ANN store through create(base) → append(delta1) → append(delta2) →
    * delete(purge ≡5) → compact → probe as one sequence, and proves the
    * probe's answers survive it: the `grown` phase (post-delete,
    * 3-vintage, multi-file) and the `compact` phase (one file per
    * bucket) serve IDENTICAL top-3 rows, with src attributing neighbors
    * to base/delta1/delta2 (every vintage must flow through) and the
    * purged ids absent from both.
    *
    * The rung LEDGER (rung, data files, rows — written beside the
    * store) turns the r13-disclosed file-open growth trend
    * (q_ivf_store_append: 0.33–0.40 → 0.55–0.63 s at 2 leaf dirs → 4)
    * into the measured, remedied curve: files grow by one bucket-set
    * per appended vintage, the delete rewrites ONLY the base vintage
    * partition (static-prefix overwrite; the delta vintages'
    * files are untouched on disk, manifest-asserted), and compaction
    * collapses the ladder back to 8 files while preserving rows.
    *
    * Scale posture: each append is one bucket-assignment pass over its
    * delta; the delete stages only base-vintage survivors and swaps
    * them in as a partition overwrite; compaction is the shuffle-free
    * one-task-per-bucket rewrite (q_store_compact); the probe rides the
    * bucket layout exchange-free at every rung (plan-pinned on the
    * compacted table).
    */
  private val storeLifecycle = Q(
    "q_store_lifecycle",
    (spark, dir) => {
      val (lT, cT, wh) = lifecycleStore(spark, dir)
      val e = Tables(spark, dir, "embeddings")
      val bucket = lifecycleBucket(spark, dir)
      StoreOnce(wh) {
        graft.operators.BucketedWorkspace.cleanupOnExit(wh)
        def dataFiles(): Seq[java.io.File] = {
          def walk(f: java.io.File): Seq[java.io.File] = {
            val cs = f.listFiles()
            if (cs == null) Seq(f) else cs.toSeq.flatMap(walk)
          }
          walk(new java.io.File(s"$wh/index")).filter(f =>
            f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
        }
        val ledger = scala.collection.mutable.ArrayBuffer[String]()
        def rung(name: String): Unit = {
          spark.sql(s"REFRESH TABLE $lT")
          ledger += s"$name:${dataFiles().size}:${spark.table(lT).count()}"
        }
        def vintageRows(m: Int, v: String) =
          e.filter(col("vec_id") % 10 === m)
            .select(col("vec_id"), bucket.as("bk"), col("embedding"),
              lit(v).as("vintage"))
        // day 0: create
        e.filter(col("vec_id") % 10 >= 4)
          .select(col("vec_id"), bucket.as("bk"), col("embedding"))
          .withColumn("vintage", lit("base"))
          .write.mode("overwrite").partitionBy("vintage")
          .bucketBy(8, "bk").sortBy("bk")
          .option("path", s"$wh/index").saveAsTable(lT)
        rung("create")
        // days 1, 2: idempotent vintage appends
        VintageWrite(vintageRows(1, "delta1"), lT)
        rung("append_d1")
        VintageWrite(vintageRows(2, "delta2"), lT)
        rung("append_d2")
        // the delta vintages' files must survive the delete untouched
        val deltaManifest = dataFiles()
          .filter(f => !f.getAbsolutePath.contains("vintage=base"))
          .map(f => s"${f.getAbsolutePath}:${f.length}:${f.lastModified}")
          .sorted
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"$wh/delta_manifest.txt"),
          deltaManifest.mkString("\n").getBytes("UTF-8"))
        // day N: GDPR purge (≡5 — base vintage only): stage base
        // survivors, swap in as a static-prefix partition overwrite —
        // the delta vintages are never rewritten
        spark.table(lT)
          .filter(col("vintage") === "base" && col("vec_id") % 10 =!= 5)
          .select(col("vec_id"), col("bk"), col("embedding"))
          .write.mode("overwrite").parquet(s"$wh/staged_del")
        spark.read.parquet(s"$wh/staged_del")
          .select(col("vec_id"), col("bk"), col("embedding"))
          .createOrReplaceTempView(s"src_del_$lT")
        ConfLock.withConf(spark,
            "spark.sql.sources.partitionOverwriteMode", "static") {
          spark.sql(s"INSERT OVERWRITE TABLE $lT PARTITION (vintage='base') " +
            s"SELECT vec_id, bk, embedding FROM src_del_$lT")
        }
        spark.catalog.dropTempView(s"src_del_$lT")
        rung("delete")
        // day N: compaction — shuffle-free one-file-per-bucket rewrite
        ConfLock.withConf(spark,
            "spark.sql.sources.bucketing.autoBucketedScan.enabled", "false") {
          spark.table(lT).select(col("vec_id"), col("bk"), col("embedding"))
            .write.mode("overwrite").bucketBy(8, "bk").sortBy("bk")
            .option("path", s"$wh/compact").saveAsTable(cT)
        }
        val cFiles = {
          def walk(f: java.io.File): Seq[java.io.File] = {
            val cs = f.listFiles()
            if (cs == null) Seq(f) else cs.toSeq.flatMap(walk)
          }
          walk(new java.io.File(s"$wh/compact")).count(f =>
            f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
        }
        ledger += s"compact:$cFiles:${spark.table(cT).count()}"
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"$wh/ledger.txt"),
          ledger.mkString("\n").getBytes("UTF-8"))
        ()
      }
      val probes = graft.Caches.persisted(
        e.filter(col("vec_id") % 10 === 0)
          .select(col("vec_id").as("pid"), bucket.as("bk"), col("embedding").as("pe")))
      def arm(t: String, phase: String): org.apache.spark.sql.DataFrame = {
        val store = spark.table(t)
          .select(col("vec_id").as("nb"), col("bk"), col("embedding").as("se"))
        val cand = probes.join(store.hint("merge"), "bk")
          .select(col("pid"),
            pround(VectorOps.cosine(col("pe"), col("se")), 4).as("cos"), col("nb"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("pid")).orderBy(col("cos").desc, col("nb"))
        cand.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
          .select(lit(phase).as("phase"), col("pid").as("probe_id"),
            col("rn").cast("int").as("rn"), col("nb"), col("cos"),
            when(col("nb") % 10 === 1, lit("delta1"))
              .when(col("nb") % 10 === 2, lit("delta2"))
              .otherwise(lit("base")).as("src"))
      }
      arm(lT, "grown").unionAll(arm(cT, "compact"))
        .orderBy(col("phase"), col("probe_id"), col("rn"))
    },
    Some("""WITH bcnt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM embeddings
                          WHERE vec_id % 10 >= 4),
            np AS (SELECT MIN(k) AS np
                   FROM UNNEST(generate_series(4, 20)) AS t(k), bcnt
                   WHERE (CAST(32 AS BIGINT) << k) >= bcnt.n OR k = 20),
            dims AS (SELECT CAST(COALESCE(MAX(len(embedding)), 0) AS BIGINT) AS nd
                     FROM embeddings),
            planes AS (
              SELECT p, d,
                CASE WHEN substr(md5('p' || CAST(p AS VARCHAR) || '-' || CAST(d AS VARCHAR)), 1, 1)
                     IN ('8','9','a','b','c','d','e','f') THEN 1.0 ELSE -1.0 END AS sgn
              FROM np, dims, UNNEST(generate_series(0, np.np - 1)) AS a(p),
                   UNNEST(generate_series(1, dims.nd)) AS b(d)),
            dots AS (SELECT e.vec_id, pl.p,
                       SUM(pl.sgn * CAST(e.embedding[pl.d] AS DOUBLE)) AS dp
                     FROM embeddings e CROSS JOIN planes pl GROUP BY e.vec_id, pl.p),
            buckets AS (SELECT vec_id,
                          string_agg(CASE WHEN dp > 0 THEN '1' ELSE '0' END, '' ORDER BY p) AS bk
                        FROM dots GROUP BY vec_id),
            store AS (SELECT b.vec_id AS nb, b.bk, CAST(e.embedding AS DOUBLE[]) AS se
                      FROM buckets b JOIN embeddings e ON e.vec_id = b.vec_id
                      WHERE b.vec_id % 10 IN (1, 2, 4, 6, 7, 8, 9)),
            probes AS (SELECT b.vec_id AS pid, b.bk, CAST(e.embedding AS DOUBLE[]) AS pe
                       FROM buckets b JOIN embeddings e ON e.vec_id = b.vec_id
                       WHERE b.vec_id % 10 = 0),
            cand AS (SELECT p.pid,
                       FLOOR((list_cosine_similarity(p.pe, s.se)) * 10000 + 0.5) / 10000 AS cos,
                       s.nb
                     FROM probes p JOIN store s ON p.bk = s.bk),
            ranked AS (SELECT pid, cos, nb,
                         row_number() OVER (PARTITION BY pid ORDER BY cos DESC, nb) AS rn
                       FROM cand),
            top AS (SELECT pid, rn, nb, cos,
                      CASE WHEN nb % 10 = 1 THEN 'delta1'
                           WHEN nb % 10 = 2 THEN 'delta2' ELSE 'base' END AS src
                    FROM ranked WHERE rn <= 3)
            SELECT phase, pid AS probe_id, CAST(rn AS INT) AS rn, nb, cos, src
            FROM (SELECT 'grown' AS phase, * FROM top
                  UNION ALL SELECT 'compact', * FROM top)
            ORDER BY phase, probe_id, rn"""))

  /** q_ann_expire's expire-private store (table, workspace). */
  private[graft] def annExpireStore(spark: org.apache.spark.sql.SparkSession,
      dir: String): (String, String) = {
    val key = StoreToken(spark, dir)
    (s"g_ann_exp_$key", s"/tmp/graft_annexp_$key")
  }

  /** The ANN retention verb, re-runnable (drop-twice ≡ drop-once):
    * catalog partition drop of the expired vintage + the
    * storage-lifecycle delete of its directory — the q_sketch_expire
    * verb on the vector index. */
  private[graft] def annExpireDrop(spark: org.apache.spark.sql.SparkSession,
      dir: String): Unit = {
    val (t, wh) = annExpireStore(spark, dir)
    spark.sql(s"ALTER TABLE $t DROP IF EXISTS PARTITION (vintage='base')")
    graft.operators.BucketedWorkspace.deleteRecursively(
      new java.io.File(s"$wh/index/vintage=base"))
    spark.sql(s"REFRESH TABLE $t")
    ()
  }

  /** TIME-BASED VINTAGE RETENTION on the ANN store — completing the
    * retention symmetry (sketch stores and the session store have
    * expire; the vector indexes had only delete/compact, yet embeddings
    * age out of real corpora just like counters do — a news-embedding
    * index drops last quarter wholesale, not doc-by-doc): the
    * expire-private grown store (base + delta1 vintages, bucketBy(8,
    * bk), ingest-time planes) evicts vintage=base as a catalog
    * partition drop + storage delete — O(1) metadata + one directory
    * delete, never a data pass, never a rewrite of the surviving
    * vintage's bucket files (they stay byte-identical; the bucketed
    * probe layout survives the drop, plan-pinned). Because the vintage
    * is a partition column, the post-expire index IS the index rebuilt
    * without that vintage — the same per-vintage decomposability
    * q_sketch_expire proves for the merge folds, here for top-k
    * serving. The probe runs pre-expire (snapshotted at build — the
    * store mutates in place, the q_ivf_delete discipline) and
    * post-expire (live): a `pre` neighbor from the expired vintage has
    * no `post` twin, survivors move up, and the post ranking equals a
    * from-scratch LSH replay over the retained population (the
    * oracle). The plane model is INGEST state and survives the expiry
    * of the data that derived it (the quantile-grid / IVF-centroid
    * posture).
    *
    * Scale posture: expire = one catalog op + one directory delete at
    * any corpus size; probes stay bucketed merge joins; contrast with
    * q_ann_delete, whose doc-granular purge must rewrite the store —
    * time-granular forgetting is free, key-granular forgetting costs a
    * rewrite, and a real pipeline uses both.
    */
  private val annExpire = Q(
    "q_ann_expire",
    (spark, dir) => {
      val (eT, wh) = annExpireStore(spark, dir)
      val e = Tables(spark, dir, "embeddings")
      val bucket = annIngestBucket(spark, dir)
      val probes = graft.Caches.persisted(
        e.filter(col("vec_id") % 10 === 0)
          .select(col("vec_id").as("pid"), bucket.as("bk"), col("embedding").as("pe")))
      def arm(phase: String): org.apache.spark.sql.DataFrame = {
        val store = spark.table(eT)
          .select(col("vec_id").as("nb"), col("bk"), col("embedding").as("se"))
        val cand = probes.join(store.hint("merge"), "bk")
          .select(col("pid"),
            pround(VectorOps.cosine(col("pe"), col("se")), 4).as("cos"), col("nb"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("pid")).orderBy(col("cos").desc, col("nb"))
        cand.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
          .select(lit(phase).as("phase"), col("pid").as("probe_id"),
            col("rn").cast("int").as("rn"), col("nb"), col("cos"),
            when(col("nb") % 10 === 1, lit("delta1")).otherwise(lit("base")).as("src"))
      }
      StoreOnce(wh) {
        graft.operators.BucketedWorkspace.cleanupOnExit(wh)
        e.filter(col("vec_id") % 10 >= 2)
          .select(col("vec_id"), bucket.as("bk"), col("embedding"))
          .withColumn("vintage", lit("base"))
          .write.mode("overwrite").partitionBy("vintage")
          .bucketBy(8, "bk").sortBy("bk")
          .option("path", s"$wh/index").saveAsTable(eT)
        VintageWrite(
          e.filter(col("vec_id") % 10 === 1)
            .select(col("vec_id"), bucket.as("bk"), col("embedding"),
              lit("delta1").as("vintage")),
          eT)
        // pre-expire serving state, materialized (the store is about to
        // mutate in place)
        arm("pre").coalesce(1).write.mode("overwrite").parquet(s"$wh/pre")
        // the nightly horizon: the base vintage ages out
        annExpireDrop(spark, dir)
      }
      spark.read.parquet(s"$wh/pre")
        .unionAll(arm("post"))
        .orderBy(col("phase"), col("probe_id"), col("rn"))
    },
    Some("""WITH bcnt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM embeddings
                          WHERE vec_id % 10 >= 2),
            np AS (SELECT MIN(k) AS np
                   FROM UNNEST(generate_series(4, 20)) AS t(k), bcnt
                   WHERE (CAST(32 AS BIGINT) << k) >= bcnt.n OR k = 20),
            dims AS (SELECT CAST(COALESCE(MAX(len(embedding)), 0) AS BIGINT) AS nd
                     FROM embeddings),
            planes AS (
              SELECT p, d,
                CASE WHEN substr(md5('p' || CAST(p AS VARCHAR) || '-' || CAST(d AS VARCHAR)), 1, 1)
                     IN ('8','9','a','b','c','d','e','f') THEN 1.0 ELSE -1.0 END AS sgn
              FROM np, dims, UNNEST(generate_series(0, np.np - 1)) AS a(p),
                   UNNEST(generate_series(1, dims.nd)) AS b(d)),
            dots AS (SELECT e.vec_id, pl.p,
                       SUM(pl.sgn * CAST(e.embedding[pl.d] AS DOUBLE)) AS dp
                     FROM embeddings e CROSS JOIN planes pl GROUP BY e.vec_id, pl.p),
            buckets AS (SELECT vec_id,
                          string_agg(CASE WHEN dp > 0 THEN '1' ELSE '0' END, '' ORDER BY p) AS bk
                        FROM dots GROUP BY vec_id),
            store AS (SELECT b.vec_id AS nb, b.bk, CAST(e.embedding AS DOUBLE[]) AS se
                      FROM buckets b JOIN embeddings e ON e.vec_id = b.vec_id
                      WHERE b.vec_id % 10 <> 0),
            probes AS (SELECT b.vec_id AS pid, b.bk, CAST(e.embedding AS DOUBLE[]) AS pe
                       FROM buckets b JOIN embeddings e ON e.vec_id = b.vec_id
                       WHERE b.vec_id % 10 = 0),
            cand AS (SELECT p.pid,
                       FLOOR((list_cosine_similarity(p.pe, s.se)) * 10000 + 0.5) / 10000 AS cos,
                       s.nb
                     FROM probes p JOIN store s ON p.bk = s.bk),
            rpre AS (SELECT pid, cos, nb,
                       row_number() OVER (PARTITION BY pid ORDER BY cos DESC, nb) AS rn
                     FROM cand),
            rpost AS (SELECT pid, cos, nb,
                        row_number() OVER (PARTITION BY pid ORDER BY cos DESC, nb) AS rn
                      FROM cand WHERE nb % 10 = 1)
            SELECT phase, pid AS probe_id, CAST(rn AS INT) AS rn, nb, cos,
              CASE WHEN nb % 10 = 1 THEN 'delta1' ELSE 'base' END AS src
            FROM (SELECT 'pre' AS phase, pid, rn, nb, cos FROM rpre WHERE rn <= 3
                  UNION ALL
                  SELECT 'post', pid, rn, nb, cos FROM rpost WHERE rn <= 3)
            ORDER BY phase, probe_id, rn"""))

  val all: Seq[Q] = Seq(arrayFuncs, knnBrute, knnLsh, dedupEmbed, embedCentroid,
    knnJoin, annRecall, dedupSemantic, knnPq, hardNegatives, multiprobeLsh,
    annIncremental, annStoreAppend, storeCompact, annDelete, storeLifecycle,
    annExpire)
}
