package graft.operators

import graft.{Q, Tables}
import graft.functions.Portable.pround
import graft.functions.VectorOps
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF-style similarity search and LSH-bucketed embedding near-dup — the
  * scale paths that avoid the quadratic compare.
  */
object IvfQueries {

  /** IVF (inverted-file) KNN: vectors are assigned to the nearest of 10
    * fixed centroids (vec_id 0..9 — a real deployment would k-means these;
    * the *assignment and probe-cluster search* is the engine operator), and
    * the probe searches only its own cluster — at scale this reads ~1/10th
    * of the data from a cluster-partitioned layout. Assignment uses an
    * explicit ranking window with a deterministic tiebreak so both engines
    * agree.
    */
  private val knnIvf = Q(
    "q_knn_ivf",
    (spark, dir) => {
      val e = Tables(spark, dir, "embeddings")
      val cents = broadcast(e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("cid"), col("embedding").as("cemb")))
      val byVec = Window.partitionBy(col("vec_id"))
        .orderBy(col("ccos").desc, col("cid"))
      val assign = e.crossJoin(cents)
        .select(col("vec_id"), col("embedding"), col("cid"),
          VectorOps.cosine(col("embedding"), col("cemb")).as("ccos"))
        .withColumn("rn", row_number().over(byVec))
        .filter(col("rn") === 1)
        .select(col("vec_id"), col("embedding"), col("cid").as("cluster"))
      val probe = broadcast(assign.filter(col("vec_id") === 0)
        .select(col("embedding").as("p"), col("cluster").as("pcluster")))
      assign
        .join(probe, col("cluster") === col("pcluster"))
        .filter(col("vec_id") =!= 0)
        .select(col("vec_id"), col("cluster"),
          pround(VectorOps.cosine(col("embedding"), col("p")), 4).as("cos"))
        .orderBy(col("cos").desc, col("vec_id"))
        .limit(10)
    },
    Some("""WITH cents AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cemb
                           FROM embeddings WHERE vec_id < 10),
            scored AS (SELECT e.vec_id, c.cid,
                         list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), c.cemb) AS ccos
                       FROM embeddings e CROSS JOIN cents c),
            assign AS (SELECT vec_id, cid AS cluster FROM (
                         SELECT vec_id, cid,
                           row_number() OVER (PARTITION BY vec_id
                             ORDER BY ccos DESC, cid) AS rn
                         FROM scored)
                       WHERE rn = 1),
            probe AS (SELECT CAST(e.embedding AS DOUBLE[]) AS p, a.cluster AS pcluster
                      FROM embeddings e JOIN assign a ON e.vec_id = a.vec_id
                      WHERE e.vec_id = 0)
            SELECT e.vec_id, a.cluster,
              FLOOR((list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), probe.p)) * 10000 + 0.5) / 10000 AS cos
            FROM embeddings e
            JOIN assign a ON e.vec_id = a.vec_id, probe
            WHERE a.cluster = probe.pcluster AND e.vec_id <> 0
            ORDER BY cos DESC, e.vec_id LIMIT 10"""))

  /** LSH-bucketed embedding near-dup: candidate pairs share a hyperplane
    * bucket (same plane family as q_knn_lsh), scored exactly, top-20.
    * The bucket equi-join replaces the all-pairs cross join — the shuffle
    * keys on the bucket id, so the work partitions across the cluster.
    * The plane count is DATA-DRIVEN (the q_knn_join mechanism: one cheap
    * count, then the smallest k ≥ 4 keeping expected bucket population
    * ≤ 32): a fixed depth makes every bucket deepen linearly with corpus
    * size and the within-bucket pair mass grow QUADRATICALLY — the
    * round-8 sf1 pass measured exactly that (11.8× at 10× rows with 4
    * fixed planes); with the adaptive depth the candidate generation
    * stays linear-per-row at any scale. The oracle derives the identical
    * plane count from its own COUNT(*).
    */
  private val dedupEmbedLsh = Q(
    "q_dedup_embed_lsh",
    (spark, dir) => {
      val n = Tables(spark, dir, "embeddings").count()
      val signs = VectorQueries.planeSigns(VectorQueries.planesFor(n), 64)
      val bucket = concat(signs.map(s =>
        when(VectorOps.signedDot(col("embedding"), s.toArray) > 0, lit("1"))
          .otherwise(lit("0"))): _*)
      val e = Tables(spark, dir, "embeddings")
        .select(col("vec_id"), col("embedding"), bucket.as("bk"))
      val a = e.select(col("vec_id").as("vec_a"), col("embedding").as("ea"), col("bk"))
      val b = e.select(col("vec_id").as("vec_b"), col("embedding").as("eb"), col("bk"))
      a.join(b, Seq("bk"))
        .filter(col("vec_a") < col("vec_b"))
        .select(col("vec_a"), col("vec_b"), col("bk"),
          pround(VectorOps.cosine(col("ea"), col("eb")), 4).as("cos"))
        .orderBy(col("cos").desc, col("vec_a"), col("vec_b"))
        .limit(20)
    },
    Some("""WITH np AS (
              SELECT MIN(k) AS np
              FROM UNNEST(generate_series(4, 20)) AS t(k),
                   (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM embeddings) c
              WHERE (CAST(32 AS BIGINT) << k) >= c.n OR k = 20),
            planes AS (
              SELECT p, d,
                CASE WHEN substr(md5('p' || CAST(p AS VARCHAR) || '-' || CAST(d AS VARCHAR)), 1, 1)
                     IN ('8','9','a','b','c','d','e','f') THEN 1.0 ELSE -1.0 END AS sgn
              FROM np, UNNEST(generate_series(0, np.np - 1)) AS a(p), UNNEST(generate_series(1, 64)) AS b(d)),
            dots AS (SELECT e.vec_id, pl.p,
                       SUM(pl.sgn * CAST(e.embedding[pl.d] AS DOUBLE)) AS dp
                     FROM embeddings e CROSS JOIN planes pl GROUP BY e.vec_id, pl.p),
            buckets AS (SELECT vec_id,
                          string_agg(CASE WHEN dp > 0 THEN '1' ELSE '0' END, '' ORDER BY p) AS bk
                        FROM dots GROUP BY vec_id)
            SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, ba.bk,
              FLOOR((list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                            CAST(b.embedding AS DOUBLE[]))) * 10000 + 0.5) / 10000 AS cos
            FROM embeddings a
            JOIN buckets ba ON a.vec_id = ba.vec_id
            JOIN buckets bb ON bb.bk = ba.bk
            JOIN embeddings b ON b.vec_id = bb.vec_id AND a.vec_id < b.vec_id
            ORDER BY cos DESC, vec_a, vec_b LIMIT 20"""))

  val all: Seq[Q] = Seq(knnIvf, dedupEmbedLsh)
}
