package graft.operators

import graft.{Caches, Q, Tables}
import graft.functions.VectorOps
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic Lloyd's k-means over the embeddings — the trainer behind
  * the IVF index (q_knn_ivf uses fixed seed centroids; this is the "real
  * deployment would k-means these" step).
  *
  * Scale shape per iteration: centroids broadcast (k×dim doubles),
  * assignment is a rank window over a crossJoin with k rows (linear scan),
  * recompute is one partial-aggregated groupBy(cluster, dim) mean. Only
  * the k×dim centroid matrix ever reaches the driver — the iterative
  * driver loop carries model state, never data.
  *
  * Determinism: cosine ties break on centroid id; init is vec_id < k.
  */
object KMeans {

  /** Assign each vector to its highest-cosine centroid (ties → lowest id).
    *
    * Measured negative result (r16): rewriting the argmax as a
    * `max_by(cid, struct(ccos, −cid))` aggregate — fewer shuffle rows,
    * no sort — benched SLOWER on every assign consumer
    * (q_kmeans_train 1.117→1.128 s, q_cluster_profile 0.906→1.079 s,
    * both windows quiet), because the embedding array must ride the
    * aggregation buffer through partial/final merge (per-row array
    * copies), while the window form ships plain rows and Spark 4's
    * rank-limit pushdown (WindowGroupLimit) already caps the per-key
    * sort at the top-1 candidate. The same max_by idiom DID pay in the
    * LPA vote (GraphQueries), where the carried payload is one long —
    * the dividing line is payload width, not the operator.
    */
  def assign(e: DataFrame, cents: Seq[(Long, Array[Double])]): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    val cdf = broadcast(cents.toDF("cid", "c"))
    val byVec = Window.partitionBy(col("vec_id"))
      .orderBy(col("ccos").desc, col("cid"))
    e.crossJoin(cdf)
      .select(col("vec_id"), col("embedding"), col("cid"),
        VectorOps.cosine(col("embedding"), col("c")).as("ccos"))
      .withColumn("rn", row_number().over(byVec))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("embedding"), col("cid").as("cluster"))
  }

  /** One recompute step: per-cluster per-dimension mean. */
  def recompute(assigned: DataFrame): Seq[(Long, Array[Double])] =
    assigned
      .select(col("cluster"), posexplode(col("embedding")).as(Seq("d", "x")))
      .groupBy(col("cluster"), col("d"))
      .agg(avg(col("x").cast("double")).as("m"))
      .collect() // k×dim rows — model state, bounded
      .groupBy(_.getLong(0))
      .map { case (cid, rows) =>
        cid -> rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toArray
      }
      .toSeq.sortBy(_._1)

  /** Train `iters` Lloyd iterations from the deterministic vec_id<k init. */
  def train(spark: SparkSession, dir: String, k: Int, iters: Int): Seq[(Long, Array[Double])] = {
    val e = Tables(spark, dir, "embeddings").select(col("vec_id"), col("embedding"))
    var cents: Seq[(Long, Array[Double])] = e.filter(col("vec_id") < k)
      .collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(_.toDouble).toArray)
      .toSeq.sortBy(_._1)
    for (_ <- 1 to iters)
      cents = recompute(assign(e, cents))
    cents
  }

  /** Mean cosine of each vector to its centroid (training quality metric). */
  def meanCosine(e: DataFrame, cents: Seq[(Long, Array[Double])]): Double =
    assign(e, cents)
      .join(broadcast(e.sparkSession.createDataFrame(
        cents.map { case (c, v) => (c, v.toSeq) }).toDF("cluster", "c")), "cluster")
      .select(avg(VectorOps.cosine(col("embedding"), col("c"))))
      .collect()(0).getDouble(0)

  /** Declared query: assignment after ONE trained iteration (init = the
    * first k vectors, one mean-recompute, re-assign). The oracle replays
    * the identical iteration in SQL — centroid means differ only by
    * accumulation-order float noise (~1e-15), far from any assignment
    * decision boundary.
    */
  /** Shared oracle CTE chain replaying one trained Lloyd iteration:
    * embeddings → vec_id<8 init → assign → mean recompute → re-assign as
    * `a2(vec_id, cluster)`. Used by q_kmeans_assign and q_cluster_purity
    * so both replay the identical trainer.
    */
  private val oneIterAssignCte =
    """e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       c0 AS (SELECT vec_id AS cid, v AS c FROM e WHERE vec_id < 8),
       a1 AS (SELECT vec_id, cid FROM (
                SELECT e.vec_id, c0.cid,
                  row_number() OVER (PARTITION BY e.vec_id
                    ORDER BY list_cosine_similarity(e.v, c0.c) DESC, c0.cid) AS rn
                FROM e CROSS JOIN c0) WHERE rn = 1),
       m1 AS (SELECT a1.cid, t.d, AVG(e.v[t.d]) AS md
              FROM a1 JOIN e USING (vec_id),
                   UNNEST(generate_series(1, len(e.v))) AS t(d)
              GROUP BY a1.cid, t.d),
       c1 AS (SELECT cid, list(md ORDER BY d) AS c FROM m1 GROUP BY cid),
       a2 AS (SELECT vec_id, cid AS cluster FROM (
                SELECT e.vec_id, c1.cid,
                  row_number() OVER (PARTITION BY e.vec_id
                    ORDER BY list_cosine_similarity(e.v, c1.c) DESC, c1.cid) AS rn
                FROM e CROSS JOIN c1) WHERE rn = 1)"""

  private val kmeansAssign = Q(
    "q_kmeans_assign",
    (spark, dir) => {
      val e = Tables(spark, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val c1 = train(spark, dir, k = 8, iters = 1)
      assign(e, c1)
        .select(col("vec_id"), col("cluster"))
        .orderBy(col("vec_id"))
    },
    Some(s"""WITH $oneIterAssignCte
             SELECT vec_id, cluster FROM a2 ORDER BY vec_id"""))

  /** Cluster–label agreement: per trained cluster, its size, majority
    * ground-truth label (ties → lowest label) and purity share — the
    * first clustering-quality report (purity = Σ majority / N when
    * averaged, which the property spec asserts). Reuses the exact
    * one-iteration trainer of q_kmeans_assign; the label join and
    * majority selection are one hash aggregate + one bounded per-cluster
    * rank window (k×labels rows). All counts are exact integers; the
    * share is a 4dp portable round.
    */
  private val clusterPurity = Q(
    "q_cluster_purity",
    (spark, dir) => {
      import graft.functions.Portable.pround
      val e = Tables(spark, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val c1 = train(spark, dir, k = 8, iters = 1)
      val lab = Tables(spark, dir, "embeddings")
        .select(col("vec_id").as("v2"), col("label"))
      val g = assign(e, c1).select(col("vec_id"), col("cluster"))
        .join(lab, col("vec_id") === col("v2"))
        .groupBy(col("cluster"), col("label")).agg(count(lit(1)).as("cnt"))
      val byCluster = Window.partitionBy(col("cluster"))
        .orderBy(col("cnt").desc, col("label"))
      val tot = g.groupBy(col("cluster")).agg(sum(col("cnt")).as("n"))
      g.withColumn("rn", row_number().over(byCluster)).filter(col("rn") === 1)
        .join(tot, "cluster")
        .select(col("cluster"), col("n").cast("bigint").as("n"),
          col("label").cast("int").as("top_label"), col("cnt").as("top_n"),
          pround(col("cnt").cast("double") / col("n").cast("double"), 4).as("purity"))
        .orderBy(col("cluster"))
    },
    Some(s"""WITH $oneIterAssignCte,
             g AS (SELECT a2.cluster, emb.label, CAST(COUNT(*) AS BIGINT) AS cnt
                   FROM a2 JOIN embeddings emb ON a2.vec_id = emb.vec_id
                   GROUP BY a2.cluster, emb.label),
             t AS (SELECT cluster, CAST(SUM(cnt) AS BIGINT) AS n FROM g GROUP BY cluster),
             m AS (SELECT cluster, label, cnt FROM (
                     SELECT cluster, label, cnt,
                       row_number() OVER (PARTITION BY cluster
                         ORDER BY cnt DESC, label) AS rn
                     FROM g) WHERE rn = 1)
             SELECT m.cluster, t.n, CAST(m.label AS INT) AS top_label, m.cnt AS top_n,
               FLOOR((CAST(m.cnt AS DOUBLE) / CAST(t.n AS DOUBLE)) * 10000 + 0.5) / 10000
                 AS purity
             FROM m JOIN t ON m.cluster = t.cluster ORDER BY m.cluster"""))

  /** Int8 symmetric quantization audit: per embedding dimension, the
    * absolute-max calibration, the int8 scale amax/127, and the total
    * squared reconstruction error — the report behind "is int8 safe for
    * this index". Every cross-engine float op is IEEE-deterministic
    * (abs/max are order-independent, division and the half-up floor are
    * single ops) and the ONLY accumulation — the per-dim error sum — is
    * floored to integer picounits per term first, so float summation
    * order cannot break engine parity (the q_js_divergence discipline).
    * Shape: one posexplode scan + per-dim aggregate, a broadcast 64-row
    * calibration join back, one final per-dim aggregate.
    */
  private val embedQuantize = Q(
    "q_embed_quantize",
    (spark, dir) => {
      import graft.functions.Portable.pround
      val x = Tables(spark, dir, "embeddings")
        .select(posexplode(col("embedding")).as(Seq("d0", "xf")))
        // 1-based dimension ids, matching the oracle's v[d] indexing
        .select((col("d0") + 1).as("d"), col("xf").cast("double").as("x"))
      val cal = broadcast(x.groupBy(col("d")).agg(max(abs(col("x"))).as("amax")))
      val err = col("x") - col("q") * (col("amax") / 127d)
      x.join(cal, "d")
        .select(col("d"), col("x"), col("amax"),
          when(col("amax") === 0d, lit(0d)).otherwise(
            greatest(lit(-127d), least(lit(127d),
              floor(col("x") / (col("amax") / 127d) + 0.5d)))).as("q"))
        .select(col("d"), col("amax"),
          // err*err by plain multiplication — pow(x, 2) is libm-dependent
          // at the last ulp and the picounit floor would amplify it
          when(col("amax") === 0d, lit(0L)).otherwise(
            floor(err * err * 1e12d).cast("long")).as("e2pico"))
        .groupBy(col("d"))
        .agg(count(lit(1)).as("n"), max(pround(col("amax"), 6)).as("amax"),
          sum(col("e2pico")).as("sq_err_pico"))
        .select(col("d").cast("int").as("d"), col("n"), col("amax"), col("sq_err_pico"))
        .orderBy(col("d"))
    },
    Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
            x AS (SELECT t.d, e.v[t.d] AS x
                  FROM e, UNNEST(generate_series(1, len(e.v))) AS t(d)),
            cal AS (SELECT d, MAX(ABS(x)) AS amax FROM x GROUP BY d),
            q AS (SELECT x.d, x.x, cal.amax,
                    CASE WHEN cal.amax = 0 THEN 0
                         ELSE GREATEST(-127, LEAST(127,
                           FLOOR(x.x / (cal.amax / 127) + 0.5)))
                    END AS q
                  FROM x JOIN cal ON x.d = cal.d),
            s AS (SELECT d, amax,
                    CASE WHEN amax = 0 THEN 0
                         ELSE CAST(FLOOR((x - q * (amax / 127)) * (x - q * (amax / 127))
                           * 1e12) AS BIGINT)
                    END AS e2pico
                  FROM q)
            SELECT CAST(d AS INT) AS d, CAST(COUNT(*) AS BIGINT) AS n,
              FLOOR(amax * 1000000 + 0.5) / 1000000 AS amax,
              CAST(SUM(e2pico) AS BIGINT) AS sq_err_pico
            FROM s GROUP BY d, amax ORDER BY d"""))

  /** Simplified (centroid-based) silhouette — the geometry-only
    * clustering quality gate next to the label-based q_cluster_purity:
    * per vector, a = cosine distance to its OWN centroid, b = distance
    * to the nearest OTHER centroid, s = (b − a)/max(a, b); since the own
    * centroid is the argmax-cosine one, a ≤ b always and
    * s = (a_cos − b_cos)/(1 − b_cos) from the top-2 scored centroids.
    * The centroid-based variant costs O(k) per point (the full
    * silhouette's O(n) per point is the textbook reason it never runs at
    * corpus scale). Reported per cluster: members and mean s.
    *
    * Determinism: per-row s rides the raw-cosine doubles both engines
    * compute identically (the q_knn_ivf assignment-ranking precedent),
    * floored to integer µunits BEFORE the per-cluster mean so the
    * aggregate is exact integer arithmetic (the q_dsir_weights rule).
    *
    * Scale posture: one broadcast 10-row centroid table, one
    * per-vec_id ranking window (partitioned), one bounded aggregate —
    * no pairwise anything.
    */
  private val silhouette = Q(
    "q_silhouette",
    (spark, dir) => {
      import graft.functions.Portable.pround
      val e = Tables(spark, dir, "embeddings")
      val cents = broadcast(e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("cid"), col("embedding").as("cemb")))
      val byVec = Window.partitionBy(col("vec_id"))
        .orderBy(col("ccos").desc, col("cid"))
      val scored = e.crossJoin(cents)
        .select(col("vec_id"), col("cid"),
          VectorOps.cosine(col("embedding"), col("cemb")).as("ccos"))
        .withColumn("rn", row_number().over(byVec))
        .filter(col("rn") <= 2)
      val ab = scored.groupBy(col("vec_id"))
        .agg(max(when(col("rn") === 1, col("cid"))).as("cluster"),
          max(when(col("rn") === 1, col("ccos"))).as("a_cos"),
          max(when(col("rn") === 2, col("ccos"))).as("b_cos"))
        .filter(col("b_cos").isNotNull)
      ab.select(col("cluster"),
          when(lit(1d) - col("b_cos") === 0d, lit(0L)).otherwise(
            floor(((col("a_cos") - col("b_cos")) / (lit(1d) - col("b_cos")))
              * 1e6d).cast("long")).as("s_u"))
        .groupBy(col("cluster"))
        .agg(count(lit(1)).cast("bigint").as("n_members"),
          pround(sum(col("s_u")).cast("double") /
            (count(lit(1)) * 1000000L).cast("double"), 4).as("mean_sil"))
        .orderBy(col("cluster"))
    },
    Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
            cents AS (SELECT vec_id AS cid, v AS cemb FROM e WHERE vec_id < 10),
            scored AS (SELECT e.vec_id, c.cid,
                         list_cosine_similarity(e.v, c.cemb) AS ccos
                       FROM e CROSS JOIN cents c),
            r AS (SELECT vec_id, cid, ccos,
                    row_number() OVER (PARTITION BY vec_id
                      ORDER BY ccos DESC, cid) AS rn
                  FROM scored),
            ab AS (SELECT vec_id,
                     MAX(CASE WHEN rn = 1 THEN cid END) AS cluster,
                     MAX(CASE WHEN rn = 1 THEN ccos END) AS a_cos,
                     MAX(CASE WHEN rn = 2 THEN ccos END) AS b_cos
                   FROM r WHERE rn <= 2 GROUP BY vec_id),
            s AS (SELECT cluster,
                    CASE WHEN 1 - b_cos = 0 THEN 0
                         ELSE CAST(FLOOR(((a_cos - b_cos) / (1 - b_cos))
                           * 1000000) AS BIGINT) END AS s_u
                  FROM ab WHERE b_cos IS NOT NULL)
            SELECT cluster, CAST(COUNT(*) AS BIGINT) AS n_members,
              FLOOR((CAST(SUM(s_u) AS DOUBLE) / CAST(COUNT(*) * 1000000 AS DOUBLE))
                * 10000 + 0.5) / 10000 AS mean_sil
            FROM s GROUP BY cluster ORDER BY cluster"""))

  /** The full Lloyd TRAINING LOOP as a declared query — q_kmeans_assign
    * is one trained iteration; this is the loop (the round-9 verdict's
    * "iterative step exists, the loop does not" pattern, closed here for
    * k-means the way q_bpe_train closed it for BPE). Three assignment
    * rounds from the deterministic vec_id<8 init; per (iteration,
    * cluster): member count plus how many vectors moved INTO the cluster
    * since the previous round (NULL on round 1 — nothing to move from).
    * Convergence shows as moved_in → 0.
    *
    * Scale shape: each round is q_kmeans_assign's broadcast-k linear
    * scan (only the k×dim centroid matrix ever reaches the driver); each
    * round's assignment persists once and feeds three consumers — the
    * size aggregate, the mean recompute, and the next round's
    * moved-vector join (vec_id-keyed, uniform, linear) — then releases
    * with the query (the q_epoch_shuffle per-round cache discipline).
    *
    * Determinism: all outputs are exact integers; assignment decisions
    * ride cosine ranking against AVG centroids, the q_kmeans_assign
    * precedent (accumulation-order noise ~1e-15, far from any ranking
    * boundary at all three verified scale factors).
    */
  private val kmeansTrain = Q(
    "q_kmeans_train",
    (spark, dir) => {
      val e = Tables(spark, dir, "embeddings").select(col("vec_id"), col("embedding"))
      var cents: Seq[(Long, Array[Double])] = e.filter(col("vec_id") < 8)
        .collect()
        .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
        .toSeq.sortBy(_._1)
      var prev: Option[DataFrame] = None
      val perIter = (1 to 3).map { i =>
        val a = Caches.persisted(assign(e, cents))
        if (i < 3) cents = recompute(a)
        val sz = a.groupBy(col("cluster"))
          .agg(count(lit(1)).cast("bigint").as("n_members"))
        val withMoved = prev match {
          case None => sz.withColumn("moved_in", lit(null).cast("bigint"))
          case Some(p) =>
            val mv = a.select(col("vec_id"), col("cluster"))
              .join(p.select(col("vec_id"), col("cluster").as("pc")), "vec_id")
              .groupBy(col("cluster"))
              .agg(sum(when(col("cluster") =!= col("pc"), 1L).otherwise(0L))
                .cast("bigint").as("moved_in"))
            sz.join(mv, Seq("cluster"), "left")
        }
        prev = Some(a)
        withMoved.select(lit(i).as("iter"), col("cluster"),
          col("n_members"), col("moved_in"))
      }
      perIter.reduce(_.unionAll(_)).orderBy(col("iter"), col("cluster"))
    },
    Some(s"""WITH $oneIterAssignCte,
             m2 AS (SELECT a2.cluster AS cid, t.d, AVG(e.v[t.d]) AS md
                    FROM a2 JOIN e USING (vec_id),
                         UNNEST(generate_series(1, len(e.v))) AS t(d)
                    GROUP BY a2.cluster, t.d),
             c2 AS (SELECT cid, list(md ORDER BY d) AS c FROM m2 GROUP BY cid),
             a3 AS (SELECT vec_id, cid AS cluster FROM (
                      SELECT e.vec_id, c2.cid,
                        row_number() OVER (PARTITION BY e.vec_id
                          ORDER BY list_cosine_similarity(e.v, c2.c) DESC, c2.cid) AS rn
                      FROM e CROSS JOIN c2) WHERE rn = 1),
             sizes AS (
               SELECT 1 AS iter, cid AS cluster, CAST(COUNT(*) AS BIGINT) AS n_members
               FROM a1 GROUP BY cid
               UNION ALL
               SELECT 2, cluster, CAST(COUNT(*) AS BIGINT) FROM a2 GROUP BY cluster
               UNION ALL
               SELECT 3, cluster, CAST(COUNT(*) AS BIGINT) FROM a3 GROUP BY cluster),
             mv2 AS (SELECT a2.cluster,
                       CAST(SUM(CASE WHEN a2.cluster <> a1.cid THEN 1 ELSE 0 END) AS BIGINT)
                         AS moved_in
                     FROM a2 JOIN a1 USING (vec_id) GROUP BY a2.cluster),
             mv3 AS (SELECT a3.cluster,
                       CAST(SUM(CASE WHEN a3.cluster <> a2.cluster THEN 1 ELSE 0 END) AS BIGINT)
                         AS moved_in
                     FROM a3 JOIN a2 USING (vec_id) GROUP BY a3.cluster)
             SELECT s.iter, s.cluster, s.n_members,
               CASE WHEN s.iter = 2 THEN mv2.moved_in
                    WHEN s.iter = 3 THEN mv3.moved_in END AS moved_in
             FROM sizes s
             LEFT JOIN mv2 ON s.iter = 2 AND s.cluster = mv2.cluster
             LEFT JOIN mv3 ON s.iter = 3 AND s.cluster = mv3.cluster
             ORDER BY s.iter, s.cluster"""))

  /** Cluster-level corpus audit — the SemDeDup-style curation dashboard:
    * join the trained clustering back to DOCUMENT metadata (vec_id =
    * doc_id, the established cross-table contract) and report, per
    * cluster, the document count, mean length, majority language and
    * source spread. This is the table a curation engineer reads before
    * deciding per-cluster keep/drop/downsample rates — cluster-blocked
    * corpus statistics, the reason the k-means trainer exists in a data
    * pipeline at all.
    *
    * Shape: the shared one-iteration trainer (broadcast-k assignment),
    * one hash join to documents on the id, one partial+final aggregate
    * per (cluster, lang) + a bounded per-cluster majority window, one
    * per-cluster rollup. Mean length is an exact integer SUM/COUNT
    * divided once then portably rounded (no float accumulation).
    */
  private val clusterProfile = Q(
    "q_cluster_profile",
    (spark, dir) => {
      import graft.functions.Portable.pround
      val e = Tables(spark, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val c1 = train(spark, dir, k = 8, iters = 1)
      val d = Tables(spark, dir, "documents")
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
      val j = assign(e, c1).select(col("vec_id"), col("cluster"))
        .join(d, col("vec_id") === col("doc_id"))
      val byLang = j.groupBy(col("cluster"), col("lang"))
        .agg(count(lit(1)).as("ln"))
      val topLang = byLang
        .withColumn("rn", row_number().over(Window.partitionBy(col("cluster"))
          .orderBy(col("ln").desc, col("lang"))))
        .filter(col("rn") === 1)
        .select(col("cluster"), col("lang").as("top_lang"), col("ln").as("top_lang_n"))
      val roll = j.groupBy(col("cluster"))
        .agg(count(lit(1)).cast("bigint").as("n_docs"),
          sum(col("n_chars").cast("bigint")).as("chars"),
          countDistinct(col("source")).cast("bigint").as("n_sources"))
      roll.join(topLang, "cluster")
        .select(col("cluster"), col("n_docs"),
          pround(col("chars").cast("double") / col("n_docs").cast("double"), 2)
            .as("mean_chars"),
          col("top_lang"), col("top_lang_n").cast("bigint").as("top_lang_n"),
          col("n_sources"))
        .orderBy(col("cluster"))
    },
    Some(s"""WITH $oneIterAssignCte,
             j AS (SELECT a2.cluster, d.lang, d.source, d.n_chars
                   FROM a2 JOIN documents d ON a2.vec_id = d.doc_id),
             bl AS (SELECT cluster, lang, CAST(COUNT(*) AS BIGINT) AS ln
                    FROM j GROUP BY cluster, lang),
             tl AS (SELECT cluster, lang AS top_lang, ln AS top_lang_n FROM (
                      SELECT cluster, lang, ln,
                        row_number() OVER (PARTITION BY cluster
                          ORDER BY ln DESC, lang) AS rn
                      FROM bl) WHERE rn = 1),
             roll AS (SELECT cluster, CAST(COUNT(*) AS BIGINT) AS n_docs,
                        CAST(SUM(n_chars) AS BIGINT) AS chars,
                        CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
                      FROM j GROUP BY cluster)
             SELECT r.cluster, r.n_docs,
               FLOOR((CAST(r.chars AS DOUBLE) / CAST(r.n_docs AS DOUBLE)) * 100 + 0.5)
                 / 100 AS mean_chars,
               tl.top_lang, tl.top_lang_n, r.n_sources
             FROM roll r JOIN tl ON r.cluster = tl.cluster
             ORDER BY r.cluster"""))

  /** Product-quantization codebook TRAINING — the missing leg of the ANN
    * scale story (q_knn_ivf routes through coarse centroids, q_knn_pq
    * scores with int8 ADC; real PQ trains per-SUBSPACE codebooks —
    * Jégou et al., "Product Quantization for Nearest Neighbor Search",
    * TPAMI'11, PAPERS.md ANN line): split the 64-dim embedding into 4
    * subspaces of 16 dims, run one trained Lloyd iteration per subspace
    * (init = the sub-vectors of vec_id<4, assignment by squared-L2 with
    * ties to the lowest code — no sqrt anywhere), and report the trained
    * codebook's quality table: per (subspace, code) the member count and
    * the mean squared quantization error, per-vector µunit-floored
    * before the sum (the q_dsir_weights funnel — no order-dependent
    * float accumulation).
    *
    * Scale posture: the codebook is 4×4×16 doubles of driver model state
    * (the KMeans convention); each assignment pass is one broadcast join
    * (16 codebook rows) + a (subspace, vec_id)-partitioned rank window
    * over N×16 narrow rows; the sub-vector relation is built once,
    * persisted, and feeds both assignment passes and the recompute.
    * Encoding a 100 TB corpus with the trained codebook is the identical
    * broadcast-join pass with the window output kept instead of
    * aggregated — 64 bytes/vector → 4 bytes.
    */
  private def l2sq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, v) => acc + v)

  private def pqAssign(subs: DataFrame, cb: Seq[(Int, Long, Seq[Double])]): DataFrame = {
    val spark = subs.sparkSession
    import spark.implicits._
    val cdf = broadcast(cb.toDF("s", "cid", "c"))
    val w = Window.partitionBy(col("s"), col("vec_id"))
      .orderBy(col("dist"), col("cid"))
    subs.join(cdf, "s")
      .select(col("vec_id"), col("s"), col("sv"), col("cid"),
        l2sq(col("sv"), col("c")).as("dist"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("vec_id"), col("s"), col("sv"), col("cid"), col("dist"))
  }

  private val pqTrain = Q(
    "q_pq_train",
    (spark, dir) => {
      import graft.functions.Portable.pround
      val e = Tables(spark, dir, "embeddings").select(col("vec_id"), col("embedding"))
      // fixture dim = 64 (the oneIterAssignCte convention): 4 subspaces × 16
      val subStructs = array((0 until 4).map(s =>
        struct(lit(s).as("s"),
          expr(s"transform(slice(embedding, ${s * 16 + 1}, 16), x -> cast(x as double))")
            .as("sv"))): _*)
      val subs = Caches.persisted(
        e.select(col("vec_id"), explode(subStructs).as("t"))
          .select(col("vec_id"), col("t.s").as("s"), col("t.sv").as("sv")))
      val cb0: Seq[(Int, Long, Seq[Double])] = subs.filter(col("vec_id") < 4)
        .collect() // 16 sub-vectors — bounded init state
        .map(r => (r.getInt(1), r.getLong(0), r.getSeq[Double](2)))
        .toSeq.sortBy(t => (t._1, t._2))
      val cb1: Seq[(Int, Long, Seq[Double])] = pqAssign(subs, cb0)
        .select(col("s"), col("cid"), posexplode(col("sv")).as(Seq("d", "x")))
        .groupBy(col("s"), col("cid"), col("d"))
        .agg(avg(col("x")).as("m"))
        .collect() // ≤ 4×4×16 rows — model state, bounded
        .groupBy(r => (r.getInt(0), r.getLong(1)))
        .map { case ((s, cid), rows) =>
          (s, cid, rows.sortBy(_.getInt(2)).map(_.getDouble(3)).toSeq)
        }.toSeq.sortBy(t => (t._1, t._2))
      pqAssign(subs, cb1)
        .groupBy(col("s"), col("cid"))
        .agg(count(lit(1)).cast("bigint").as("n_vecs"),
          sum(floor(col("dist") * 1e6d).cast("long")).as("err_u"))
        .select(col("s").as("subspace"), col("cid").as("code"), col("n_vecs"),
          pround(col("err_u").cast("double") /
            (col("n_vecs") * 1000000L).cast("double"), 4).as("mse"))
        .orderBy(col("subspace"), col("code"))
    },
    Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
            sub AS (SELECT vec_id, CAST(s.s AS INT) AS s,
                  [v[s.s * 16 + i] for i in generate_series(1, 16)] AS sv
                FROM e, UNNEST(generate_series(0, 3)) AS s(s)),
            c0 AS (SELECT s, vec_id AS cid, sv AS c FROM sub WHERE vec_id < 4),
            a1 AS (SELECT vec_id, s, sv, cid FROM (
                  SELECT sub.vec_id, sub.s, sub.sv, c0.cid,
                    row_number() OVER (PARTITION BY sub.s, sub.vec_id ORDER BY
                      list_sum([(sub.sv[i] - c0.c[i]) * (sub.sv[i] - c0.c[i])
                                for i in generate_series(1, 16)]), c0.cid) AS rn
                  FROM sub JOIN c0 ON sub.s = c0.s) WHERE rn = 1),
            m1 AS (SELECT a1.s, a1.cid, t.d, AVG(a1.sv[t.d]) AS md
                FROM a1, UNNEST(generate_series(1, 16)) AS t(d)
                GROUP BY a1.s, a1.cid, t.d),
            c1 AS (SELECT s, cid, list(md ORDER BY d) AS c FROM m1 GROUP BY s, cid),
            a2 AS (SELECT vec_id, s, cid, dist FROM (
                  SELECT sub.vec_id, sub.s, c1.cid,
                    list_sum([(sub.sv[i] - c1.c[i]) * (sub.sv[i] - c1.c[i])
                              for i in generate_series(1, 16)]) AS dist,
                    row_number() OVER (PARTITION BY sub.s, sub.vec_id ORDER BY
                      list_sum([(sub.sv[i] - c1.c[i]) * (sub.sv[i] - c1.c[i])
                                for i in generate_series(1, 16)]), c1.cid) AS rn
                  FROM sub JOIN c1 ON sub.s = c1.s) WHERE rn = 1)
            SELECT s AS subspace, cid AS code, CAST(COUNT(*) AS BIGINT) AS n_vecs,
              FLOOR((CAST(SUM(CAST(FLOOR(dist * 1000000) AS BIGINT)) AS DOUBLE)
                / CAST(COUNT(*) * 1000000 AS DOUBLE)) * 10000 + 0.5) / 10000 AS mse
            FROM a2 GROUP BY 1, 2 ORDER BY 1, 2"""))

  val all: Seq[Q] =
    Seq(kmeansAssign, clusterPurity, embedQuantize, silhouette, kmeansTrain,
      clusterProfile, pqTrain)
}
