package graft.operators

import graft.{Q, Tables}
import graft.functions.Portable.pround
import graft.functions.TextOps
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** End-to-end training-data pipeline operators: deterministic train/test
  * splitting, benchmark decontamination, and a composed cleaning pipeline
  * (quality filter → exact dedup → stats). These are the glue operations a
  * 100 TB corpus build runs between the primitive dedup/quality stages.
  */
object PipelineQueries {

  /** Deterministic hash-based train/test split (the reproducible,
    * rescalable way to split a corpus — no RNG, stable under re-runs and
    * under adding data). Bucket = md5-derived 60-bit int mod 100.
    */
  private val trainTestSplit = Q(
    "q_train_test_split",
    (spark, dir) => {
      val bucket = pmod(graft.functions.Portable.hash60(col("doc_id")), lit(100L))
      Tables(spark, dir, "documents")
        .select(col("doc_id"), col("n_chars"),
          when(bucket < 90, "train").otherwise("test").as("split"))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"),
          pround(avg(col("n_chars")), 4).as("avg_chars"))
        .orderBy(col("split"))
    },
    Some("""SELECT CASE WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)
                        % 100 < 90 THEN 'train' ELSE 'test' END AS split,
              CAST(COUNT(*) AS BIGINT) AS n_docs,
              FLOOR((AVG(n_chars)) * 10000 + 0.5) / 10000 AS avg_chars
            FROM documents GROUP BY 1 ORDER BY split"""))

  /** Benchmark decontamination: flag corpus docs sharing any word-4-gram
    * with the benchmark set (doc_id < 20 stands in for the eval set).
    * The benchmark shingle set is broadcast; the corpus side is a
    * semi-join-shaped aggregate keyed on the shingle — linear, skew-free.
    */
  private val contamination = Q(
    "q_contamination",
    (spark, dir) => {
      val sh = Tables(spark, dir, "documents")
        .select(col("doc_id"),
          explode(TextOps.distinctWordNGrams(col("text"), 4)).as("sh"))
      val bench = broadcast(sh.filter(col("doc_id") < 20).select(col("sh")).distinct())
      sh.filter(col("doc_id") >= 20)
        .join(bench, "sh")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_shared"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH toks AS (SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS ws
                          FROM documents),
            sh AS (SELECT DISTINCT doc_id,
                     ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] AS sh
                   FROM toks, UNNEST(generate_series(1, len(ws) - 3)) AS u(i)
                   WHERE len(ws) >= 4),
            bench AS (SELECT DISTINCT sh FROM sh WHERE doc_id < 20)
            SELECT s.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared
            FROM sh s JOIN bench b ON s.sh = b.sh
            WHERE s.doc_id >= 20
            GROUP BY s.doc_id ORDER BY s.doc_id"""))

  /** Composed cleaning pipeline: quality-score filter (>= 0.4) → exact
    * dedup keep-first → per-source stats. The shape every corpus build
    * runs; each stage is the oracle-checked primitive from its own query.
    */
  private val cleanPipeline = Q(
    "q_clean_pipeline",
    (spark, dir) => {
      val (_, _, _, score) = TextOps.qualityScore(col("text"))
      val kept = Tables(spark, dir, "documents")
        .withColumn("score", score)
        .filter(col("score") >= 0.4)
      val w = Window.partitionBy(md5(col("text"))).orderBy(col("doc_id"))
      kept
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), pround(avg(col("score")), 4).as("avg_score"))
        .orderBy(col("source"))
    },
    Some("""WITH t AS (SELECT doc_id, source, text,
                    list_filter(string_split(text, ' '), w -> w <> '') AS ws
                  FROM documents),
            m AS (SELECT doc_id, source, text,
                    CAST(len(ws) AS DOUBLE) AS n_tok,
                    CASE WHEN len(ws) = 0 THEN 0.0
                         ELSE CAST(list_sum(list_transform(ws, w -> length(w))) AS DOUBLE)
                              / CAST(len(ws) AS DOUBLE) END AS avg_len,
                    CASE WHEN len(ws) = 0 THEN 0.0
                         ELSE CAST(len(list_filter(ws, w -> w IN
                           ('the','a','of','and','to','in','is','on','for','with'))) AS DOUBLE)
                           / CAST(len(ws) AS DOUBLE) END AS ratio
                  FROM t),
            scored AS (SELECT doc_id, source, text,
                         LEAST(n_tok / 100.0, 1.0) * 0.4 + ratio * 0.3
                           + LEAST(avg_len / 8.0, 1.0) * 0.3 AS score
                       FROM m),
            kept AS (SELECT * FROM scored WHERE score >= 0.4),
            dedup AS (SELECT doc_id, source, score FROM (
                        SELECT doc_id, source, score,
                          row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
                        FROM kept)
                      WHERE rn = 1)
            SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
              FLOOR((AVG(score)) * 10000 + 0.5) / 10000 AS avg_score
            FROM dedup GROUP BY source ORDER BY source"""))

  /** The full corpus build, end-to-end in one declared query:
    * quality-score filter → exact dedup (keep-first by content hash) →
    * near-duplicate CLUSTER removal (minhash-LSH candidates over the
    * survivors, connected components, drop every non-canonical member) →
    * per-lang corpus stats. Every stage is the oracle-checked primitive
    * from its own query; this query pins their composition — including
    * that near-dup closure runs on the *filtered, exact-deduped* set
    * (running it earlier would let a low-quality duplicate decide which
    * cluster member survives).
    */
  private val corpusPipeline = Q(
    "q_corpus_pipeline",
    (spark, dir) => {
      val (_, _, _, score) = TextOps.qualityScore(col("text"))
      val kept = Tables(spark, dir, "documents")
        .withColumn("score", score)
        .filter(col("score") >= 0.4)
      val w = Window.partitionBy(md5(col("text"))).orderBy(col("doc_id"))
      val exact = kept.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1).drop("rn")
      val sh = exact.select(col("doc_id"),
        explode(TextOps.distinctWordNGrams(col("text"), 3)).as("sh"))
      val dropIds = GraphQueries.componentsOf(DedupQueries.minhashCandidates(sh))
        .filter(col("node") =!= col("component"))
        .select(col("node").as("doc_id"))
      exact.join(dropIds, Seq("doc_id"), "left_anti")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), pround(avg(col("score")), 4).as("avg_score"))
        .orderBy(col("lang"))
    },
    Some(s"""WITH RECURSIVE
             t AS (SELECT doc_id, lang, text,
                     list_filter(string_split(text, ' '), w -> w <> '') AS ws
                   FROM documents),
             m AS (SELECT doc_id, lang, text,
                     CAST(len(ws) AS DOUBLE) AS n_tok,
                     CASE WHEN len(ws) = 0 THEN 0.0
                          ELSE CAST(list_sum(list_transform(ws, w -> length(w))) AS DOUBLE)
                               / CAST(len(ws) AS DOUBLE) END AS avg_len,
                     CASE WHEN len(ws) = 0 THEN 0.0
                          ELSE CAST(len(list_filter(ws, w -> w IN
                            ('the','a','of','and','to','in','is','on','for','with'))) AS DOUBLE)
                            / CAST(len(ws) AS DOUBLE) END AS ratio
                   FROM t),
             scored AS (SELECT doc_id, lang, text,
                          LEAST(n_tok / 100.0, 1.0) * 0.4 + ratio * 0.3
                            + LEAST(avg_len / 8.0, 1.0) * 0.3 AS score
                        FROM m),
             kept AS (SELECT * FROM scored WHERE score >= 0.4),
             exact AS (SELECT doc_id, lang, text, score FROM (
                         SELECT doc_id, lang, text, score,
                           row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
                         FROM kept)
                       WHERE rn = 1),
             ${DedupQueries.minhashCandCteFrom("exact")},
             cc_edges AS (SELECT doc_a AS src, doc_b AS dst FROM cand
                          UNION ALL SELECT doc_b, doc_a FROM cand),
             walk(node, lbl) AS (
               SELECT DISTINCT src, src FROM cc_edges
               UNION
               SELECT e.dst, w.lbl FROM walk w JOIN cc_edges e ON e.src = w.node),
             cc AS (SELECT node, MIN(lbl) AS component FROM walk GROUP BY node),
             final AS (SELECT * FROM exact
                       WHERE doc_id NOT IN (SELECT node FROM cc WHERE node <> component))
             SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
               FLOOR((AVG(score)) * 10000 + 0.5) / 10000 AS avg_score
             FROM final GROUP BY lang ORDER BY lang"""))

  /** Gopher/C4-style filter cascade with REASON CODES: every document is
    * assigned the FIRST rule it fails — too_short (< 30 tokens), word_len
    * (mean token length outside [3, 12]), repetitive (duplicate-trigram
    * ratio > 0.2), low_quality (blended score < 0.4) — or 'kept'. The
    * per-reason census is the report every corpus-cleaning run ships:
    * not just how much was dropped, but WHY (rule attribution drives
    * threshold tuning). Rule order matters and is part of the contract;
    * CASE evaluates lazily in both engines, so the trigram ratio is
    * never computed for sub-3-token documents (no 0/0). One native
    * token-stats + n-gram pass per document, one bounded aggregate, a
    * broadcast 1-row total for the share.
    */
  private val qualityEnsemble = Q(
    "q_quality_ensemble",
    (spark, dir) => {
      val st = TextOps.tokenStats(col("text"))
      val (_, _, _, score) = TextOps.qualityScore(col("text"))
      val nTok = st.getField("n_tokens").cast("double")
      val avgLen = when(st.getField("n_tokens") === 0, lit(0.0))
        .otherwise(st.getField("char_sum").cast("double") / nTok)
      val d = Tables(spark, dir, "documents")
        .select(
          st.getField("n_tokens").cast("long").as("nt"),
          avgLen.as("al"), score.as("sc"),
          size(TextOps.wordNGramsAll(col("text"), 3)).cast("long").as("t3"),
          size(TextOps.distinctWordNGrams(col("text"), 3)).cast("long").as("d3"))
      val reason = when(col("nt") < 30, "too_short")
        .when(col("al") < 3.0 || col("al") > 12.0, "word_len")
        .when(lit(1.0) - col("d3").cast("double") / col("t3").cast("double") > 0.2,
          "repetitive")
        .when(col("sc") < 0.4, "low_quality")
        .otherwise("kept")
      val g = d.select(reason.as("reason"))
        .groupBy(col("reason")).agg(count(lit(1)).as("n_docs"))
      val tot = broadcast(g.agg(sum(col("n_docs")).cast("bigint").as("total")))
      g.crossJoin(tot)
        .select(col("reason"), col("n_docs"),
          pround(col("n_docs").cast("double") / col("total").cast("double"), 4)
            .as("share"))
        .orderBy(col("reason"))
    },
    Some("""WITH t AS (SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS ws
                       FROM documents),
            m AS (SELECT doc_id, ws,
                    CAST(len(ws) AS BIGINT) AS nt,
                    CASE WHEN len(ws) = 0 THEN 0.0
                         ELSE CAST(list_sum(list_transform(ws, w -> length(w))) AS DOUBLE)
                              / CAST(len(ws) AS DOUBLE) END AS al,
                    CASE WHEN len(ws) = 0 THEN 0.0
                         ELSE CAST(len(list_filter(ws, w -> w IN
                           ('the','a','of','and','to','in','is','on','for','with'))) AS DOUBLE)
                           / CAST(len(ws) AS DOUBLE) END AS ratio
                  FROM t),
            tg AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS t3,
                     CAST(COUNT(DISTINCT g) AS BIGINT) AS d3
                   FROM (SELECT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS g
                         FROM t, UNNEST(generate_series(1, len(ws) - 2)) AS u(i)
                         WHERE len(ws) >= 3)
                   GROUP BY doc_id),
            r AS (SELECT CASE
                    WHEN m.nt < 30 THEN 'too_short'
                    WHEN m.al < 3.0 OR m.al > 12.0 THEN 'word_len'
                    WHEN 1.0 - CAST(tg.d3 AS DOUBLE) / CAST(tg.t3 AS DOUBLE) > 0.2
                      THEN 'repetitive'
                    WHEN (LEAST(CAST(m.nt AS DOUBLE) / 100.0, 1.0) * 0.4 + m.ratio * 0.3
                          + LEAST(m.al / 8.0, 1.0) * 0.3) < 0.4 THEN 'low_quality'
                    ELSE 'kept' END AS reason
                  FROM m LEFT JOIN tg ON m.doc_id = tg.doc_id),
            g AS (SELECT reason, CAST(COUNT(*) AS BIGINT) AS n_docs FROM r GROUP BY reason),
            s AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS total FROM g)
            SELECT reason, n_docs,
              FLOOR((CAST(n_docs AS DOUBLE) / CAST(total AS DOUBLE)) * 10000 + 0.5) / 10000
                AS share
            FROM g CROSS JOIN s ORDER BY reason"""))

  /** q_corpus_incremental's two catalog tables: the content-hash store
    * and the canonical band-signature store. */
  private[graft] def corpusStoreTables(spark: org.apache.spark.sql.SparkSession,
      dir: String): (String, String) = {
    val key = StoreToken(spark, dir)
    (s"g_corpus_h_$key", s"g_corpus_bands_$key")
  }

  /** DAY-2 OF THE WHOLE CORPUS PIPELINE — the composition proof
    * (VERDICT r12 task 4): q_corpus_pipeline replays the full build;
    * the per-family incremental organs (q_dedup_incremental's stores,
    * q_store_append's growth) exist separately; this query runs the
    * production nightly loop END-TO-END — tonight's crawl delta
    * (doc_id ≡ 0 mod 10) flows quality filter → exact dedup against the
    * persisted CONTENT-HASH store → near-dup against the persisted
    * BAND-SIGNATURE store (and within-delta, arrival-order) → the
    * admitted-docs funnel, without re-reading any base text.
    *
    * The base state is built once at ingest ([[graft.operators.StoreOnce]]),
    * running the exact q_corpus_pipeline stages over the base corpus:
    * quality ≥ 0.4 → exact keep-first → minhash-LSH + connected-
    * components canonical removal; then two stores persist — the
    * distinct content hashes of the exact survivors (bucketBy(8, h);
    * exact-stage semantics match a full recompute over base ∪ delta:
    * a delta doc equal to ANY quality-kept base doc is a duplicate,
    * canonical or not) and the band signatures of the CANONICAL
    * survivors (bucketBy(8, bandkey) — near-dup admits against what the
    * corpus actually kept). Today's near channel reuses
    * q_dedup_incremental's estimated-Jaccard discipline (16-minhash
    * agreement ≥ 8/16 in the band join; within-delta matches test
    * earlier delta ids — arrival-order semantics, no within-delta CC
    * closure: the store is the canonical authority, documented exactly
    * as q_dedup_incremental does).
    *
    * Output: the four-stage admission funnel (stage, n_docs) — raw
    * delta, quality-kept, exact-surviving, admitted. The DuckDB oracle
    * replays base-state derivation AND the delta pass as pure CTEs
    * (recursive CC walk — the q_corpus_pipeline skeleton), so the
    * store contents and every drop decision are verified exactly.
    *
    * Scale posture: the nightly cost is quality scoring + signatures
    * over the DELTA only, two bucketed store joins with zero store-side
    * exchange (the q_dedup_incremental pin shape), and bounded
    * aggregates; base text is read once at ingest, never again.
    */
  /** Builds the two corpus-pipeline stores (content-hash + canonical
    * band-signature) once per (session, dir) and returns their table
    * names — shared by q_corpus_incremental and q_corpus_delete. */
  private[graft] def ensureCorpusStores(spark: org.apache.spark.sql.SparkSession,
      dir: String): (String, String) = {
    val key = StoreToken(spark, dir)
    val wh = s"/tmp/graft_corpusinc_$key"
    val (hT, bT) = corpusStoreTables(spark, dir)
    val (_, _, _, score) = TextOps.qualityScore(col("text"))
    val base = Tables.spreadIfUnderSplitAtScale(
        Tables(spark, dir, "documents").select(col("doc_id"), col("text")))
      .filter(col("doc_id") % 10 =!= 0)
    StoreOnce(wh) {
      BucketedWorkspace.cleanupOnExit(wh)
      val kept = base.withColumn("score", score).filter(col("score") >= 0.4)
      val w = Window.partitionBy(md5(col("text"))).orderBy(col("doc_id"))
      val exact = graft.Caches.persisted(
        kept.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
          .drop("rn"))
      exact.select(md5(col("text")).as("h")).distinct()
        .write.mode("overwrite").bucketBy(8, "h").sortBy("h")
        .option("path", s"$wh/hashes").saveAsTable(hT)
      val sh = exact.select(col("doc_id"),
        explode(TextOps.distinctWordNGrams(col("text"), 3)).as("sh"))
      val dropIds = GraphQueries.componentsOf(DedupQueries.minhashCandidates(sh))
        .filter(col("node") =!= col("component"))
        .select(col("node").as("doc_id"))
      val canon = exact.join(dropIds, Seq("doc_id"), "left_anti")
      DedupQueries.bandKeyed(DedupQueries.minhashSigs(
          DedupQueries.shingleRelOf(canon.select(col("doc_id"), col("text")))))
        .write.mode("overwrite").bucketBy(8, "bandkey").sortBy("bandkey")
        .option("path", s"$wh/bands").saveAsTable(bT)
    }
    (hT, bT)
  }

  /** Tonight's admission funnel against a given (content-hash store,
    * band store) pair — the q_corpus_incremental delta pass, shared
    * verbatim by q_corpus_delete's pre/post phases. */
  private def deltaFunnel(spark: org.apache.spark.sql.SparkSession, dir: String,
      hT: String, bT: String): org.apache.spark.sql.DataFrame = {
    val (_, _, _, score) = TextOps.qualityScore(col("text"))
    val delta = Tables.spreadIfUnderSplitAtScale(
        Tables(spark, dir, "documents").select(col("doc_id"), col("text")))
      .filter(col("doc_id") % 10 === 0)
    val dkept = graft.Caches.persisted(
      delta.withColumn("score", score).filter(col("score") >= 0.4)
        .select(col("doc_id"), col("text")))
    val wD = Window.partitionBy(col("h")).orderBy(col("doc_id"))
    val dExact = graft.Caches.persisted(
      dkept.select(col("doc_id"), col("text"), md5(col("text")).as("h"))
        .join(spark.table(hT).hint("merge"), Seq("h"), "left_anti")
        .withColumn("rn", row_number().over(wD)).filter(col("rn") === 1)
        .select(col("doc_id"), col("text")))
    val dBandsRaw = graft.Caches.persisted(
      DedupQueries.bandKeyed(DedupQueries.minhashSigs(
        DedupQueries.shingleRelOf(dExact))))
    val dBands = dBandsRaw.select(
      col("doc_id").as("d") +: col("bandkey") +:
        (0 until 16).map(i => col(s"mh$i").as(s"dm$i")): _*)
    val storeBands = spark.table(bT).select(
      col("doc_id").as("m") +: col("bandkey") +:
        (0 until 16).map(i => col(s"mh$i")): _*)
    val dAsStore = dBandsRaw.select(
      col("doc_id").as("m") +: col("bandkey") +:
        (0 until 16).map(i => col(s"mh$i")): _*)
    val mm = (0 until 16).map(i =>
      when(col(s"dm$i") === col(s"mh$i"), 1L).otherwise(0L)).reduce(_ + _)
    val nearDrop = dBands.join(storeBands.hint("merge"), "bandkey")
      .unionAll(dBands.join(dAsStore, "bandkey").filter(col("m") < col("d")))
      .select(col("d"), col("m"), mm.as("mm"))
      .filter(col("mm") >= 8)
      .select(col("d").as("doc_id")).distinct()
    val dNear = dExact.join(nearDrop, Seq("doc_id"), "left_anti")
    def c(df: org.apache.spark.sql.DataFrame, stage: String) =
      df.agg(count(lit(1)).cast("bigint").as("n_docs"))
        .select(lit(stage).as("stage"), col("n_docs"))
    c(delta, "1_delta_raw").unionAll(c(dkept, "2_quality"))
      .unionAll(c(dExact, "3_exact")).unionAll(c(dNear, "4_near"))
  }

  private val corpusIncremental = Q(
    "q_corpus_incremental",
    (spark, dir) => {
      val (hT, bT) = ensureCorpusStores(spark, dir)
      deltaFunnel(spark, dir, hT, bT).orderBy(col("stage"))
    },
    Some {
      val mmE = (0 until 16).map(i =>
        s"CASE WHEN d.mh$i = s.mh$i THEN 1 ELSE 0 END").mkString(" + ")
      s"""WITH RECURSIVE
          t AS (SELECT doc_id, text,
                  list_filter(string_split(text, ' '), w -> w <> '') AS ws
                FROM documents WHERE doc_id % 10 <> 0),
          m AS (SELECT doc_id, text,
                  CAST(len(ws) AS DOUBLE) AS n_tok,
                  CASE WHEN len(ws) = 0 THEN 0.0
                       ELSE CAST(list_sum(list_transform(ws, w -> length(w))) AS DOUBLE)
                            / CAST(len(ws) AS DOUBLE) END AS avg_len,
                  CASE WHEN len(ws) = 0 THEN 0.0
                       ELSE CAST(len(list_filter(ws, w -> w IN
                         ('the','a','of','and','to','in','is','on','for','with'))) AS DOUBLE)
                         / CAST(len(ws) AS DOUBLE) END AS ratio
                FROM t),
          kept AS (SELECT doc_id, text FROM m
                   WHERE LEAST(n_tok / 100.0, 1.0) * 0.4 + ratio * 0.3
                     + LEAST(avg_len / 8.0, 1.0) * 0.3 >= 0.4),
          exact AS (SELECT doc_id, text FROM (
                      SELECT doc_id, text,
                        row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
                      FROM kept)
                    WHERE rn = 1),
          ${DedupQueries.minhashCandCteFrom("exact")},
          cc_edges AS (SELECT doc_a AS src, doc_b AS dst FROM cand
                       UNION ALL SELECT doc_b, doc_a FROM cand),
          walk(node, lbl) AS (
            SELECT DISTINCT src, src FROM cc_edges
            UNION
            SELECT e.dst, w.lbl FROM walk w JOIN cc_edges e ON e.src = w.node),
          cc AS (SELECT node, MIN(lbl) AS component FROM walk GROUP BY node),
          canon AS (SELECT doc_id, text FROM exact
                    WHERE doc_id NOT IN (SELECT node FROM cc WHERE node <> component)),
          hstore AS (SELECT DISTINCT md5(text) AS h FROM exact),
          ${DedupQueries.bandKeyedCteFrom("canon", "s")},
          dt AS (SELECT doc_id, text,
                   list_filter(string_split(text, ' '), w -> w <> '') AS ws
                 FROM documents WHERE doc_id % 10 = 0),
          dmet AS (SELECT doc_id, text,
                     CAST(len(ws) AS DOUBLE) AS n_tok,
                     CASE WHEN len(ws) = 0 THEN 0.0
                          ELSE CAST(list_sum(list_transform(ws, w -> length(w))) AS DOUBLE)
                               / CAST(len(ws) AS DOUBLE) END AS avg_len,
                     CASE WHEN len(ws) = 0 THEN 0.0
                          ELSE CAST(len(list_filter(ws, w -> w IN
                            ('the','a','of','and','to','in','is','on','for','with'))) AS DOUBLE)
                            / CAST(len(ws) AS DOUBLE) END AS ratio
                   FROM dt),
          dkept AS (SELECT doc_id, text FROM dmet
                    WHERE LEAST(n_tok / 100.0, 1.0) * 0.4 + ratio * 0.3
                      + LEAST(avg_len / 8.0, 1.0) * 0.3 >= 0.4),
          dexact AS (SELECT doc_id, text FROM (
                       SELECT doc_id, text,
                         row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
                       FROM dkept
                       WHERE md5(text) NOT IN (SELECT h FROM hstore))
                     WHERE rn = 1),
          ${DedupQueries.bandKeyedCteFrom("dexact", "d")},
          ndrop AS (SELECT DISTINCT d.doc_id
                    FROM dbands d JOIN sbands s ON d.bandkey = s.bandkey
                    WHERE $mmE >= 8
                    UNION
                    SELECT d.doc_id
                    FROM dbands d JOIN dbands s
                      ON d.bandkey = s.bandkey AND s.doc_id < d.doc_id
                    WHERE $mmE >= 8),
          dnear AS (SELECT doc_id FROM dexact
                    WHERE doc_id NOT IN (SELECT doc_id FROM ndrop))
          SELECT stage, n_docs FROM (
            SELECT '1_delta_raw' AS stage, CAST(COUNT(*) AS BIGINT) AS n_docs
            FROM documents WHERE doc_id % 10 = 0
            UNION ALL SELECT '2_quality', CAST(COUNT(*) AS BIGINT) FROM dkept
            UNION ALL SELECT '3_exact', CAST(COUNT(*) AS BIGINT) FROM dexact
            UNION ALL SELECT '4_near', CAST(COUNT(*) AS BIGINT) FROM dnear)
          ORDER BY stage"""
    })

  /** q_corpus_delete's post-purge catalog tables. */
  private[graft] def corpusDeleteTables(spark: org.apache.spark.sql.SparkSession,
      dir: String): (String, String) = {
    val key = StoreToken(spark, dir)
    (s"g_cdel_h_$key", s"g_cdel_bands_$key")
  }

  /** CORPUS-DELETE PROPAGATION (VERDICT r13 stretch) — the GDPR purge
    * through the COMPOSED pipeline, not a single index: q_store_delete
    * proved the band store forgets; a purged document must leave BOTH
    * corpus stores in the same pass, or tonight's funnel keeps
    * rejecting deltas on the purged doc's authority. One purge pass
    * (request: doc_id ≡ 5 mod 10) rewrites
    *   (a) the content-hash store — a hash leaves ONLY when its last
    *       holder leaves (an identical retained doc keeps the hash; the
    *       orphan check is what makes hash-keyed state GDPR-correct),
    *   (b) the band-signature store — purged doc ids anti-join out,
    * both under their original bucket layouts (post-purge funnel joins
    * stay exchange-free, plan-pinned). The output runs tonight's
    * four-stage admission funnel against the pre-purge AND post-purge
    * stores: a delta doc whose only exact/near authority was a purged
    * doc flips from rejected to admitted (phase column; property-tested
    * on a planted corpus where the flip is forced).
    *
    * Scale posture: the band rewrite is request-bounded (broadcast
    * anti-join); the hash orphan check reads the base's quality-kept
    * hashes once — a purge-cadence corpus-hash pass, disclosed (a
    * production store would carry (hash, refcount) to avoid it; the
    * nightly funnel itself stays delta-only either way).
    */
  private val corpusDelete = Q(
    "q_corpus_delete",
    (spark, dir) => {
      val (hT, bT) = ensureCorpusStores(spark, dir)
      val key = StoreToken(spark, dir)
      val wh = s"/tmp/graft_cdel_$key"
      val (hT2, bT2) = corpusDeleteTables(spark, dir)
      StoreOnce(wh) {
        BucketedWorkspace.cleanupOnExit(wh)
        val (_, _, _, score) = TextOps.qualityScore(col("text"))
        val kept = Tables.spreadIfUnderSplitAtScale(
            Tables(spark, dir, "documents").select(col("doc_id"), col("text")))
          .filter(col("doc_id") % 10 =!= 0)
          .withColumn("score", score).filter(col("score") >= 0.4)
        // hashes whose LAST holder is purged (orphans) leave the store;
        // a hash shared with any retained doc stays
        val orphanH = kept.filter(col("doc_id") % 10 === 5)
          .select(md5(col("text")).as("h")).distinct()
          .join(kept.filter(col("doc_id") % 10 =!= 5)
            .select(md5(col("text")).as("h")).distinct(), Seq("h"), "left_anti")
        spark.table(hT).join(broadcast(orphanH), Seq("h"), "left_anti")
          .write.mode("overwrite").bucketBy(8, "h").sortBy("h")
          .option("path", s"$wh/hashes").saveAsTable(hT2)
        val purgedIds = broadcast(
          Tables(spark, dir, "documents").filter(col("doc_id") % 10 === 5)
            .select(col("doc_id")))
        spark.table(bT).join(purgedIds, Seq("doc_id"), "left_anti")
          .write.mode("overwrite").bucketBy(8, "bandkey").sortBy("bandkey")
          .option("path", s"$wh/bands").saveAsTable(bT2)
      }
      deltaFunnel(spark, dir, hT, bT)
        .select(lit("pre").as("phase"), col("stage"), col("n_docs"))
        .unionAll(deltaFunnel(spark, dir, hT2, bT2)
          .select(lit("post").as("phase"), col("stage"), col("n_docs")))
        .orderBy(col("phase"), col("stage"))
    },
    Some {
      val mmE = (0 until 16).map(i =>
        s"CASE WHEN d.mh$i = s.mh$i THEN 1 ELSE 0 END").mkString(" + ")
      val mmE2 = (0 until 16).map(i =>
        s"CASE WHEN d2.mh$i = s2.mh$i THEN 1 ELSE 0 END").mkString(" + ")
      s"""WITH RECURSIVE
          t AS (SELECT doc_id, text,
                  list_filter(string_split(text, ' '), w -> w <> '') AS ws
                FROM documents WHERE doc_id % 10 <> 0),
          m AS (SELECT doc_id, text,
                  CAST(len(ws) AS DOUBLE) AS n_tok,
                  CASE WHEN len(ws) = 0 THEN 0.0
                       ELSE CAST(list_sum(list_transform(ws, w -> length(w))) AS DOUBLE)
                            / CAST(len(ws) AS DOUBLE) END AS avg_len,
                  CASE WHEN len(ws) = 0 THEN 0.0
                       ELSE CAST(len(list_filter(ws, w -> w IN
                         ('the','a','of','and','to','in','is','on','for','with'))) AS DOUBLE)
                         / CAST(len(ws) AS DOUBLE) END AS ratio
                FROM t),
          kept AS (SELECT doc_id, text FROM m
                   WHERE LEAST(n_tok / 100.0, 1.0) * 0.4 + ratio * 0.3
                     + LEAST(avg_len / 8.0, 1.0) * 0.3 >= 0.4),
          exact AS (SELECT doc_id, text FROM (
                      SELECT doc_id, text,
                        row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
                      FROM kept)
                    WHERE rn = 1),
          ${DedupQueries.minhashCandCteFrom("exact")},
          cc_edges AS (SELECT doc_a AS src, doc_b AS dst FROM cand
                       UNION ALL SELECT doc_b, doc_a FROM cand),
          walk(node, lbl) AS (
            SELECT DISTINCT src, src FROM cc_edges
            UNION
            SELECT e.dst, w.lbl FROM walk w JOIN cc_edges e ON e.src = w.node),
          cc AS (SELECT node, MIN(lbl) AS component FROM walk GROUP BY node),
          canon AS (SELECT doc_id, text FROM exact
                    WHERE doc_id NOT IN (SELECT node FROM cc WHERE node <> component)),
          hstore AS (SELECT DISTINCT md5(text) AS h FROM exact),
          orphanh AS (SELECT DISTINCT md5(text) AS h FROM kept
                      WHERE doc_id % 10 = 5
                        AND md5(text) NOT IN (SELECT md5(text) FROM kept
                                              WHERE doc_id % 10 <> 5)),
          hstore2 AS (SELECT h FROM hstore WHERE h NOT IN (SELECT h FROM orphanh)),
          canon2 AS (SELECT doc_id, text FROM canon WHERE doc_id % 10 <> 5),
          ${DedupQueries.bandKeyedCteFrom("canon", "s")},
          ${DedupQueries.bandKeyedCteFrom("canon2", "s2")},
          dt AS (SELECT doc_id, text,
                   list_filter(string_split(text, ' '), w -> w <> '') AS ws
                 FROM documents WHERE doc_id % 10 = 0),
          dmet AS (SELECT doc_id, text,
                     CAST(len(ws) AS DOUBLE) AS n_tok,
                     CASE WHEN len(ws) = 0 THEN 0.0
                          ELSE CAST(list_sum(list_transform(ws, w -> length(w))) AS DOUBLE)
                               / CAST(len(ws) AS DOUBLE) END AS avg_len,
                     CASE WHEN len(ws) = 0 THEN 0.0
                          ELSE CAST(len(list_filter(ws, w -> w IN
                            ('the','a','of','and','to','in','is','on','for','with'))) AS DOUBLE)
                            / CAST(len(ws) AS DOUBLE) END AS ratio
                   FROM dt),
          dkept AS (SELECT doc_id, text FROM dmet
                    WHERE LEAST(n_tok / 100.0, 1.0) * 0.4 + ratio * 0.3
                      + LEAST(avg_len / 8.0, 1.0) * 0.3 >= 0.4),
          dexact AS (SELECT doc_id, text FROM (
                       SELECT doc_id, text,
                         row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
                       FROM dkept
                       WHERE md5(text) NOT IN (SELECT h FROM hstore))
                     WHERE rn = 1),
          dexact2 AS (SELECT doc_id, text FROM (
                        SELECT doc_id, text,
                          row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
                        FROM dkept
                        WHERE md5(text) NOT IN (SELECT h FROM hstore2))
                      WHERE rn = 1),
          ${DedupQueries.bandKeyedCteFrom("dexact", "d")},
          ${DedupQueries.bandKeyedCteFrom("dexact2", "d2")},
          ndrop AS (SELECT DISTINCT d.doc_id
                    FROM dbands d JOIN sbands s ON d.bandkey = s.bandkey
                    WHERE $mmE >= 8
                    UNION
                    SELECT d.doc_id
                    FROM dbands d JOIN dbands s
                      ON d.bandkey = s.bandkey AND s.doc_id < d.doc_id
                    WHERE $mmE >= 8),
          ndrop2 AS (SELECT DISTINCT d2.doc_id
                     FROM d2bands d2 JOIN s2bands s2 ON d2.bandkey = s2.bandkey
                     WHERE $mmE2 >= 8
                     UNION
                     SELECT d2.doc_id
                     FROM d2bands d2 JOIN d2bands s2
                       ON d2.bandkey = s2.bandkey AND s2.doc_id < d2.doc_id
                     WHERE $mmE2 >= 8),
          dnear AS (SELECT doc_id FROM dexact
                    WHERE doc_id NOT IN (SELECT doc_id FROM ndrop)),
          dnear2 AS (SELECT doc_id FROM dexact2
                     WHERE doc_id NOT IN (SELECT doc_id FROM ndrop2))
          SELECT phase, stage, n_docs FROM (
            SELECT 'pre' AS phase, '1_delta_raw' AS stage,
              CAST(COUNT(*) AS BIGINT) AS n_docs
            FROM documents WHERE doc_id % 10 = 0
            UNION ALL SELECT 'pre', '2_quality', CAST(COUNT(*) AS BIGINT) FROM dkept
            UNION ALL SELECT 'pre', '3_exact', CAST(COUNT(*) AS BIGINT) FROM dexact
            UNION ALL SELECT 'pre', '4_near', CAST(COUNT(*) AS BIGINT) FROM dnear
            UNION ALL SELECT 'post', '1_delta_raw', CAST(COUNT(*) AS BIGINT)
            FROM documents WHERE doc_id % 10 = 0
            UNION ALL SELECT 'post', '2_quality', CAST(COUNT(*) AS BIGINT) FROM dkept
            UNION ALL SELECT 'post', '3_exact', CAST(COUNT(*) AS BIGINT) FROM dexact2
            UNION ALL SELECT 'post', '4_near', CAST(COUNT(*) AS BIGINT) FROM dnear2)
          ORDER BY phase, stage"""
    })

  /** q_corpus_refcount's three store-rung catalog tables. */
  private[graft] def corpusRefcountTables(spark: org.apache.spark.sql.SparkSession,
      dir: String): (String, String, String) = {
    val key = StoreToken(spark, dir)
    (s"g_rc_a_$key", s"g_rc_b_$key", s"g_rc_c_$key")
  }

  /** The quality-kept (doc_id, h) relation under `filter` — the Spark
    * side of q_corpus_refcount's corpus slices. */
  private def refcountKeptOf(spark: org.apache.spark.sql.SparkSession,
      dir: String, filter: org.apache.spark.sql.Column): org.apache.spark.sql.DataFrame = {
    val (_, _, _, score) = TextOps.qualityScore(col("text"))
    Tables.spreadIfUnderSplitAtScale(
        Tables(spark, dir, "documents").select(col("doc_id"), col("text")))
      .filter(filter)
      .withColumn("score", score).filter(col("score") >= 0.4)
      .select(col("doc_id"), md5(col("text")).as("h"))
  }

  /** q_corpus_refcount's PURGE VERB, re-runnable (a retry after a crashed
    * rewrite recomputes the identical post-purge store — the decrement is
    * a pure function of the ingest store and the request): the request's
    * holder counts broadcast onto the bucketed store as a left-join
    * decrement, hashes leave at refs = 0. */
  private[graft] def refcountPurge(spark: org.apache.spark.sql.SparkSession,
      dir: String): Unit = {
    val (aT, bT, _) = corpusRefcountTables(spark, dir)
    val key = StoreToken(spark, dir)
    val wh = s"/tmp/graft_rc_$key"
    val dec = refcountKeptOf(spark, dir, col("doc_id") % 10 === 5)
      .groupBy(col("h")).agg(count(lit(1)).as("dec"))
    spark.table(aT).join(broadcast(dec), Seq("h"), "left")
      .select(col("h"),
        (col("refs") - coalesce(col("dec"), lit(0L))).as("refs"))
      .filter(col("refs") > 0)
      .write.mode("overwrite").bucketBy(8, "h").sortBy("h")
      .option("path", s"$wh/b").saveAsTable(bT)
    ()
  }

  /** The DuckDB quality-kept CTE pair (tokenized docs + kept (doc_id, h)),
    * shared by q_corpus_refcount's three recompute arms. */
  private def keptCteSql(alias: String, where: String): String =
    s"""${alias}_t AS (SELECT doc_id, text,
                  list_filter(string_split(text, ' '), w -> w <> '') AS ws
                FROM documents WHERE $where),
          $alias AS (SELECT doc_id, md5(text) AS h FROM (
                SELECT doc_id, text,
                  CAST(len(ws) AS DOUBLE) AS n_tok,
                  CASE WHEN len(ws) = 0 THEN 0.0
                       ELSE CAST(list_sum(list_transform(ws, w -> length(w))) AS DOUBLE)
                            / CAST(len(ws) AS DOUBLE) END AS avg_len,
                  CASE WHEN len(ws) = 0 THEN 0.0
                       ELSE CAST(len(list_filter(ws, w -> w IN
                         ('the','a','of','and','to','in','is','on','for','with'))) AS DOUBLE)
                         / CAST(len(ws) AS DOUBLE) END AS ratio
                FROM ${alias}_t)
              WHERE LEAST(n_tok / 100.0, 1.0) * 0.4 + ratio * 0.3
                + LEAST(avg_len / 8.0, 1.0) * 0.3 >= 0.4)"""

  /** REFCOUNTED CONTENT-HASH STORE (VERDICT r14 task 2): q_corpus_delete's
    * orphan rule — "a hash leaves the store only with its LAST holder" —
    * is GDPR-correct but implemented there as a purge-cadence pass over
    * the corpus's quality-kept hashes (disclosed in its Q doc). The
    * production store carries (h, refcount) instead, and every verb
    * becomes ARITHMETIC on the store:
    *
    *   - create: one ingest pass folds the base corpus to (h, holders) —
    *     the same one-time cost the plain hash store pays;
    *   - purge (the star): the request's holder counts broadcast onto
    *     the bucketed store as a LEFT-join decrement; a hash leaves at
    *     refs = 0. The only text read is the REQUEST's own documents —
    *     no corpus pass, no orphan recompute;
    *   - append: tonight's quality-kept delta holder counts merge in as
    *     a full-outer increment (new hashes enter at their count), the
    *     day-N twin of the decrement — and the replayed funnel's exact
    *     stage against the appended store admits 0 of the same delta,
    *     the self-check that the increment actually landed.
    *
    * Output: one row per store rung (a_create / b_purge / c_append) with
    * the store's cardinality and total refcount, the delta funnel's
    * exact-stage admissions against that rung, and n_diverge — the
    * symmetric difference between the ARITHMETIC store and a
    * from-scratch recompute of (h, holders) over the rung's corpus
    * population, compared on (h, refs) pairs, pinned at 0. The
    * recompute arms are corpus-width AUDIT yardsticks (the
    * q_sketch_expire posture): production drops them and keeps the
    * O(request) verbs.
    *
    * Scale posture: purge compute ∝ the request (its docs' hashes
    * broadcast); append compute ∝ the delta (one shuffle of delta
    * hashes onto the bucketed store's layout, zero store-side
    * exchange); the store rewrite is hash-cardinality bounded — counter
    * rows, never document text — and on a bucket-partitioned layout
    * only touched buckets rewrite. The audit arms alone re-read corpus
    * text.
    */
  private val corpusRefcount = Q(
    "q_corpus_refcount",
    (spark, dir) => {
      val (aT, bT, cT) = corpusRefcountTables(spark, dir)
      val key = StoreToken(spark, dir)
      val wh = s"/tmp/graft_rc_$key"
      def keptOf(filter: org.apache.spark.sql.Column): org.apache.spark.sql.DataFrame =
        refcountKeptOf(spark, dir, filter)
      StoreOnce(wh) {
        BucketedWorkspace.cleanupOnExit(wh)
        // ingest: the one-time corpus fold to (h, holders)
        keptOf(col("doc_id") % 10 =!= 0)
          .groupBy(col("h")).agg(count(lit(1)).as("refs"))
          .write.mode("overwrite").bucketBy(8, "h").sortBy("h")
          .option("path", s"$wh/a").saveAsTable(aT)
        // purge: request-bounded decrement; a hash leaves at zero
        refcountPurge(spark, dir)
        // append: delta-bounded increment; new hashes enter at their count
        val inc = keptOf(col("doc_id") % 10 === 0)
          .groupBy(col("h")).agg(count(lit(1)).as("inc"))
        spark.table(bT).join(inc, Seq("h"), "full_outer")
          .select(col("h"),
            (coalesce(col("refs"), lit(0L)) + coalesce(col("inc"), lit(0L)))
              .as("refs"))
          .write.mode("overwrite").bucketBy(8, "h").sortBy("h")
          .option("path", s"$wh/c").saveAsTable(cT)
      }
      val dkept = graft.Caches.persisted(keptOf(col("doc_id") % 10 === 0))
      def phaseRow(phase: String, t: String,
          recompute: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
        val st = spark.table(t)
        val stats = st.agg(count(lit(1)).cast("bigint").as("n_hashes"),
          sum(col("refs")).cast("bigint").as("total_refs"))
        val ex = dkept.join(st, Seq("h"), "left_anti")
          .agg(countDistinct(col("h")).cast("bigint").as("n_exact_admitted"))
        val rec = recompute.groupBy(col("h")).agg(count(lit(1)).as("refs"))
        val div = st.join(rec, Seq("h", "refs"), "left_anti")
          .unionAll(rec.join(st, Seq("h", "refs"), "left_anti"))
          .agg(count(lit(1)).cast("bigint").as("n_diverge"))
        stats.crossJoin(ex).crossJoin(div)
          .select(lit(phase).as("phase"), col("n_hashes"), col("total_refs"),
            col("n_exact_admitted"), col("n_diverge"))
      }
      val keptBase = keptOf(col("doc_id") % 10 =!= 0)
      phaseRow("a_create", aT, keptBase)
        .unionAll(phaseRow("b_purge", bT,
          keptBase.filter(col("doc_id") % 10 =!= 5)))
        .unionAll(phaseRow("c_append", cT,
          keptBase.filter(col("doc_id") % 10 =!= 5).unionAll(dkept)))
        .orderBy(col("phase"))
    },
    Some(s"""WITH ${keptCteSql("kept", "doc_id % 10 <> 0")},
          ${keptCteSql("dkept", "doc_id % 10 = 0")},
          rc_a AS (SELECT h, CAST(COUNT(*) AS BIGINT) AS refs
                   FROM kept GROUP BY h),
          rc_b AS (SELECT h, CAST(COUNT(*) AS BIGINT) AS refs
                   FROM kept WHERE doc_id % 10 <> 5 GROUP BY h),
          rc_c AS (SELECT h, CAST(COUNT(*) AS BIGINT) AS refs FROM (
                     SELECT h FROM kept WHERE doc_id % 10 <> 5
                     UNION ALL SELECT h FROM dkept) GROUP BY h),
          ex_a AS (SELECT CAST(COUNT(DISTINCT h) AS BIGINT) AS n FROM dkept
                   WHERE h NOT IN (SELECT h FROM rc_a)),
          ex_b AS (SELECT CAST(COUNT(DISTINCT h) AS BIGINT) AS n FROM dkept
                   WHERE h NOT IN (SELECT h FROM rc_b)),
          ex_c AS (SELECT CAST(COUNT(DISTINCT h) AS BIGINT) AS n FROM dkept
                   WHERE h NOT IN (SELECT h FROM rc_c))
          SELECT phase, n_hashes, total_refs, n_exact_admitted, n_diverge
          FROM (
            SELECT 'a_create' AS phase,
              (SELECT CAST(COUNT(*) AS BIGINT) FROM rc_a) AS n_hashes,
              (SELECT CAST(SUM(refs) AS BIGINT) FROM rc_a) AS total_refs,
              (SELECT n FROM ex_a) AS n_exact_admitted,
              CAST(0 AS BIGINT) AS n_diverge
            UNION ALL
            SELECT 'b_purge',
              (SELECT CAST(COUNT(*) AS BIGINT) FROM rc_b),
              (SELECT CAST(SUM(refs) AS BIGINT) FROM rc_b),
              (SELECT n FROM ex_b), CAST(0 AS BIGINT)
            UNION ALL
            SELECT 'c_append',
              (SELECT CAST(COUNT(*) AS BIGINT) FROM rc_c),
              (SELECT CAST(SUM(refs) AS BIGINT) FROM rc_c),
              (SELECT n FROM ex_c), CAST(0 AS BIGINT))
          ORDER BY phase"""))

  val all: Seq[Q] = Seq(trainTestSplit, contamination, cleanPipeline,
    corpusPipeline, qualityEnsemble, corpusIncremental, corpusDelete,
    corpusRefcount)
}
