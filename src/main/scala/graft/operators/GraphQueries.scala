package graft.operators

import graft.{Q, Tables}
import graft.functions.TextOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph-shaped operators for the dedup pipeline: connected components
  * over near-duplicate candidate pairs.
  *
  * MinHash-LSH emits *pairs*, but corpus dedup must keep one document per
  * duplicate *cluster* — near-duplication is transitively closed in
  * practice (A~B, B~C ⇒ keep one of {A,B,C}). That closure is exactly
  * connected components on the candidate graph, computed here with
  * iterative hash-min label propagation: every node starts as its own
  * label and repeatedly takes the minimum label among itself and its
  * neighbors until a fixpoint. The result (min reachable doc_id per node)
  * is iteration-order independent, so the output is deterministic even
  * though the loop runs a data-dependent number of rounds.
  *
  * Scale posture (100 TB): each round is one join + one min-aggregate,
  * both hash-partitioned on node id — no driver-side graph state; rounds
  * needed = graph diameter, and dup-cluster diameters are tiny (pairs all
  * share shingles). At cluster scale the same loop runs with
  * `localCheckpoint()` per round to truncate lineage, and the two-phase
  * large-star/small-star variant (Kiveris et al., "Connected Components
  * in MapReduce and Beyond", SoCC'14 — see PAPERS.md) bounds rounds to
  * O(log²n) on adversarial graphs. The reference engine has no graph
  * counterpart (SURVEY.md §2.2) — this is a north-star pipeline operator.
  */
object GraphQueries {

  /** Hash-min label propagation to a fixpoint. `edges` must be symmetric
    * (both directions present). Returns (node, component=min reachable id).
    */
  private[graft] def connectedComponents(edges: DataFrame, maxRounds: Int = 50): DataFrame = {
    // One propagation step, lazily: own labels and neighbor labels merge
    // in a single min-aggregate.
    def step(labels: DataFrame): DataFrame = {
      val viaNeighbors = edges.join(labels, edges("src") === labels("node"))
        .select(col("dst").as("node"), col("lbl"))
      labels.union(viaNeighbors)
        .groupBy(col("node")).agg(min(col("lbl")).as("lbl"))
    }
    var cached = edges.select(col("src").as("node")).distinct()
      .withColumn("lbl", col("node")).persist()
    var labels = cached
    var changed = 1L
    var props = 0
    while (changed > 0 && props < maxRounds) {
      // Two lazy propagation steps execute in ONE job; the convergence
      // signal (did step 2 improve on step 1?) rides in the second
      // aggregate via an own-label marker instead of a separate join.
      // If step 2 changed nothing, step 2's output is the fixpoint even
      // when step 1 did change something.
      val mid = step(labels)
      val viaNeighbors = edges.join(mid, edges("src") === mid("node"))
        .select(col("dst").as("node"), col("lbl"), lit(false).as("own"))
      val merged = mid.select(col("node"), col("lbl"), lit(true).as("own"))
        .union(viaNeighbors)
        .groupBy(col("node"))
        .agg(min(col("lbl")).as("new_lbl"),
          min(when(col("own"), col("lbl"))).as("old_lbl"))
        .persist()
      changed = merged.filter(col("new_lbl") < col("old_lbl")).count()
      cached.unpersist()
      cached = merged
      labels = merged.select(col("node"), col("new_lbl").as("lbl"))
      props += 2
    }
    // A truncated propagation would silently return WRONG labels (multiple
    // "canonical" docs per cluster); refuse instead — maxRounds is a
    // runaway backstop, not an approximation knob.
    if (changed > 0) throw new IllegalStateException(
      s"connectedComponents did not converge within $maxRounds propagation steps " +
        s"($changed labels still improving) — raise maxRounds for this graph")
    // The final round's cache stays registered: the returned DataFrame
    // reads it, so unpersisting here would force a full lineage recompute
    // (including the already-unpersisted earlier rounds) on execution,
    // and an eager localCheckpoint pays an extra materialization job per
    // invocation (measured ~2x on q_cc_dedup). Spark's ContextCleaner
    // unpersists the blocks once the DataFrame is garbage-collected, so
    // retention is bounded by the caller's reference lifetime.
    labels.select(col("node"), col("lbl").as("component"))
  }

  /** Symmetrize candidate pairs and label their connected components:
    * (doc_a, doc_b) → (node, component). Materializes the candidate set
    * once so the propagation loop's repeated scans reuse it. Single home
    * for the wiring shared by q_cc_dedup and q_corpus_pipeline.
    */
  private[graft] def componentsOf(candPairs: DataFrame): DataFrame = {
    val cand = candPairs.persist()
    cand.count()
    val edges = cand.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(cand.select(col("doc_b").as("src"), col("doc_a").as("dst")))
    // The propagation loop has materialized its final labels by the time
    // connectedComponents returns, so the candidate cache can be released
    // even though `cc` executes later (a cache miss would recompute
    // candPairs, still correctly).
    val cc = connectedComponents(edges)
    cand.unpersist()
    cc
  }

  /** Dedup clustering: minhash-LSH candidate pairs → connected components
    * → canonical keep (lowest doc_id per cluster). Output: every document
    * that has at least one near-duplicate candidate, its cluster id, and
    * whether it is the cluster's canonical survivor.
    */
  private val ccDedup = Q(
    "q_cc_dedup",
    (spark, dir) => {
      val sh = Tables(spark, dir, "documents")
        .select(col("doc_id"),
          explode(TextOps.distinctWordNGrams(col("text"), 3)).as("sh"))
      componentsOf(DedupQueries.minhashCandidates(sh))
        .select(col("node").as("doc_id"), col("component"),
          (col("node") === col("component")).cast("int").as("is_canonical"))
        .orderBy(col("doc_id"))
    },
    Some(s"""WITH RECURSIVE ${DedupQueries.minhashCandCte},
             edges AS (SELECT doc_a AS src, doc_b AS dst FROM cand
                       UNION ALL SELECT doc_b, doc_a FROM cand),
             walk(node, lbl) AS (
               SELECT DISTINCT src, src FROM edges
               UNION
               SELECT e.dst, w.lbl FROM walk w JOIN edges e ON e.src = w.node),
             cc AS (SELECT node, MIN(lbl) AS component FROM walk GROUP BY node)
             SELECT node AS doc_id, component,
               CAST(CASE WHEN node = component THEN 1 ELSE 0 END AS INT) AS is_canonical
             FROM cc ORDER BY doc_id"""))

  val all: Seq[Q] = Seq(ccDedup)
}
