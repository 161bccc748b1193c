package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-15 properties: the IVF day-N lifecycle ladder (VERDICT r14
  * task 1) proven on the store files themselves, and the ConfLock
  * concurrency guarantee (task 5) turned from "present by construction"
  * into an actually-raced two-thread proof.
  */
class Round15PropertiesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  private def outOf(name: String): Seq[String] = {
    val rows = Registry.byName(name).build(spark, dir).collect()
      .map(_.toString).toSeq
    Caches.releaseAll()
    rows
  }

  private def dataFiles(root: String): Seq[java.io.File] = {
    def walk(f: java.io.File): Seq[java.io.File] = {
      val cs = f.listFiles()
      if (cs == null) Seq(f) else cs.toSeq.flatMap(walk)
    }
    walk(new java.io.File(root)).filter(f =>
      f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
  }

  test("q_ivf_lifecycle: the rung ledger measures the file-growth/" +
    "compaction curve — appends grow files, delete+expire shrink rows, " +
    "compact collapses to one file per cluster preserving rows") {
    outOf("q_ivf_lifecycle") // builds + runs the ladder via StoreOnce
    val (lT, cT, wh) = operators.IvfQueries.ivfLifecycleStore(spark, dir)
    val ledger = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"$wh/ledger.txt")), "UTF-8")
      .split("\n").toSeq.map { l =>
        val Array(rung, files, rows) = l.split(":")
        (rung, files.toLong, rows.toLong)
      }
    assert(ledger.map(_._1) === Seq("a_create", "b_append_d1",
      "c_append_d2", "d_delete", "e_expire", "f_compact"),
      s"ladder rungs out of order: $ledger")
    val m = ledger.map(t => t._1 -> (t._2, t._3)).toMap
    // appends: one cluster-partition file set per vintage, rows grow
    assert(m("b_append_d1")._1 > m("a_create")._1 &&
      m("c_append_d2")._1 > m("b_append_d1")._1,
      s"appends must grow the file ledger: $ledger")
    assert(m("b_append_d1")._2 > m("a_create")._2 &&
      m("c_append_d2")._2 > m("b_append_d1")._2,
      s"appends must grow rows: $ledger")
    // the purge and the retention horizon both shrink rows
    assert(m("d_delete")._2 < m("c_append_d2")._2,
      s"the purge must remove rows: $ledger")
    assert(m("e_expire")._2 < m("d_delete")._2,
      s"the expire must remove the delta1 vintage's rows: $ledger")
    // compaction: rows preserved exactly, one file per surviving cluster
    assert(m("f_compact")._2 === m("e_expire")._2,
      s"compaction must preserve rows: $ledger")
    val nClusters = spark.table(cT).select(col("cluster")).distinct().count()
    assert(m("f_compact")._1 === nClusters,
      s"compaction must collapse to one file per cluster " +
        s"($nClusters clusters): $ledger")
    assert(m("f_compact")._1 <= m("e_expire")._1,
      s"compaction must not grow the file ledger: $ledger")
    // the grown store no longer carries delta1 anywhere: catalog or disk
    assert(spark.table(lT).filter(col("vintage") === "delta1").count() === 0L)
    assert(!new java.io.File(s"$wh/index/vintage=delta1").exists(),
      "expired vintage's files not reclaimed")
    Caches.releaseAll()
  }

  test("q_ivf_lifecycle: delta2's partition files survive the delete AND " +
    "the expire byte-identical (manifest), and the retention verb is " +
    "idempotent (drop-twice = drop-once)") {
    val out1 = outOf("q_ivf_lifecycle")
    val (lT, _, wh) = operators.IvfQueries.ivfLifecycleStore(spark, dir)
    val manifest = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$wh/delta2_manifest.txt")), "UTF-8")
    val now = dataFiles(s"$wh/index/vintage=delta2")
      .map(f => s"${f.getAbsolutePath}:${f.length}:${f.lastModified}")
      .sorted.mkString("\n")
    assert(now === manifest,
      "delta2's files must survive the delete and the expire untouched")
    val snap = spark.table(lT).collect().map(_.toString).sorted.toSeq
    // the retention job re-runs (crash after the catalog drop, retry, a
    // second nightly pass — all must be no-ops)
    operators.IvfQueries.ivfLifecycleExpireDrop(spark, dir)
    assert(spark.table(lT).collect().map(_.toString).sorted.toSeq === snap,
      "re-running the expire changed the store")
    assert(outOf("q_ivf_lifecycle") === out1,
      "query output changed after the expire re-run")
  }

  test("q_ivf_lifecycle: grown and compact phases serve identical " +
    "neighbors, no delta1 survivor, and the compacted probe still rides " +
    "a cluster PartitionFilter (plan pin)") {
    val rows = Registry.byName("q_ivf_lifecycle").build(spark, dir).collect()
    Caches.releaseAll()
    val byPhase = rows.groupBy(_.getString(0))
    assert(byPhase.keySet === Set("compact", "grown"))
    def strip(rs: Array[org.apache.spark.sql.Row]): Seq[String] =
      rs.map(r => (r.getLong(1), r.getInt(2), r.getDouble(3), r.getString(4))
        .toString).sorted.toSeq
    assert(strip(byPhase("compact")) === strip(byPhase("grown")),
      "compaction changed the served answers")
    assert(rows.forall(_.getLong(1) % 10 != 1),
      "an expired delta1 vector is still served")
    assert(rows.forall(_.getLong(1) % 10 != 5),
      "a purged vector is still served")
    // layout pin: the routed filter must prune the compacted table's
    // partitions, not scan-then-filter
    val (_, cT, _) = operators.IvfQueries.ivfLifecycleStore(spark, dir)
    val plan = spark.table(cT).filter(col("cluster").isin(0, 1))
      .queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*cluster".r.findFirstIn(plan).isDefined,
      s"compacted probe lost the cluster PartitionFilter:\n$plan")
  }

  test("q_corpus_refcount: on a planted multi-holder corpus the decrement " +
    "store keeps a shared hash alive through a partial purge, drops it at " +
    "zero, flips the delta admission, and never diverges from recompute") {
    import spark.implicits._
    // 100+ words so every doc clears the quality gate (n_tok/100 term)
    def long(tag: String): String =
      (s"the $tag document text starts here and " * 20).trim
    val t1 = long("shared-retained") // docs 11 (kept) and 15 (purged)
    val t2 = long("shared-purged")   // docs 25 and 35 — both purged
    val t3 = long("orphaned")        // doc 45 — purged, delta twin at 30
    val rows = Seq(
      (11L, t1), (15L, t1),          // multi-holder: one holder survives
      (25L, t2), (35L, t2),          // multi-holder: all holders purged
      (45L, t3),                     // single holder, purged
      (16L, long("plain-base")),     // untouched base doc
      (20L, t1),                     // delta doc duplicating a SURVIVING hash
      (30L, t3))                     // delta doc whose only authority purges
    val out = java.nio.file.Files.createTempDirectory("graft-rc").toString
    rows.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    val got = Registry.byName("q_corpus_refcount").build(spark, out).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    Caches.releaseAll()
    // a_create: 4 hashes (t1×2, t2×2, t3, plain) over 6 base holders;
    // both delta hashes (t1, t3) are in the store → 0 admitted
    assert(got("a_create") === ((4L, 6L, 0L, 0L)), s"create rung wrong: $got")
    // b_purge: t1 survives at refs 1 (doc 11 still holds it — the
    // multi-holder case a naive anti-join delete would get wrong);
    // t2 and t3 leave at zero
    assert(got("b_purge")._1 === 2L,
      s"post-purge store must hold exactly {t1, plain}: $got")
    assert(got("b_purge")._2 === 2L, s"post-purge total refs wrong: $got")
    // the flip: doc 30's only exact authority (45/t3) purged → admitted;
    // doc 20's authority survived in doc 11 → still rejected
    assert(got("b_purge")._3 === 1L,
      s"the purge must flip exactly doc 30's admission: $got")
    // the arithmetic store never diverges from the recompute, any rung
    assert(got.values.forall(_._4 == 0L), s"store/recompute diverged: $got")
    // c_append: both delta hashes merge in (t1 increments to 2, t3
    // re-enters at 1) → 3 hashes, 4 refs; replaying the delta admits 0
    assert(got("c_append") === ((3L, 4L, 0L, 0L)), s"append rung wrong: $got")
  }

  test("q_jaccard_approx: the banded sketch head is exact-audited in-output " +
    "— every emitted pair within the 2-standard-error bound, no cross-side " +
    "collision in the head") {
    val rows = Registry.byName("q_jaccard_approx").build(spark, dir).collect()
    Caches.releaseAll()
    assert(rows.length === 20, "the head must fill at every fixture scale")
    rows.foreach { r =>
      val (n, m) = (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue)
      assert((n & 1L) === (m & 1L),
        s"cross-side pair in the head (true Jaccard 0): ($n, $m)")
      assert(r.getAs[Number](5).intValue === 1,
        s"emitted pair outside the 2se bound: $r")
      // the deterministic estimator surfaces a genuinely high-overlap
      // head on this fixture (exact ≥ 0.5 for every emitted pair)
      assert(r.getAs[Number](4).longValue >= 500000L,
        s"head pair with low true Jaccard: $r")
    }
  }

  test("q_corpus_refcount: the purge verb is idempotent — a retry after a " +
    "crashed rewrite recomputes the identical post-purge store") {
    val out1 = outOf("q_corpus_refcount") // builds the rungs via StoreOnce
    val (_, bT, _) = operators.PipelineQueries.corpusRefcountTables(spark, dir)
    val snap = spark.table(bT).collect().map(_.toString).sorted.toSeq
    operators.PipelineQueries.refcountPurge(spark, dir)
    assert(spark.table(bT).collect().map(_.toString).sorted.toSeq === snap,
      "re-running the purge changed the post-purge store")
    assert(outOf("q_corpus_refcount") === out1,
      "query output changed after the purge re-run")
  }
}
