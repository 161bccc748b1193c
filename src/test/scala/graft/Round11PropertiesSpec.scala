package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Naive in-memory replays for the round-11 operators, plus THE round-11
  * property: delta-vs-store incremental dedup is EQUIVALENT to a full-corpus
  * recompute restricted to the pairs that touch the delta — the guarantee
  * that lets a production pipeline skip re-scanning the base corpus every
  * night without changing what gets flagged.
  */
class Round11PropertiesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  private def md5hex(s: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  private def hash60(s: String): Long =
    java.lang.Long.parseLong(md5hex(s).take(15), 16)

  private def tokens(text: String): Seq[String] =
    text.split(" ", -1).filter(_.nonEmpty).toSeq

  /** Naive 16-XOR-minhash signature over distinct word-3-grams (None when
    * the doc has < 3 words — no shingles, no signature, like the query).
    */
  private def naiveSigs(text: String): Option[Seq[Long]] = {
    val sh = tokens(text).sliding(3).filter(_.size == 3)
      .map(_.mkString(" ")).toSeq.distinct
    if (sh.isEmpty) None
    else Some(graft.operators.DedupQueries.minhashSeeds.map(k =>
      sh.map(s => hash60(s) ^ k).min))
  }

  private def bandKeys(sigs: Seq[Long]): Seq[(Int, Seq[Long])] =
    (0 until 4).map(b => b -> sigs.slice(b * 4, b * 4 + 4))

  /** Naive incremental dedup over an in-memory corpus: returns
    * (doc_id, kind, match_doc, est_bp) rows exactly like the query.
    */
  private def naiveIncremental(corpus: Seq[(Long, String)])
      : Seq[(Long, String, Long, Long)] = {
    val isDelta = (id: Long) => id % 10 == 0
    val hashes = corpus.map { case (id, t) => id -> md5hex(t) }.toMap
    val sigs = corpus.flatMap { case (id, t) => naiveSigs(t).map(id -> _) }.toMap
    // a delta doc d matches m when m is base (any id) or an earlier delta
    val eligible = (d: Long, m: Long) =>
      isDelta(d) && m != d && (!isDelta(m) || m < d)
    val ids = corpus.map(_._1)
    val exactPairs = for {
      d <- ids if isDelta(d); m <- ids
      if eligible(d, m) && hashes(m) == hashes(d)
    } yield (d, m)
    val exact = exactPairs.groupBy(_._1).toSeq.map { case (d, ms) =>
      (d, "exact", ms.map(_._2).min, 10000L)
    }
    val near = (for {
      d <- ids if isDelta(d) && sigs.contains(d)
      m <- ids if eligible(d, m) && sigs.contains(m)
      if bandKeys(sigs(d)).intersect(bandKeys(sigs(m))).nonEmpty
      mm = sigs(d).zip(sigs(m)).count { case (a, b) => a == b }
      if mm >= 8 && !exactPairs.contains((d, m))
    } yield (d, "near", m, mm * 625L)).distinct
    (exact ++ near).sortBy(r => (r._1, r._2, r._3))
  }

  /** Naive FULL-corpus near-dup recompute (the nightly batch pass the
    * incremental path replaces): unordered pairs sharing a band, verified
    * by the same signature estimate, exact-equal pairs excluded.
    */
  private def naiveFullNearPairs(corpus: Seq[(Long, String)]): Set[(Long, Long)] = {
    val hashes = corpus.map { case (id, t) => id -> md5hex(t) }.toMap
    val sigs = corpus.flatMap { case (id, t) => naiveSigs(t).map(id -> _) }.toMap
    val ids = corpus.map(_._1).filter(sigs.contains)
    (for {
      a <- ids; b <- ids if a < b
      if bandKeys(sigs(a)).intersect(bandKeys(sigs(b))).nonEmpty
      mm = sigs(a).zip(sigs(b)).count { case (x, y) => x == y }
      if mm >= 8 && hashes(a) != hashes(b)
    } yield (a, b)).toSet
  }

  /** Planted corpus: base = ids not ≡ 0 (mod 10), delta = ids ≡ 0.
    *   - doc 20 is an EXACT copy of base doc 3;
    *   - docs 10 and 40 are exact copies of each other (within-delta:
    *     40 must match earlier delta 10 — arrival order, not the store);
    *   - doc 30 is base doc 2 with one word changed (near dup, crosses
    *     the split);
    *   - docs 1, 11, 23 are vocabulary-disjoint noise.
    */
  private def plantedCorpus: Seq[(Long, String)] = {
    val t2 = (0 until 60).map(i => s"b$i").mkString(" ")
    val t3 = (0 until 60).map(i => s"c$i").mkString(" ")
    val t10 = (0 until 60).map(i => s"d$i").mkString(" ")
    val t30 = ((0 until 30).map(i => s"b$i") ++ Seq("CHANGED") ++
      (31 until 60).map(i => s"b$i")).mkString(" ")
    Seq(
      1L -> (0 until 60).map(i => s"a$i").mkString(" "),
      2L -> t2,
      3L -> t3,
      11L -> (0 until 60).map(i => s"e$i").mkString(" "),
      23L -> (0 until 60).map(i => s"f$i").mkString(" "),
      10L -> t10,
      20L -> t3,
      30L -> t30,
      40L -> t10)
  }

  private def stageDocs(corpus: Seq[(Long, String)]): String = {
    val tmp = java.nio.file.Files.createTempDirectory("graft-r11").toString
    import spark.implicits._
    corpus.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    tmp
  }

  test("q_dedup_incremental equals the naive delta-vs-store replay on a planted corpus") {
    val corpus = plantedCorpus
    val tmp = stageDocs(corpus)
    val got = Registry.byName("q_dedup_incremental").build(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    Caches.releaseAll()
    val want = naiveIncremental(corpus)
    assert(got === want, s"got=$got want=$want")
    // the plant's specific guarantees, so a silently-empty channel can't pass:
    val exact = got.filter(_._2 == "exact")
    assert(exact.contains((20L, "exact", 3L, 10000L)),
      "delta doc 20 must exact-match base doc 3")
    assert(exact.contains((40L, "exact", 10L, 10000L)),
      "delta doc 40 must exact-match EARLIER delta doc 10 (arrival order)")
    assert(!exact.exists(_._1 == 10L),
      "delta doc 10 has no base or earlier-delta copy — must not be flagged")
    val near = got.filter(_._2 == "near")
    assert(near.exists(p => p._1 == 30L && p._3 == 2L),
      "delta doc 30 must near-match base doc 2")
    assert(!near.exists(p => p._1 == 20L && p._3 == 3L),
      "exact-equal pairs stay in the exact channel")
  }

  test("delta-vs-store dedup == full-corpus recompute restricted to delta-touching pairs") {
    // the round-11 property, on the planted corpus AND the real sf0.001 one
    val real = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    for ((corpus, label) <- Seq((plantedCorpus, "planted"), (real, "sf0.001"))) {
      val isDelta = (id: Long) => id % 10 == 0
      val full = naiveFullNearPairs(corpus)
        .filter { case (a, b) => isDelta(a) || isDelta(b) }
      val inc = naiveIncremental(corpus).filter(_._2 == "near")
        .map(r => (math.min(r._1, r._3), math.max(r._1, r._3))).toSet
      assert(inc === full,
        s"[$label] incremental near pairs must equal the restricted full recompute: " +
          s"inc-only=${inc -- full} full-only=${full -- inc}")
    }
  }

  test("q_dedup_incremental on the real corpus: near channel only (fixture has no exact dups)") {
    val got = Registry.byName("q_dedup_incremental").build(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    Caches.releaseAll()
    assert(got.forall(_._2 == "near"), s"unexpected exact rows: ${got.filter(_._2 == "exact")}")
    val want = naiveIncremental(
      Tables(spark, dir, "documents").select(col("doc_id"), col("text")).collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq)
    assert(got === want)
  }

  test("streaming content dedup == batch keep-first on an arrival-ordered planted stream") {
    import spark.implicits._
    import graft.streaming.Streams
    // planted exact dups; one file per doc, mtime-ordered, so arrival
    // order IS doc_id order and every copy lands within one watermark
    // horizon (ts = t0 + doc_id seconds; horizon 2 h >> 9 s)
    val corpus = plantedCorpus
    val t0 = 1704067200L * 1000000L
    val staged = java.nio.file.Files.createTempDirectory("graft-sdedup").toString
    corpus.sortBy(_._1).zipWithIndex.foreach { case ((id, text), i) =>
      Seq((id, text, t0 + id * 1000000L)).toDF("doc_id", "text", "ts_us")
        .select(col("doc_id"), col("text"), timestamp_micros(col("ts_us")).as("ts"))
        .coalesce(1).write.parquet(s"$staged/f%03d.parquet".format(i))
      import java.nio.file.{Files, Paths, FileVisitOption}
      import java.nio.file.attribute.FileTime
      Files.walk(Paths.get(s"$staged/f%03d.parquet".format(i)), FileVisitOption.FOLLOW_LINKS)
        .filter(Files.isRegularFile(_))
        .forEach(p => Files.setLastModifiedTime(p,
          FileTime.fromMillis(1704067200000L + i * 60000L)))
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.TimestampType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$staged/*.parquet")
    val q = Streams.dedupDocsStream(stream).writeStream
      .format("memory").queryName("doc_dedup").outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("doc_dedup").select("doc_id").collect()
      .map(_.getLong(0)).sorted.toSeq
    // batch keep-first == keep-lowest-id per content hash (q_dedup_exact rule)
    val want = corpus.groupBy { case (_, t) => md5hex(t) }
      .values.map(_.map(_._1).min).toSeq.sorted
    assert(got === want, s"got=$got want=$want")
    // the planted copies (20 of 3, 40 of 10) must be the dropped ones
    assert(!got.contains(20L) && !got.contains(40L) && got.contains(3L) && got.contains(10L))
  }
}
