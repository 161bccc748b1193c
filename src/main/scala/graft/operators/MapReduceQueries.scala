package graft.operators

import graft.{Q, Tables}
import graft.mapreduce.MapReduce
import org.apache.spark.sql.functions._

/** Declared queries exercising the generic MapReduce facade through the
  * driver's oracle gate — proving reference-parity semantics (arbitrary
  * client map/reduce) produce the same answers as declarative SQL.
  */
object MapReduceQueries {

  /** Word count through the facade's aggregating (combiner) path: the
    * canonical MapReduce job, typed end-to-end, partial-aggregated
    * map-side. Oracle identical to q_word_count's.
    */
  private val mrWordCount = Q(
    "q_mr_word_count",
    (spark, dir) => {
      import spark.implicits._
      val docs = Tables(spark, dir, "documents")
        .select(col("doc_id"), col("text")).as[(Long, String)]
      MapReduce.mapReduceAgg(docs) { case (_, text) =>
        text.split(" ").iterator.filter(_.nonEmpty).map(w => (w, 1L))
      }(0L)((b, v) => b + v)((a, b) => a + b)(identity)
        .toDF("word", "cnt")
        .orderBy(col("word"))
    },
    Some("""SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM (SELECT UNNEST(string_split(text, ' ')) AS word FROM documents)
            WHERE word <> '' GROUP BY word ORDER BY word"""))

  /** Char count through the facade's general path (flatMapGroups reduce —
    * the reference's exact emit2/emit3 shape): like SampleClient's map
    * (`SampleClient.cpp:34-50`), each record builds a local char histogram
    * and emits one (char, count) pair per NONZERO bin — the reference's
    * own per-record pre-aggregation, which also keeps the shuffle at
    * distinct-chars-per-doc instead of one tuple per character.
    */
  private val mrCharCount = Q(
    "q_mr_char_count",
    (spark, dir) => {
      import spark.implicits._
      val docs = Tables(spark, dir, "documents")
        .select(col("doc_id"), col("text")).as[(Long, String)]
      MapReduce.mapReduce(docs) { case (_, text) =>
        val hist = scala.collection.mutable.LinkedHashMap.empty[Char, Long]
        text.foreach(c => hist.update(c, hist.getOrElse(c, 0L) + 1L))
        hist.iterator.map { case (c, n) => (c.toString, n) }
      } { (ch, counts) => Iterator.single((ch, counts.sum)) }
        .toDF("ch", "cnt")
        .orderBy(col("ch"))
    },
    Some("""SELECT ch, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM (SELECT UNNEST(regexp_extract_all(text, '(?s).')) AS ch FROM documents)
            WHERE ch <> '' GROUP BY ch ORDER BY ch"""))

  /** Per-word bounded top-k documents through the facade's Aggregator
    * (combiner) path with a STRUCTURAL buffer — the O5 leg q_mr_word_count
    * exercises only with a scalar sum: for every word in the vocabulary
    * (a genuinely large group domain), the 3 documents using it most
    * (count DESC, doc_id ASC tiebreak), plus document frequency and total
    * occurrences. The map side pre-aggregates per-document counts (the
    * mrCharCount per-record histogram discipline), the Aggregator buffer
    * is a bounded top-3 list merged associatively — so only ≤3 candidate
    * docs per (word, partition) ever cross the shuffle, the classic
    * bounded-top-k combiner that makes per-key ranking scale-free. The
    * oracle replays it as a row_number window over per-(word, doc) counts.
    */
  private val mrTopDocs = Q(
    "q_mr_topdocs",
    (spark, dir) => {
      import spark.implicits._
      val docs = Tables(spark, dir, "documents")
        .select(col("doc_id"), col("text")).as[(Long, String)]
      def trim(xs: Seq[(Long, Long)]): Seq[(Long, Long)] =
        xs.sortBy { case (c, d) => (-c, d) }.take(3)
      val agg = MapReduce.mapReduceAgg(docs) { case (id, text) =>
        val hist = scala.collection.mutable.LinkedHashMap.empty[String, Long]
        text.split(" ").iterator.filter(_.nonEmpty)
          .foreach(w => hist.update(w, hist.getOrElse(w, 0L) + 1L))
        hist.iterator.map { case (w, c) => (w, (c, id)) }
      }((Seq.empty[(Long, Long)], 0L, 0L)) { case ((top, nd, tot), (c, id)) =>
        (trim(top :+ ((c, id))), nd + 1L, tot + c)
      } { case ((t1, n1, s1), (t2, n2, s2)) => (trim(t1 ++ t2), n1 + n2, s1 + s2) } {
        case (top, nd, tot) =>
          (nd, tot, top.map { case (c, d) => s"$d:$c" }.mkString(","))
      }
      agg.map { case (w, (nd, tot, top)) => (w, nd, tot, top) }
        .toDF("word", "n_docs", "total", "top_docs")
        .orderBy(col("word"))
    },
    Some("""WITH w AS (SELECT doc_id, UNNEST(string_split(text, ' ')) AS word
                       FROM documents),
            wc AS (SELECT word, doc_id, COUNT(*) AS c FROM w
                   WHERE word <> '' GROUP BY word, doc_id),
            r AS (SELECT word, doc_id, c,
                    row_number() OVER (PARTITION BY word
                      ORDER BY c DESC, doc_id) AS rn
                  FROM wc),
            top AS (SELECT word,
                      string_agg(doc_id || ':' || c, ',' ORDER BY rn) AS top_docs
                    FROM r WHERE rn <= 3 GROUP BY word),
            agg AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS n_docs,
                      CAST(SUM(c) AS BIGINT) AS total
                    FROM wc GROUP BY word)
            SELECT a.word, a.n_docs, a.total, t.top_docs
            FROM agg a JOIN top t ON t.word = a.word
            ORDER BY a.word"""))

  val all: Seq[Q] = Seq(mrWordCount, mrCharCount, mrTopDocs)
}
