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

  val all: Seq[Q] = Seq(mrWordCount, mrCharCount)
}
