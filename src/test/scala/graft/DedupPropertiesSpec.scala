package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Property obligations for the dedup/topk operators (SURVEY.md §5.2):
  * dedup idempotence, topk ⊆ sort prefix, LSH candidate soundness.
  */
class DedupPropertiesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  test("exact dedup is idempotent: dedup(dedup(x)) == dedup(x)") {
    val once = Registry.byName("q_dedup_exact").build(spark, dir)
    // re-dedup the surviving doc ids joined back to their text
    val docs = Tables(spark, dir, "documents")
    val survivors = docs.join(once.select("doc_id"), "doc_id")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(md5(col("text"))).orderBy(col("doc_id"))
    val twice = survivors.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).select("doc_id", "lang", "source")
    assert(twice.count() === once.count())
    assert(twice.exceptAll(once.select("doc_id", "lang", "source")).count() === 0)
  }

  test("topk is a prefix of the full sort") {
    val topk = Registry.byName("q_topk").build(spark, dir).collect()
    val full = Tables(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"),
        graft.functions.Portable.pround(col("o_totalprice"), 4).as("price"))
      .orderBy(col("price").desc, col("o_orderkey"))
      .limit(10).collect()
    assert(topk.toSeq === full.toSeq)
  }

  test("minhash LSH candidates include every exact-duplicate pair") {
    // construct a frame with a known duplicate: doc 0's text under two ids
    import spark.implicits._
    val texts = Tables(spark, dir, "documents")
      .select("doc_id", "text").as[(Long, String)].collect().take(20)
    val withDup = (texts :+ ((9999L, texts.head._2))).toSeq.toDF("doc_id", "text")
    // run the same pipeline shape as q_dedup_minhash over this frame
    val ws = graft.functions.TextOps.words(col("text"))
    val sh = withDup.select(col("doc_id"),
      explode(array_distinct(graft.functions.TextOps.shingles(ws, 3))).as("sh"))
    val mh = sh.withColumn("seed", explode(sequence(lit(0), lit(15))))
      .groupBy(col("doc_id"), col("seed"))
      .agg(min(graft.functions.TextOps.hashHex(col("seed"), col("sh"))).as("mh"))
    val bands = mh.groupBy(col("doc_id"), floor(col("seed") / 4).cast("int").as("band"))
      .agg(concat_ws(",", transform(sort_array(collect_list(struct(col("seed"), col("mh")))),
        x => x.getField("mh"))).as("sig"))
    val cand = bands.as("a").join(bands.as("b"),
      col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b")).distinct()
    val pairs = cand.as[(Long, Long)].collect().toSet
    assert(pairs.contains((texts.head._1, 9999L)),
      s"identical docs must collide in every band; got $pairs")
  }

  test("simhash of identical texts is identical") {
    val sims = Registry.byName("q_dedup_simhash").build(spark, dir)
    // deterministic: running twice yields byte-identical signatures
    val a = sims.collect().map(_.toSeq)
    val b = Registry.byName("q_dedup_simhash").build(spark, dir).collect().map(_.toSeq)
    assert(a.toSeq === b.toSeq)
  }
}
