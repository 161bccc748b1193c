package graft.operators

import graft.{Q, Tables}
import graft.functions.Portable.pround
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bounded top-k-per-key as a typed `Aggregator` — the custom-reduce
  * (O5) path applied to ranking: instead of window-sorting every group
  * (full sort of each partition's rows), each map task keeps at most k
  * (value, id) pairs per key and merges k-bounded buffers. State per key
  * is O(k) regardless of group size — the shape that survives a 100 TB
  * group whose rows would never fit a sort buffer. This is what Spark's
  * own TakeOrderedAndProject does globally, declared here per-key.
  *
  * Determinism: the comparator is the total order (value DESC, id ASC),
  * so ties cut identically to the oracle's ROW_NUMBER tiebreak.
  */
object TopK {

  /** Keep the k largest (value, id) pairs under (value DESC, id ASC).
    * The buffer is maintained in sorted order, so the per-row reduce is
    * an O(1) early reject for rows below the current k-th (the common
    * case once the buffer fills) or an O(k) ordered insert — never a
    * re-sort per record.
    */
  final class TopKAgg(k: Int) extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {
    // total order: value DESC, id ASC — `beats` means "ranks strictly higher"
    private def beats(a: (Double, Long), b: (Double, Long)): Boolean =
      a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)
    private def insert(b: Seq[(Double, Long)], a: (Double, Long)): Seq[(Double, Long)] = {
      val i = b.indexWhere(x => beats(a, x)) match {
        case -1 => b.length
        case n => n
      }
      val grown = (b.take(i) :+ a) ++ b.drop(i)
      if (grown.length > k) grown.dropRight(1) else grown
    }
    override def zero: Seq[(Double, Long)] = Seq.empty
    override def reduce(b: Seq[(Double, Long)], a: (Double, Long)): Seq[(Double, Long)] =
      if (b.length >= k && !beats(a, b.last)) b else insert(b, a)
    override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
      b.foldLeft(a)((acc, x) =>
        if (acc.length >= k && !beats(x, acc.last)) acc else insert(acc, x))
    override def finish(r: Seq[(Double, Long)]): Seq[(Double, Long)] = r
    override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
    override def outputEncoder: Encoder[Seq[(Double, Long)]] = bufferEncoder
  }

  /** Top-3 orders per customer by price through the bounded aggregator;
    * oracle replays it with a ROW_NUMBER window.
    */
  private val topkHeap = Q(
    "q_topk_heap",
    (spark, dir) => {
      import spark.implicits._
      val agg = new TopKAgg(3)
      Tables(spark, dir, "orders")
        .select(col("o_custkey"), col("o_totalprice"), col("o_orderkey"))
        .as[(Long, Double, Long)]
        .groupByKey(_._1)
        .mapValues(r => (r._2, r._3))
        .agg(agg.toColumn.name("top"))
        .flatMap { case (cust, top) =>
          top.iterator.zipWithIndex.map { case ((price, okey), i) =>
            (cust, i + 1, okey, price)
          }
        }
        .toDF("o_custkey", "rn", "o_orderkey", "price")
        .select(col("o_custkey"), col("rn").cast("int").as("rn"),
          col("o_orderkey"), pround(col("price"), 2).as("price"))
        .orderBy(col("o_custkey"), col("rn"))
    },
    Some("""SELECT o_custkey, CAST(rn AS INT) AS rn, o_orderkey,
              FLOOR((o_totalprice) * 100 + 0.5) / 100 AS price
            FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                    row_number() OVER (PARTITION BY o_custkey
                      ORDER BY o_totalprice DESC, o_orderkey) AS rn
                  FROM orders)
            WHERE rn <= 3 ORDER BY o_custkey, rn"""))

  val all: Seq[Q] = Seq(topkHeap)
}
