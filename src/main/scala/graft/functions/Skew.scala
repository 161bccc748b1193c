package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution is heavy-tailed.
  *
  * AQE's skew-join handling (on by default in Spark 4) covers sort-merge
  * joins at runtime; `saltedJoin` is the explicit algorithmic fallback for
  * when a handful of keys dominate: the large side gets a salt derived from
  * its physical partition, the small side is replicated across all salt
  * values, and the join key becomes (key, salt) — splitting each hot key
  * over `buckets` reducers.
  *
  * Result equality with the plain join is exact (inner joins only);
  * verified in SkewSpec.
  */
object Skew {
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
      buckets: Int): DataFrame = {
    val salted = large.withColumn("_salt", pmod(spark_partition_id(), lit(buckets)))
    val replicated = small.withColumn("_salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated, Seq(key, "_salt"), "inner").drop("_salt")
  }
}
