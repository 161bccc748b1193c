package graft.sources

import org.apache.spark.sql.{Dataset, Encoder, SparkSession}

/** Source/sink parity with the reference engine, whose ONLY source is a
  * caller-materialized in-memory vector and whose only sink is a shared
  * output vector (`MapReduceFramework.h:18-20`): InputVec ⇄ Dataset.
  *
  * File formats (parquet/csv/json) are native `spark.read` — see `Tables`
  * for the parquet testdata path. This object exists so the reference's
  * in-memory contract has an explicit, documented equivalent.
  */
object InMemory {

  /** InputVec parity: local pairs → distributed Dataset.
    * (`SampleClient.cpp:72-79` builds exactly this shape; K1 may be unused,
    * as in the sample where it is always null.)
    */
  def inputVec[K, V](spark: SparkSession, data: Seq[(K, V)])(
      implicit enc: Encoder[(K, V)]): Dataset[(K, V)] =
    spark.createDataset(data)

  /** Unkeyed variant (the sample's K1 = nullptr case). */
  def inputValues[V](spark: SparkSession, data: Seq[V])(
      implicit enc: Encoder[V]): Dataset[V] =
    spark.createDataset(data)

  /** OutputVec parity: materialize results back to the caller
    * (`SampleClient.cpp:101-108` iterates the output vector the same way).
    * Driver-side by definition — use only on reduced, bounded results.
    */
  def outputVec[T](ds: Dataset[T]): Seq[T] = ds.collect().toIndexedSeq
}
