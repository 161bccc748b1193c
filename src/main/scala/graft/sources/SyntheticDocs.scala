package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSourceV2 batch connector generating deterministic synthetic
  * documents — the reference's "caller materializes an in-memory input
  * vector" source (`MapReduceFramework.h:18-20`) re-expressed as a real
  * Spark connector: the data is *described* (row count, partition count,
  * seed) and each executor materializes only its own split, so the
  * "input vector" never exists in one place and scales past memory.
  *
  * Usage:
  * {{{
  * spark.read.format("graft.sources.SyntheticDocs")
  *   .option("rows", 10000).option("partitions", 8).option("seed", 42)
  *   .load()        // => (doc_id BIGINT, text STRING)
  * }}}
  *
  * Implements column pruning (SupportsPushDownRequiredColumns): a
  * doc_id-only projection never synthesizes text. Content is a pure
  * function of (seed, doc_id) — splitmix64-picked words from a fixed
  * vocabulary — so any split can be regenerated anywhere, which is the
  * property that makes retries/speculation safe on a cluster.
  */
class SyntheticDocs extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SyntheticDocs.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new SyntheticDocsTable(new CaseInsensitiveStringMap(properties))
}

object SyntheticDocs {
  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("text", StringType, nullable = false)))

  private val vocab: Array[String] =
    ("the a of and to in is on for with data spark shuffle join map reduce " +
      "vector token corpus sample graph stream batch window state").split(' ')

  private def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** Deterministic text for a doc id: 5 + (h mod 20) vocab words. */
  def textFor(seed: Long, docId: Long): String = {
    val h0 = splitmix64(seed ^ docId)
    val n = 5 + (((h0 >>> 8) % 20 + 20) % 20).toInt
    val sb = new java.lang.StringBuilder
    var h = h0
    var i = 0
    while (i < n) {
      h = splitmix64(h)
      if (i > 0) sb.append(' ')
      sb.append(vocab((((h % vocab.length) + vocab.length) % vocab.length).toInt))
      i += 1
    }
    sb.toString
  }
}

private[sources] class SyntheticDocsTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = "synthetic_docs"
  override def schema(): StructType = SyntheticDocs.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
    new SyntheticDocsScanBuilder(
      rows = options.getLong("rows", 1000L),
      partitions = options.getInt("partitions", 4),
      seed = options.getLong("seed", 42L))
}

private[sources] class SyntheticDocsScanBuilder(rows: Long, partitions: Int, seed: Long)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = SyntheticDocs.schema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new SyntheticDocsScan(rows, partitions, seed, required)
}

private[sources] case class DocsSplit(start: Long, end: Long) extends InputPartition

private[sources] class SyntheticDocsScan(rows: Long, partitions: Int, seed: Long,
    required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"synthetic_docs(rows=$rows, partitions=$partitions, seed=$seed, cols=${required.fieldNames.mkString(",")})"

  override def planInputPartitions(): Array[InputPartition] = {
    val p = math.max(1, partitions)
    (0 until p).map { i =>
      DocsSplit(rows * i / p, rows * (i + 1) / p)
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val cols = required.fieldNames // serialized to executors
    val s = seed
    (partition: InputPartition) => {
      val split = partition.asInstanceOf[DocsSplit]
      new PartitionReader[InternalRow] {
        private var id = split.start - 1
        override def next(): Boolean = { id += 1; id < split.end }
        override def get(): InternalRow = {
          val values = cols.map {
            case "doc_id" => java.lang.Long.valueOf(id)
            case "text" => UTF8String.fromString(SyntheticDocs.textFor(s, id))
          }
          new GenericInternalRow(values.asInstanceOf[Array[Any]])
        }
        override def close(): Unit = ()
      }
    }
  }
}
