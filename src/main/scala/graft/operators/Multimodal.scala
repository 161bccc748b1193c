package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.functions._

/** A typed media record: modality + opaque binary payload. Real pipelines
  * put image/audio/video bytes here; the testdata has no media table, so
  * the declared query derives the payload from documents.text — the Spark
  * plumbing (binary column, typed Dataset, partition-wise decode) is real,
  * only the codec is stubbed.
  */
final case class MediaRecord(doc_id: Long, modality: String, data: Array[Byte])

/** Deterministic metadata "decoded" from the payload. */
final case class MediaMeta(doc_id: Long, byte_len: Long, first_byte: Int,
    width: Int, height: Int, channels: Int)

/** Multimodal column handling: treat image/audio/video as opaque `binary`
  * columns with typed metadata, decoded partition-wise.
  *
  * The decode step is a clearly-marked STUB (this container has no image/
  * audio libraries): it derives deterministic fake dimensions from the raw
  * bytes. The Spark-side shape is the real one — a typed
  * `Dataset[MediaRecord]` flowing through `mapPartitions` in executor-sized
  * batches, which is exactly where a JNI/ffmpeg/opencv call would sit, with
  * no driver involvement and no shuffle.
  */
object Multimodal {

  /** STUB codec — replace with a real decoder where media libs exist.
    * Deterministic on the payload bytes so the DuckDB oracle can reproduce
    * it arithmetically.
    */
  def decodeStub(r: MediaRecord): MediaMeta = {
    val len = r.data.length.toLong
    val first = if (r.data.nonEmpty) r.data(0) & 0xff else 0
    MediaMeta(r.doc_id, len, first, (len % 640).toInt, ((first * 7) % 480).toInt, 3)
  }

  /** Partition-wise decode — the batch shape a real codec needs (amortized
    * per-partition init would go in the mapPartitions prologue).
    */
  def decode(ds: Dataset[MediaRecord]): Dataset[MediaMeta] =
    ds.mapPartitions(_.map(decodeStub))(Encoders.product[MediaMeta])

  /** Declared query: documents.text → binary payload → stub decode →
    * per-record metadata. Oracle mirrors the stub arithmetically
    * (strlen = byte length, ascii = first byte for this ASCII corpus).
    */
  private val multimodalDecode = Q(
    "q_multimodal_decode",
    (spark, dir) => {
      val recs = Tables(spark, dir, "documents")
        .select(col("doc_id"), lit("text").as("modality"),
          col("text").cast("binary").as("data"))
        .as[MediaRecord](Encoders.product[MediaRecord])
      decode(recs).toDF().orderBy(col("doc_id"))
    },
    Some("""SELECT doc_id, CAST(strlen(text) AS BIGINT) AS byte_len,
              CAST(ascii(substr(text, 1, 1)) AS INT) AS first_byte,
              CAST(strlen(text) % 640 AS INT) AS width,
              CAST((ascii(substr(text, 1, 1)) * 7) % 480 AS INT) AS height,
              CAST(3 AS INT) AS channels
            FROM documents ORDER BY doc_id"""))

  val all: Seq[Q] = Seq(multimodalDecode)
}
