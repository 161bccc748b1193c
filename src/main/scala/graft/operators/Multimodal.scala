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

/** Full pipeline output: decode → resize → feature-extract → frame-sample. */
final case class MediaPipelineOut(doc_id: Long, byte_sum: Long, brightness: Double,
    rw: Int, rh: Int, n_frames: Int, frames: String)

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

  /** STUB resize: fixed 64-wide, aspect-preserving integer height. */
  def resizeStub(m: MediaMeta): (Int, Int) =
    (64, (m.height * 64) / math.max(m.width, 1))

  /** STUB feature extraction: byte-sum "histogram mass" and mean
    * brightness — a real pipeline would run the image model here.
    */
  def featureStub(r: MediaRecord): (Long, Double) = {
    var s = 0L
    var i = 0
    while (i < r.data.length) { s += (r.data(i) & 0xff); i += 1 }
    val bright =
      if (r.data.isEmpty) 0.0
      else math.floor((s.toDouble / r.data.length) * 10000 + 0.5) / 10000
    (s, bright)
  }

  /** STUB frame sampling: every 5th frame of a fake n_frames clip. */
  def frameSampleStub(m: MediaMeta): (Int, String) = {
    val n = (m.byte_len % 30 + 1).toInt
    (n, (0 until n by 5).mkString(","))
  }

  /** The full chained pipeline over typed records — decode, resize,
    * feature-extract and frame-sample in one partition pass (one codec
    * init per partition in a real deployment).
    */
  def pipeline(ds: Dataset[MediaRecord]): Dataset[MediaPipelineOut] =
    ds.mapPartitions(_.map { r =>
      val meta = decodeStub(r)
      val (rw, rh) = resizeStub(meta)
      val (byteSum, brightness) = featureStub(r)
      val (nFrames, frames) = frameSampleStub(meta)
      MediaPipelineOut(r.doc_id, byteSum, brightness, rw, rh, nFrames, frames)
    })(Encoders.product[MediaPipelineOut])

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
              CAST(CASE WHEN strlen(text) = 0 THEN 0
                        ELSE ascii(substr(text, 1, 1)) END AS INT) AS first_byte,
              CAST(strlen(text) % 640 AS INT) AS width,
              CAST((CASE WHEN strlen(text) = 0 THEN 0
                          ELSE ascii(substr(text, 1, 1)) END * 7) % 480 AS INT) AS height,
              CAST(3 AS INT) AS channels
            FROM documents ORDER BY doc_id"""))

  /** Declared query: the full multimodal pipeline (decode → resize →
    * features → frame-sample) over text-derived payloads. Oracle mirrors
    * the stub arithmetic (ASCII corpus: byte == codepoint).
    */
  private val multimodalPipeline = Q(
    "q_multimodal_pipeline",
    (spark, dir) => {
      val recs = Tables(spark, dir, "documents")
        .select(col("doc_id"), lit("image").as("modality"),
          col("text").cast("binary").as("data"))
        .as[MediaRecord](Encoders.product[MediaRecord])
      pipeline(recs).toDF().orderBy(col("doc_id"))
    },
    Some("""WITH m AS (SELECT doc_id,
                  strlen(text) AS len,
                  CASE WHEN strlen(text) = 0 THEN 0
                       ELSE ascii(substr(text, 1, 1)) END AS first_byte,
                  COALESCE(list_sum([ascii(substr(text, i, 1))
                    for i in generate_series(1, CAST(strlen(text) AS INT))]), 0) AS bsum
                FROM documents),
            d AS (SELECT doc_id, len, bsum,
                  CAST(len % 640 AS INT) AS width,
                  CAST((first_byte * 7) % 480 AS INT) AS height,
                  CAST(len % 30 + 1 AS INT) AS n_frames
                FROM m)
            SELECT doc_id, CAST(bsum AS BIGINT) AS byte_sum,
              CASE WHEN len = 0 THEN 0.0
                   ELSE FLOOR((CAST(bsum AS DOUBLE) / len) * 10000 + 0.5) / 10000 END AS brightness,
              CAST(64 AS INT) AS rw,
              CAST((height * 64) // GREATEST(width, 1) AS INT) AS rh,
              n_frames,
              array_to_string(range(0, n_frames, 5), ',') AS frames
            FROM d ORDER BY doc_id"""))

  val all: Seq[Q] = Seq(multimodalDecode, multimodalPipeline)
}
