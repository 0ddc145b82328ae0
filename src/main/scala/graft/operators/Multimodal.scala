package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Op
import graft.sources.Tables

/** §2.3 multimodal column plumbing: media as opaque `binary` payloads
  * with typed metadata, decoded/feature-extracted in batched
  * per-partition passes.
  *
  * The container has no image/audio codecs, so [[decodeStub]] is a
  * clearly-marked STUB producing deterministic fake features — but
  * the Spark-side plumbing is real and what matters at scale: a
  * `binary` payload column rides alongside typed metadata in the same
  * row (100 TB of payload bytes never shuffle unless a join demands
  * it), and decode runs via `mapPartitions` over fixed-size batches —
  * the exact shape a real codec/model UDF needs (amortize model init
  * per partition, bound peak memory per batch).
  */
object Multimodal {

  /** One media row: payload + typed metadata. */
  final case class MediaRow(doc_id: Long, mime: String, width: Int,
                            height: Int, payload: Array[Byte])

  /** Extracted features (decode output). */
  final case class MediaFeatures(doc_id: Long, mime: String, n_bytes: Long,
                                 batch_size: Int, feat_mean: Double, feat_hash: Long)

  /** Synthesize the media table from `documents`: payload = utf8 bytes
    * of the text (stand-in for image/video bytes), metadata derived
    * deterministically; every 5th doc is "video", the rest images. */
  def mediaTable(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents").select(
      col("doc_id"),
      when(col("doc_id") % 5 === 0, "video/mp4")
        .when(col("doc_id") % 2 === 0, "image/png")
        .otherwise("image/jpeg").as("mime"),
      (col("n_chars") % 640 + 1).cast("int").as("width"),
      (col("n_chars") % 480 + 1).cast("int").as("height"),
      col("text").cast("binary").as("payload"))

  val DecodeBatchSize = 64

  /** STUB decode / feature-extract: a real implementation would hand
    * each batch of payloads to a codec or model (e.g. via ONNX / a
    * Pandas-UDF-style vectorized call). Here the "features" are
    * deterministic functions of the bytes so specs can assert the
    * batching plumbing end-to-end. */
  def decodeStub(media: DataFrame): DataFrame = {
    import media.sparkSession.implicits._
    media.select("doc_id", "mime", "width", "height", "payload").as[MediaRow]
      .mapPartitions { rows =>
        rows.grouped(DecodeBatchSize).flatMap { batch =>
          // STUB: stands in for `model.decode(batch.map(_.payload))`
          batch.map { r =>
            val bytes = r.payload
            val mean = if (bytes.isEmpty) 0.0
              else bytes.map(_.toInt & 0xff).sum.toDouble / bytes.length
            MediaFeatures(r.doc_id, r.mime, bytes.length.toLong,
              batch.size, math.rint(mean * 10000) / 10000, bytes.foldLeft(1125899906842597L)(
                (h, b) => h * 31 + (b.toInt & 0xff)))
          }
        }
      }.toDF()
  }

  /** STUB resize: 1→1 metadata rewrite + payload passthrough (a real
    * implementation re-encodes the payload per batch). The plumbing
    * point: payload bytes stay in-row — no shuffle, no driver
    * round-trip — and the transform composes with [[decodeStub]]. */
  def resizeStub(media: DataFrame, w: Int, h: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.select("doc_id", "mime", "width", "height", "payload").as[MediaRow]
      .mapPartitions(_.map(r => r.copy(width = w, height = h)))
      .toDF()
  }

  /** One sampled frame of a video payload. */
  final case class Frame(doc_id: Long, frame_no: Int, n_frames: Int,
                         frame_bytes: Long, frame_hash: Long)

  /** STUB frame-sampling: the 1→N flatMap plumbing shape a video
    * pipeline needs (each video row fans out to up to `maxFrames`
    * frame rows; images fan out to zero). A real implementation
    * decodes keyframes per batch; the deterministic fake slices the
    * payload so specs can assert fan-out and content lineage. */
  def frameSampleStub(media: DataFrame, maxFrames: Int = 4): DataFrame = {
    import media.sparkSession.implicits._
    media.select("doc_id", "mime", "width", "height", "payload").as[MediaRow]
      .mapPartitions { rows =>
        rows.filter(_.mime.startsWith("video/")).flatMap { r =>
          val n = math.min(maxFrames, math.max(1, r.payload.length / 64))
          (0 until n).iterator.map { i =>
            val slice = r.payload.slice(i * 64, i * 64 + 64)
            Frame(r.doc_id, i, n, slice.length.toLong,
              slice.foldLeft(1125899906842597L)((h, b) => h * 31 + (b.toInt & 0xff)))
          }
        }
      }.toDF()
  }

  val mmMetadata: Op = Op.rowsOnly("mm_metadata") { (s, dir) =>
    decodeStub(mediaTable(s, dir)).orderBy("doc_id")
  }

  val mmFrameSample: Op = Op.rowsOnly("mm_frame_sample") { (s, dir) =>
    frameSampleStub(mediaTable(s, dir)).orderBy("doc_id", "frame_no")
  }

  /** The resize path's observable contract IS oracle-expressible:
    * metadata rewritten to the target box, payload bytes passed
    * through unmodified (checked via byte length — the stub never
    * re-encodes). */
  val mmResize: Op = Op.sql("mm_resize",
    """SELECT doc_id,
      |  CASE WHEN doc_id % 5 = 0 THEN 'video/mp4'
      |       WHEN doc_id % 2 = 0 THEN 'image/png'
      |       ELSE 'image/jpeg' END AS mime,
      |  CAST(64 AS INTEGER) AS width, CAST(64 AS INTEGER) AS height,
      |  octet_length(encode(text)) AS n_bytes
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    resizeStub(mediaTable(s, dir), 64, 64)
      .select(col("doc_id"), col("mime"), col("width"), col("height"),
        length(col("payload")).cast("bigint").as("n_bytes"))
      .orderBy("doc_id")
  }

  val all: Seq[Op] = Seq(mmMetadata, mmFrameSample, mmResize)
}
