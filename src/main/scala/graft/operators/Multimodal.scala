package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** A media object: opaque `binary` payload + typed metadata. */
final case class MediaRow(media_id: Long, kind: String,
                          payload: Array[Byte], source: String)

/** Extracted features per media object. `feature` is a fixed-width
  * embedding-like vector. */
final case class MediaFeatures(media_id: Long, kind: String,
                               byte_len: Int, width: Int, height: Int,
                               n_frames: Int, feature: Array[Float])

/** Multimodal-column plumbing: image/audio/video as opaque binary
  * columns flowing through typed Datasets, with decode/feature-extract
  * running batch-wise in `mapPartitions`.
  *
  * The DECODE STEP IS A STUB (this container has no image/audio
  * codecs): `fakeDecode` derives deterministic pseudo-metadata from
  * the bytes. The Spark-side plumbing — binary schema, typed Encoder,
  * partition-wise batching, feature vector shape — is real and
  * tested; a production deployment swaps `fakeDecode` for a codec
  * call without touching the dataflow.
  */
object Multimodal {

  /** Wrap documents as media rows: payload = utf-8 bytes, kind cycles
    * image/audio/video by id (synthetic corpus has no real media). */
  def asMedia(documents: DataFrame)(implicit spark: SparkSession): Dataset[MediaRow] = {
    import spark.implicits._
    documents.select(
      col("doc_id").as("media_id"),
      element_at(typedLit(Seq("image", "audio", "video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("payload"),
      col("source")).as[MediaRow]
  }

  /** STUB decoder: deterministic pseudo metadata/features from bytes.
    * Production: replace body with the real codec (JPEG/PNG decode,
    * PCM frames, video keyframe sampling). */
  private[operators] def fakeDecode(m: MediaRow): MediaFeatures = {
    val n = m.payload.length
    // cheap rolling hash of the payload → stable pseudo-randomness
    var h = 1125899906842597L
    var i = 0
    while (i < n) { h = 31 * h + (m.payload(i) & 0xff); i += 1 }
    def pick(lo: Int, hi: Int, salt: Int): Int =
      lo + (((h >>> salt) & 0x7fffffff) % (hi - lo)).toInt
    val (w, ht, fr) = m.kind match {
      case "image" => (pick(64, 4096, 3), pick(64, 4096, 7), 1)
      case "audio" => (0, 0, pick(1000, 100000, 11))
      case _       => (pick(320, 1920, 5), pick(240, 1080, 9), pick(24, 2400, 13))
    }
    val feat = Array.tabulate(8)(j =>
      (((h >>> (j * 7)) & 0xffff).toFloat / 65535.0f))
    MediaFeatures(m.media_id, m.kind, n, w, ht, fr, feat)
  }

  /** Batch decode: one decoder instance per partition (the expensive
    * codec init happens once per partition, not per row — the shape a
    * real decoder needs). Map-only, no shuffle. */
  def decodeFeatures(media: Dataset[MediaRow])
                    (implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { it =>
      // per-partition decoder setup would go here
      it.map(fakeDecode)
    }
  }

  /** Frame sampling for video-kind media: every k-th frame index up
    * to n_frames (plumbing for a real frame extractor). */
  def sampleFrames(features: Dataset[MediaFeatures], everyK: Int = 100)
                  (implicit spark: SparkSession): DataFrame =
    features.toDF()
      .filter(col("kind") === "video")
      .select(col("media_id"),
        explode(sequence(lit(0), col("n_frames") - 1,
          lit(everyK))).as("frame_idx"))
}
