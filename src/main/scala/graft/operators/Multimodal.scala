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

/** Decoded image metadata: dimensions plus the bottom-right pixel's
  * channels — every field a pure function of the encoded payload, so
  * the decode path is oracle-checkable end-to-end. */
final case class ImageMeta(media_id: Long, byte_len: Int, width: Int,
                           height: Int, red: Int, green: Int, blue: Int)

/** Multimodal-column plumbing: image/audio/video as opaque binary
  * columns flowing through typed Datasets, with decode/feature-extract
  * running batch-wise in `mapPartitions`.
  *
  * IMAGE decode is REAL: the JDK ships PNG/BMP codecs in
  * `javax.imageio`, so `asImages` stages genuine PNG bytes into the
  * binary column and `decodeImages`/`decodeFeatures` decode them with
  * `ImageIO.read` — actual pixels, not pseudo-metadata. Audio/video
  * CODECS remain stubs (this JVM has no PCM/video codecs), but their
  * containers are real: `audioBytes`/`videoBytes` stage GAUD/GVID
  * binary containers whose headers and payload bytes the decode path
  * genuinely parses and reads; `fakeDecode` is only the fallback for
  * unrecognized payloads. The Spark-side plumbing — binary schema,
  * typed Encoder, partition-wise batching, feature vector shape — is
  * identical for all paths; a production deployment swaps the
  * synthetic codec for its demuxer call without touching the dataflow.
  */
object Multimodal {

  // ImageIO never needs a display for PNG encode/decode, but AWT can
  // still probe for one on some JVMs — pin headless before first use
  System.setProperty("java.awt.headless", "true")

  // ImageIO's default stream cache backs every non-file read/write
  // with a CREATE+DELETE of a temp file in java.io.tmpdir — per
  // image. Decoding a blob column then scales with tmp-dir latency
  // instead of CPU; the memory cache removes the file round-trip.
  // (Runs in the object initializer, so every executor JVM that
  // touches a Multimodal closure gets it before its first decode.)
  javax.imageio.ImageIO.setUseCache(false)

  // deterministic image geometry/color per id — pure functions, so the
  // DuckDB oracle can recompute what a correct decode must return
  def imgWidth(id: Long): Int = 8 + (id % 32).toInt
  def imgHeight(id: Long): Int = 8 + (id % 16).toInt
  def imgRed(id: Long): Int = (id % 256).toInt
  def imgGreen(id: Long): Int = (id * 7 % 256).toInt
  def imgBlue(id: Long): Int = (id * 13 % 256).toInt

  /** Real PNG encode of a solid-RGB image — `javax.imageio`, zero
    * extra dependencies. */
  def pngBytes(width: Int, height: Int, red: Int, green: Int,
               blue: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (red << 16) | (green << 8) | blue
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Documents as image media rows with REAL PNG payloads whose
    * geometry/color derive deterministically from doc_id. Map-only;
    * the per-row encode stands in for reading binary blobs off object
    * storage. */
  def asImages(documents: DataFrame)(implicit spark: SparkSession): Dataset[MediaRow] = {
    import spark.implicits._
    documents.select(col("doc_id"), col("source")).as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, src) =>
          MediaRow(id, "image",
            pngBytes(imgWidth(id), imgHeight(id), imgRed(id), imgGreen(id),
              imgBlue(id)), src)
        }
      }
  }

  /** REAL image decode: `ImageIO.read` per payload, one decoder
    * codepath per partition. Emits dimensions + the bottom-right
    * pixel — every column recomputable from media_id by the oracle. */
  def decodeImages(media: Dataset[MediaRow])
                  (implicit spark: SparkSession): Dataset[ImageMeta] = {
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(m.payload))
        require(img != null, s"undecodable image payload: media ${m.media_id}")
        val px = img.getRGB(img.getWidth - 1, img.getHeight - 1)
        ImageMeta(m.media_id, m.payload.length, img.getWidth, img.getHeight,
          (px >> 16) & 0xff, (px >> 8) & 0xff, px & 0xff)
      }
    }
  }

  // second deterministic color for the two-band pattern images
  def imgRed2(id: Long): Int = (id * 17 % 256).toInt
  def imgGreen2(id: Long): Int = (id * 23 % 256).toInt
  def imgBlue2(id: Long): Int = (id * 29 % 256).toInt

  /** Real PNG encode of a two-band image: the left `width/2` columns
    * are color A, the rest color B — structure a resample has to
    * actually average over. */
  def pngBytesPattern(width: Int, height: Int,
                      a: (Int, Int, Int), b: (Int, Int, Int)): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgbA = (a._1 << 16) | (a._2 << 8) | a._3
    val rgbB = (b._1 << 16) | (b._2 << 8) | b._3
    val half = width / 2
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        img.setRGB(x, y, if (x < half) rgbA else rgbB)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Documents as two-band pattern images (geometry and both colors
    * pure functions of doc_id — the oracle can recompute any resample
    * of them). */
  def asPatternImages(documents: DataFrame)
                     (implicit spark: SparkSession): Dataset[MediaRow] = {
    import spark.implicits._
    documents.select(col("doc_id"), col("source")).as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, src) =>
          MediaRow(id, "image",
            pngBytesPattern(imgWidth(id), imgHeight(id),
              (imgRed(id), imgGreen(id), imgBlue(id)),
              (imgRed2(id), imgGreen2(id), imgBlue2(id))), src)
        }
      }
  }

  /** Thumbnail probe: dims + three probe pixels of the 2× box-filter
    * downsample (top-left: pure A; the block at x_mid straddles or
    * nears the band boundary; top-right: pure B). */
  final case class ThumbMeta(media_id: Long, thumb_w: Int, thumb_h: Int,
                             tl_red: Int, tl_green: Int, tl_blue: Int,
                             mid_red: Int, mid_green: Int, mid_blue: Int,
                             tr_red: Int, tr_green: Int, tr_blue: Int)

  /** REAL image resize: decode the PNG, box-filter every 2×2 block
    * into a thumbnail (integer channel means, truncating — the
    * deterministic resample a data pipeline uses for thumbnailing),
    * and emit the thumbnail dims plus three probe pixels. The whole
    * thumbnail is materialized from DECODED pixels — nothing is
    * shortcut from the id — yet every output is a pure function of
    * media_id, so the oracle re-derives the resample arithmetic
    * exactly. Per-partition batching identical to [[decodeImages]]. */
  def resizeImages(media: Dataset[MediaRow])
                  (implicit spark: SparkSession): Dataset[ThumbMeta] = {
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(m.payload))
        require(img != null, s"undecodable image payload: media ${m.media_id}")
        val tw = img.getWidth / 2
        val th = img.getHeight / 2
        val thumb = Array.ofDim[Int](th, tw, 3)
        var y = 0
        while (y < th) {
          var x = 0
          while (x < tw) {
            var r = 0; var g = 0; var b = 0
            var dy = 0
            while (dy < 2) {
              var dx = 0
              while (dx < 2) {
                val px = img.getRGB(2 * x + dx, 2 * y + dy)
                r += (px >> 16) & 0xff; g += (px >> 8) & 0xff; b += px & 0xff
                dx += 1
              }
              dy += 1
            }
            thumb(y)(x) = Array(r / 4, g / 4, b / 4)
            x += 1
          }
          y += 1
        }
        val xMid = (img.getWidth / 2) / 2
        def px(x: Int) = thumb(0)(math.min(x, tw - 1))
        ThumbMeta(m.media_id, tw, th,
          px(0)(0), px(0)(1), px(0)(2),
          px(xMid)(0), px(xMid)(1), px(xMid)(2),
          px(tw - 1)(0), px(tw - 1)(1), px(tw - 1)(2))
      }
    }
  }

  /** Stage one PNG file per document under `dir` (media_<id>.png) —
    * the object-storage layout a real media corpus lands in. Written
    * per-partition from the executors, not a driver loop.
    *
    * IDEMPOTENT: staging is skipped when the directory already holds
    * exactly the expected drop, checked against the corpus's
    * (count, min id, max id) — three aggregates the scan computes from
    * parquet statistics, so re-validation stays cheap at any corpus
    * size. Any mismatch (shrunk corpus, partial prior write, foreign
    * files) clears the directory and re-stages from scratch — and a
    * FAILED delete must fail loudly, not silently re-ingest stale
    * media_<id>.png files as phantom rows. */
  def stageImageFiles(documents: DataFrame, dir: String)
                     (implicit spark: SparkSession): Unit = {
    import spark.implicits._
    val d = new java.io.File(dir)
    val row = documents.agg(count(col("doc_id")), min(col("doc_id")),
      max(col("doc_id")), sum(col("doc_id"))).head()
    val (n, lo, hi, idSum) =
      (row.getLong(0),
        if (row.isNullAt(1)) 0L else row.getLong(1),
        if (row.isNullAt(2)) 0L else row.getLong(2),
        if (row.isNullAt(3)) 0L else row.getLong(3))
    if (d.exists) {
      val names = Option(d.list()).getOrElse(Array.empty[String])
      val ids = names.collect {
        case s if s.matches("media_\\d+\\.png") =>
          s.stripPrefix("media_").stripSuffix(".png").toLong
      }
      if (n > 0 && ids.length == n && names.length == n &&
          ids.min == lo && ids.max == hi && ids.sum == idSum) return
      org.apache.commons.io.FileUtils.deleteQuietly(d)
      require(!d.exists, s"could not clear stale staging dir $dir")
    }
    d.mkdirs()
    documents.select(col("doc_id")).as[Long].foreachPartition {
      (it: Iterator[Long]) =>
        it.foreach { id =>
          val bytes = pngBytes(imgWidth(id), imgHeight(id), imgRed(id),
            imgGreen(id), imgBlue(id))
          java.nio.file.Files.write(
            java.nio.file.Paths.get(dir, s"media_$id.png"), bytes)
        }
    }
  }

  /** Stage the two-band PATTERN PNGs one-per-doc on storage — the
    * file-shaped twin of [[asPatternImages]], feeding the STREAMING
    * media front end (same idempotence contract as
    * [[stageImageFiles]]: a complete prior staging is reused). */
  def stagePatternImageFiles(documents: DataFrame, dir: String)
                            (implicit spark: SparkSession): Unit = {
    import spark.implicits._
    val d = new java.io.File(dir)
    val row = documents.agg(count(col("doc_id")), min(col("doc_id")),
      max(col("doc_id")), sum(col("doc_id"))).head()
    val (n, lo, hi, idSum) =
      (row.getLong(0),
        if (row.isNullAt(1)) 0L else row.getLong(1),
        if (row.isNullAt(2)) 0L else row.getLong(2),
        if (row.isNullAt(3)) 0L else row.getLong(3))
    if (d.exists) {
      val names = Option(d.list()).getOrElse(Array.empty[String])
      val ids = names.collect {
        case s if s.matches("pmedia_\\d+\\.png") =>
          s.stripPrefix("pmedia_").stripSuffix(".png").toLong
      }
      if (n > 0 && ids.length == n && names.length == n &&
          ids.min == lo && ids.max == hi && ids.sum == idSum) return
      org.apache.commons.io.FileUtils.deleteQuietly(d)
      require(!d.exists, s"could not clear stale staging dir $dir")
    }
    d.mkdirs()
    documents.select(col("doc_id")).as[Long].foreachPartition {
      (it: Iterator[Long]) =>
        it.foreach { id =>
          val bytes = pngBytesPattern(imgWidth(id), imgHeight(id),
            (imgRed(id), imgGreen(id), imgBlue(id)),
            (imgRed2(id), imgGreen2(id), imgBlue2(id)))
          java.nio.file.Files.write(
            java.nio.file.Paths.get(dir, s"pmedia_$id.png"), bytes)
        }
    }
  }

  /** Media ingestion through Spark's `binaryFile` source: blobs land
    * as (path, length, content) rows, the id parses off the file
    * name, and the payload flows into the SAME decode path the
    * synthetic frames use — the true front half of a 100 TB media
    * pipeline (splittable listing, lazy content read, column-pruned
    * when only metadata is selected). */
  def ingestImages(dir: String)
                  (implicit spark: SparkSession): Dataset[MediaRow] = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.png").load(dir)
      .select(
        regexp_extract(col("path"), "media_(\\d+)\\.png$", 1)
          .cast("long").as("media_id"),
        lit("image").as("kind"),
        col("content").as("payload"),
        lit("binary_file").as("source"))
      .as[MediaRow]
  }

  // ---------- video frame sampling (stub container, real plumbing) ----------

  /** Deterministic stub-video geometry per id — pure functions, so the
    * oracle recomputes what a correct parse+sample must return. */
  def vidFrames(id: Long): Int = 4 + (id % 12).toInt
  def vidW(id: Long): Int = 4 + (id % 8).toInt
  def vidH(id: Long): Int = 4 + (id % 4).toInt

  /** Stub raw-video container (no video codecs in this JVM — the
    * BYTES are real, the codec is the stand-in): "GVID" magic,
    * int32-BE frame count / width / height, then `n_frames` raw
    * grayscale frames of `w·h` bytes; frame f's pixel i is
    * `(id·31 + f·7 + i) mod 256`. A production deployment swaps this
    * parser for its demuxer call without touching the dataflow. */
  def videoBytes(id: Long): Array[Byte] = {
    val nf = vidFrames(id); val w = vidW(id); val h = vidH(id)
    val buf = java.nio.ByteBuffer.allocate(16 + nf * w * h)
    buf.put("GVID".getBytes("US-ASCII"))
    buf.putInt(nf).putInt(w).putInt(h)
    var f = 0
    while (f < nf) {
      var i = 0
      while (i < w * h) {
        buf.put(((id * 31 + f * 7 + i) % 256).toByte)
        i += 1
      }
      f += 1
    }
    buf.array()
  }

  /** Documents as stub-video media rows. Map-only. */
  def asVideos(documents: DataFrame)(implicit spark: SparkSession): Dataset[MediaRow] = {
    import spark.implicits._
    documents.select(col("doc_id"), col("source")).as[(Long, String)]
      .mapPartitions(it => it.map { case (id, src) =>
        MediaRow(id, "video", videoBytes(id), src)
      })
  }

  /** One sampled video frame: index, a 25 fps timestamp, the frame's
    * first byte and its integer byte sum — all pure functions of
    * (media_id, frame_idx), so sampling is oracle-checkable. */
  final case class FrameSample(media_id: Long, n_frames: Int,
                               frame_idx: Int, ts_ms: Long,
                               first_byte: Int, sum_bytes: Long)

  /** REAL container parse + stride frame sampling: read the header
    * off the binary payload, slice every `stride`-th frame at its
    * computed offset, and emit per-frame stats from the ACTUAL bytes
    * (nothing shortcut from the id). The frame-sample step of the
    * decode / feature-extract / resize / frame-sample family —
    * map-only over opaque binary columns, so it runs at scan speed
    * and the sampled-frame output (1/stride of the payload bytes) is
    * what downstream embedding stages read. */
  def sampleVideoFrames(media: Dataset[MediaRow], stride: Int = 2)
                  (implicit spark: SparkSession): Dataset[FrameSample] = {
    import spark.implicits._
    require(stride >= 1, "stride must be >= 1")
    media.mapPartitions { it =>
      it.flatMap { m =>
        val buf = java.nio.ByteBuffer.wrap(m.payload)
        val magic = new Array[Byte](4)
        buf.get(magic)
        require(new String(magic, "US-ASCII") == "GVID",
          s"not a GVID payload: media ${m.media_id}")
        val nf = buf.getInt; val w = buf.getInt; val h = buf.getInt
        val frameLen = w * h
        (0 until nf by stride).iterator.map { f =>
          val off = 16 + f * frameLen
          var sum = 0L
          var i = 0
          while (i < frameLen) {
            sum += m.payload(off + i) & 0xff
            i += 1
          }
          FrameSample(m.media_id, nf, f, f * 40L,
            m.payload(off) & 0xff, sum)
        }
      }
    }
  }

  // deterministic audio geometry per id — like the image/video helpers,
  // pure functions the oracle recomputes
  def audSamples(id: Long): Int = 100 + (id % 400).toInt

  /** Stub PCM container ("GAUD"): 4-byte magic, int32-BE sample rate,
    * int32-BE sample count, then `n` 8-bit samples with sample i =
    * `(id·37 + i·11) mod 256`. Same contract as [[videoBytes]]: the
    * bytes, header parse and offset math are real; only the codec is
    * synthetic. A production deployment swaps this for its PCM/OGG
    * demuxer without touching the dataflow. */
  def audioBytes(id: Long): Array[Byte] = {
    val n = audSamples(id)
    val buf = java.nio.ByteBuffer.allocate(12 + n)
    buf.put("GAUD".getBytes("US-ASCII"))
    buf.putInt(8000).putInt(n)
    var i = 0
    while (i < n) { buf.put(((id * 37 + i * 11) % 256).toByte); i += 1 }
    buf.array()
  }

  /** Wrap documents as MIXED media rows, kind cycling image/audio/video
    * by id: each row carries a REAL container for its kind — encoded
    * PNG bytes, a GAUD audio container, or a GVID video container — so
    * the mixed-kind dispatch downstream exercises a genuine per-kind
    * header parse, not a text-bytes placeholder. Map-only. */
  def asMedia(documents: DataFrame)(implicit spark: SparkSession): Dataset[MediaRow] = {
    import spark.implicits._
    documents.select(col("doc_id"), col("source")).as[(Long, String)]
      .mapPartitions(it => it.map { case (id, src) =>
        (id % 3) match {
          case 0 => MediaRow(id, "image",
            pngBytes(imgWidth(id), imgHeight(id), imgRed(id), imgGreen(id),
              imgBlue(id)), src)
          case 1 => MediaRow(id, "audio", audioBytes(id), src)
          case _ => MediaRow(id, "video", videoBytes(id), src)
        }
      })
  }

  /** STUB decoder for the codec-less kinds (audio/video, or image
    * payloads that aren't decodable bytes): deterministic pseudo
    * metadata/features from the payload. Production: replace body
    * with the real codec (PCM frames, video keyframe sampling). */
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

  /** Per-kind dispatch: REAL `ImageIO` decode for decodable image
    * payloads; REAL header parse + byte reads for GAUD/GVID container
    * payloads (only the codec inside is synthetic); stub features for
    * anything unrecognized. Every emitted field is a pure function of
    * the payload bytes, so the mixed path is oracle-checkable. */
  private[operators] def decodeAny(m: MediaRow): MediaFeatures = {
    def magicIs(tag: String): Boolean =
      m.payload.length >= 12 &&
        new String(m.payload, 0, 4, "US-ASCII") == tag
    m.kind match {
      case "image" =>
        val img =
          try javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(m.payload))
          catch { case _: Exception => null }
        if (img == null) fakeDecode(m)
        else {
          val px = img.getRGB(img.getWidth - 1, img.getHeight - 1)
          val feat = Array(
            ((px >> 16) & 0xff) / 255.0f, ((px >> 8) & 0xff) / 255.0f,
            (px & 0xff) / 255.0f, img.getWidth / 4096.0f,
            img.getHeight / 4096.0f, 1.0f, 0.0f, 0.0f)
          MediaFeatures(m.media_id, m.kind, m.payload.length, img.getWidth,
            img.getHeight, 1, feat)
        }
      case "audio" if magicIs("GAUD") =>
        val buf = java.nio.ByteBuffer.wrap(m.payload, 4, 8)
        buf.getInt // sample rate (fixed 8 kHz in the stub container)
        val n = buf.getInt
        // feature = the first 8 ACTUAL samples, normalized
        val feat = Array.tabulate(8)(j =>
          (m.payload(12 + (j % n)) & 0xff) / 255.0f)
        MediaFeatures(m.media_id, m.kind, m.payload.length, 0, 0, n, feat)
      case "video" if magicIs("GVID") =>
        val buf = java.nio.ByteBuffer.wrap(m.payload, 4, 12)
        val nf = buf.getInt; val w = buf.getInt; val h = buf.getInt
        // feature = the first 8 ACTUAL pixels of frame 0, normalized
        val frameLen = w * h
        val feat = Array.tabulate(8)(j =>
          (m.payload(16 + (j % frameLen)) & 0xff) / 255.0f)
        MediaFeatures(m.media_id, m.kind, m.payload.length, w, h, nf, feat)
      case _ => fakeDecode(m)
    }
  }

  /** Batch decode: one decoder instance per partition (the expensive
    * codec init happens once per partition, not per row — the shape a
    * real decoder needs). Map-only, no shuffle. Image payloads decode
    * for real; audio/video fall through to the stub. */
  def decodeFeatures(media: Dataset[MediaRow])
                    (implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { it =>
      // per-partition decoder setup for the stubbed kinds would go here
      it.map(decodeAny)
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

  /** 8×8 average-hash over REAL decoded pixels: luminance = r+g+b
    * (integer, no weights → no division), each grid cell's luminance
    * SUM compared against the global sum by cross-multiplication
    * (`cellSum·64 > totalSum` — all integer, no mean rounding), one
    * bit per cell, packed row-major into 16 hex chars. The classic
    * perceptual near-dup signature (aHash), here bit-exact and
    * engine-portable because every comparison is integer. */
  final case class ImageHash(media_id: Long, width: Int, height: Int,
                             ahash: String)

  /** Decode each image payload with ImageIO and compute its aHash
    * from the actual pixel buffer. Map-only, one decoder codepath
    * per partition. */
  def imageAHash(media: Dataset[MediaRow])
                (implicit spark: SparkSession): Dataset[ImageHash] = {
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(m.payload))
        require(img != null, s"undecodable image payload: media ${m.media_id}")
        val (w, h) = (img.getWidth, img.getHeight)
        var total = 0L
        val cell = Array.ofDim[Long](8, 8)
        var y = 0
        while (y < h) {
          val cy = y * 8 / h
          var x = 0
          while (x < w) {
            val px = img.getRGB(x, y)
            val lum = (((px >> 16) & 0xff) + ((px >> 8) & 0xff) +
              (px & 0xff)).toLong
            cell(cy)(x * 8 / w) += lum
            total += lum
            x += 1
          }
          y += 1
        }
        val sb = new StringBuilder(16)
        var cy = 0
        while (cy < 8) {
          var byte = 0
          var cx = 0
          while (cx < 8) {
            if (cell(cy)(cx) * 64 > total) byte |= 1 << cx
            cx += 1
          }
          sb.append(f"$byte%02x")
          cy += 1
        }
        ImageHash(m.media_id, w, h, sb.toString)
      }
    }
  }

  /** Perceptual image dedup RIDING THE REAL DECODE: two-band PNGs
    * decode per partition, aHash from actual pixels, exact-signature
    * groups with keep = min media_id. The cell mapping `x·8/w` floors
    * like the oracle's integer division, so every bit is closed-form
    * recomputable from (media_id → geometry/colors). One shuffle on
    * the 16-char signature; the decode is map-only. */
  def imagePhashDedup(documents: DataFrame)
                     (implicit spark: SparkSession): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("ahash"))
    imageAHash(asPatternImages(documents)).toDF()
      .withColumn("canonical_id", min(col("media_id")).over(w))
      .withColumn("group_size", count(lit(1)).over(w))
      .withColumn("is_canonical", col("media_id") === col("canonical_id"))
  }

  /** Windowed per-media audio features off the REAL container bytes:
    * parse the GAUD header, read the 8-bit samples, aggregate fixed
    * 50-sample windows to (count, sum, min, max) — the
    * feature-extract step of the audio path, exact-integer so the
    * closed-form sample function is the oracle. Map-only + explode;
    * a production system swaps the synthetic codec for its PCM
    * demuxer without touching the window shape. */
  final case class AudioWindow(media_id: Long, window_idx: Int,
                               n_samples: Long, sum_amp: Long,
                               min_amp: Long, max_amp: Long)

  def audioFeatures(media: Dataset[MediaRow], windowSize: Int = 50)
                   (implicit spark: SparkSession): Dataset[AudioWindow] = {
    import spark.implicits._
    media.filter(_.kind == "audio").mapPartitions { it =>
      it.flatMap { m =>
        val buf = java.nio.ByteBuffer.wrap(m.payload)
        val magic = new Array[Byte](4)
        buf.get(magic)
        require(new String(magic, "US-ASCII") == "GAUD",
          s"not a GAUD container: media ${m.media_id}")
        buf.getInt() // sample rate
        val n = buf.getInt()
        (0 until n).map { i =>
          (i / windowSize, (buf.get(12 + i) & 0xff).toLong)
        }.groupBy(_._1).toSeq.sortBy(_._1).map { case (wi, xs) =>
          val amps = xs.map(_._2)
          AudioWindow(m.media_id, wi, amps.length.toLong, amps.sum,
            amps.min, amps.max)
        }
      }
    }
  }

  /** Documents as audio media rows with real GAUD containers. */
  def asAudio(documents: DataFrame)(implicit spark: SparkSession): Dataset[MediaRow] = {
    import spark.implicits._
    documents.select(col("doc_id"), col("source")).as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, src) =>
          MediaRow(id, "audio", audioBytes(id), src)
        }
      }
  }
}
