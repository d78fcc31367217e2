package graft.multimodal

import java.nio.ByteBuffer

import scala.util.hashing.MurmurHash3

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns for training-data pipelines: image/audio/video
  * travel as opaque `binary` columns with typed metadata structs, and
  * decode / feature-extraction runs as batched per-partition
  * inference — the same execution shape as text embedding (U4:
  * per-partition init + bounded batches), because at 100 TB media
  * decode is "heavy fn, narrow map": no shuffle, document-per-task.
  *
  * CODEC SEAM: [[MediaCodec]] is the drop-in boundary with two
  * implementations. [[ImageIoCodec]] is a REAL still-image decoder
  * (`javax.imageio` PNG/JPEG/GIF/BMP — JDK built-in, no added
  * dependency): header-only dimension reads, luma-grid pixel
  * features, PNG frame re-encode. The deterministic [[FakeCodec]]
  * implements a tiny structured format ("GIMG" header + payload) for
  * the ORACLE-CHECKED queries, whose DuckDB side must recompute
  * header fields from first principles — so the Spark plumbing
  * (binary schema, header parse into struct metadata, batched feature
  * extraction, partition-shape invariance) is exercised by both a
  * production codec and a cross-engine-checkable one. Video/audio
  * containers (ffmpeg-class decoding) remain behind the same seam.
  */
object Multimodal {

  /** media(media_id long, kind string, content binary) + derived
    * meta(width int, height int, n_bytes long).
    */
  final case class MediaMeta(width: Int, height: Int, n_bytes: Long, valid: Boolean)

  trait MediaCodec extends Serializable {
    def decodeMeta(content: Array[Byte]): MediaMeta
    def features(content: Array[Byte], dim: Int): Array[Float]
    /** Number of frames in the media payload; 0 for invalid blobs. */
    def frameCount(content: Array[Byte]): Int
    /** Decoded bytes of frame `idx` (0-based; caller keeps idx < frameCount). */
    def frameAt(content: Array[Byte], idx: Int): Array[Byte]
    /** Re-encoded media scaled to (w, h); empty array for invalid
      * blobs (bad media is data, not an error).
      */
    def resize(content: Array[Byte], w: Int, h: Int): Array[Byte]
  }

  /** "GIMG" format: magic(4) | width(4, BE) | height(4, BE) | payload.
    * Feature extraction = seeded hashing of payload byte 4-grams into
    * `dim` signed buckets, L2-normalized — a deterministic stand-in
    * with the same output shape as a vision embedding model.
    */
  final case class FakeCodec(seed: Int = 42) extends MediaCodec {
    override def decodeMeta(content: Array[Byte]): MediaMeta =
      if (content == null || content.length < 12 ||
          !(content(0) == 'G' && content(1) == 'I' && content(2) == 'M' && content(3) == 'G'))
        MediaMeta(-1, -1, if (content == null) 0L else content.length.toLong, valid = false)
      else {
        val bb = ByteBuffer.wrap(content, 4, 8)
        MediaMeta(bb.getInt(), bb.getInt(), content.length.toLong, valid = true)
      }

    override def features(content: Array[Byte], dim: Int): Array[Float] = {
      val v = new Array[Float](dim)
      if (content != null && content.length > 12) {
        var i = 12
        while (i + 4 <= content.length) {
          val h = MurmurHash3.bytesHash(java.util.Arrays.copyOfRange(content, i, i + 4), seed)
          val b = math.floorMod(h, dim)
          v(b) += (if (((h >>> 31) & 1) == 0) 1.0f else -1.0f)
          i += 4
        }
      }
      val n = math.sqrt(v.foldLeft(0.0)((a, x) => a + x.toDouble * x)).toFloat
      if (n > 0) { var j = 0; while (j < dim) { v(j) /= n; j += 1 } }
      v
    }

    /** Frames = successive 64-byte payload slices (a stand-in "video"
      * framing with deterministic boundaries; the last frame may be
      * short).
      */
    val frameBytes = 64

    override def frameCount(content: Array[Byte]): Int =
      if (!decodeMeta(content).valid) 0
      else {
        val payload = content.length - 12
        (payload + frameBytes - 1) / frameBytes
      }

    override def frameAt(content: Array[Byte], idx: Int): Array[Byte] = {
      val from = 12 + idx * frameBytes
      java.util.Arrays.copyOfRange(content, from,
        math.min(from + frameBytes, content.length))
    }

    def encode(width: Int, height: Int, payload: Array[Byte]): Array[Byte] = {
      val bb = ByteBuffer.allocate(12 + payload.length)
      bb.put("GIMG".getBytes("ASCII")).putInt(width).putInt(height).put(payload)
      bb.array()
    }

    /** Stand-in downscale: payload prefix sized by the area ratio
      * under the new header — deterministic, meta-consistent
      * (decodeMeta(resize(...)) reports the target dims), smaller
      * output for smaller targets, like a real thumbnail.
      */
    override def resize(content: Array[Byte], w: Int, h: Int): Array[Byte] = {
      val m = decodeMeta(content)
      if (!m.valid || w <= 0 || h <= 0) Array.empty[Byte]
      else {
        val payload = java.util.Arrays.copyOfRange(content, 12, content.length)
        val oldArea = math.max(m.width.toLong * m.height, 1L)
        val newArea = w.toLong * h
        // upscale keeps everything — also dodges the len*newArea
        // Long overflow a huge target raster would hit
        val keep =
          if (newArea >= oldArea) payload.length
          else math.max(1L, payload.length.toLong * newArea / oldArea).toInt
        encode(w, h, java.util.Arrays.copyOfRange(payload, 0, keep))
      }
    }
  }

  /** Luma grid BY FORMULA — the q176 waveform precedent applied to
    * images: cell p of media id is `hashBits(id·64 + p, salt) mod
    * 2^20` (the repo's three-surface replayable hash; values < 2^24
    * so the Float cast is exact and every `<` gradient comparison
    * matches the oracle's BIGINT compare bit-for-bit). Content is
    * just the 8-byte big-endian id. Exists so the dHash +
    * pigeonhole-Hamming NEAR-DUP leg ([[ImageDedup]]) is
    * oracle-checkable end-to-end with no byte codec in the loop;
    * the production codecs stay spec-verified (ImageDedupSpec's
    * real-PNG pins).
    */
  final case class HashGridCodec(salt: Long = 202L) extends MediaCodec {
    private def idOf(content: Array[Byte]): Long =
      ByteBuffer.wrap(content).getLong

    override def decodeMeta(content: Array[Byte]): MediaMeta =
      if (content == null || content.length != 8)
        MediaMeta(-1, -1, if (content == null) 0L else content.length.toLong, valid = false)
      else MediaMeta(8, 8, 8L, valid = true)

    override def features(content: Array[Byte], dim: Int): Array[Float] = {
      require(dim <= 64, s"HashGridCodec is an 8x8 grid source, dim $dim > 64")
      if (!decodeMeta(content).valid) return new Array[Float](dim)
      val id = idOf(content)
      Array.tabulate(dim)(p =>
        (graft.operators.Sampling.hashBitsScalar(id * 64L + p, salt) % 1048576L).toFloat)
    }

    override def frameCount(content: Array[Byte]): Int =
      if (decodeMeta(content).valid) 1 else 0

    override def frameAt(content: Array[Byte], idx: Int): Array[Byte] = content

    override def resize(content: Array[Byte], w: Int, h: Int): Array[Byte] =
      if (decodeMeta(content).valid && w > 0 && h > 0) content
      else Array.empty[Byte]
  }

  /** Real still-image codec over `javax.imageio` (JDK built-in PNG/
    * JPEG/GIF/BMP readers — no added dependency): the production
    * implementation behind the same [[MediaCodec]] seam the
    * deterministic [[FakeCodec]] fills for oracle-checked queries.
    *
    *  - `decodeMeta` reads dimensions from the image HEADER
    *    (`ImageReader.getWidth/getHeight` — no pixel decode), the
    *    shape that matters when 100 TB of media flows through a
    *    metadata-only audit;
    *  - `features` decodes pixels once and pools mean luma
    *    (ITU-R BT.601 weights) over a ⌈√dim⌉ grid, L2-normalized —
    *    same output shape as FakeCodec and a vision embedding;
    *  - frames: a still image is a 1-frame stream, but multi-image
    *    containers (animated GIF) report their real frame count and
    *    re-encode the requested frame as PNG bytes.
    *
    * Undecodable/null blobs degrade exactly like FakeCodec's contract:
    * `valid=false` metadata, zero features, zero frames — bad media at
    * scale is data, not an error.
    */
  final case class ImageIoCodec() extends MediaCodec {
    import javax.imageio.ImageIO
    import ImageIoCodec.pngBytes

    /** Header-only reader access; None when no installed reader
      * recognizes the bytes.
      *
      * The input stream is a [[javax.imageio.stream.MemoryCacheImageInputStream]]
      * by construction — NEVER `ImageIO.createImageInputStream`, whose
      * JVM default (`getUseCache == true`) spools every already-in-memory
      * blob to a temp file in `java.io.tmpdir` before decoding. One
      * create/write/delete per image turns a CPU-bound narrow map into a
      * disk-IOPS-bound one on a 100 TB media corpus (and was the measured
      * root cause of the r14 q202 bench trip). [[ImageIoCodec.init]]
      * additionally flips the per-JVM default off so no indirect ImageIO
      * path regresses to the disk cache.
      */
    private def withReader[A](content: Array[Byte])(f: javax.imageio.ImageReader => A): Option[A] = {
      if (content == null || content.length == 0) return None
      ImageIoCodec.init
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(content))
      try {
        val readers = ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val r = readers.next()
          r.setInput(iis)
          try Some(f(r)) finally r.dispose()
        }
      } catch { case _: Exception => None } finally iis.close()
    }

    override def decodeMeta(content: Array[Byte]): MediaMeta =
      withReader(content)(r => MediaMeta(r.getWidth(0), r.getHeight(0),
          content.length.toLong, valid = true))
        .getOrElse(MediaMeta(-1, -1,
          if (content == null) 0L else content.length.toLong, valid = false))

    override def features(content: Array[Byte], dim: Int): Array[Float] = {
      val v = new Array[Float](dim)
      val img = withReader(content)(_.read(0)).orNull
      if (img != null) {
        val grid = math.ceil(math.sqrt(dim.toDouble)).toInt
        val (w, h) = (img.getWidth, img.getHeight)
        val sums = new Array[Double](dim)
        val counts = new Array[Long](dim)
        var y = 0
        while (y < h) {
          val gy = y * grid / h
          var x = 0
          while (x < w) {
            val cell = (gy * grid + x * grid / w) % dim
            val rgb = img.getRGB(x, y)
            val luma = 0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
              0.114 * (rgb & 0xff)
            sums(cell) += luma
            counts(cell) += 1
            x += 1
          }
          y += 1
        }
        var i = 0
        while (i < dim) {
          if (counts(i) > 0) v(i) = (sums(i) / counts(i) / 255.0).toFloat
          i += 1
        }
      }
      val n = math.sqrt(v.foldLeft(0.0)((a, x) => a + x.toDouble * x)).toFloat
      if (n > 0) { var j = 0; while (j < dim) { v(j) /= n; j += 1 } }
      v
    }

    override def frameCount(content: Array[Byte]): Int =
      withReader(content) { r =>
        try r.getNumImages(true) catch { case _: Exception => 1 }
      }.getOrElse(0)

    override def frameAt(content: Array[Byte], idx: Int): Array[Byte] =
      withReader(content)(r => pngBytes(r.read(idx)))
        .getOrElse(Array.empty[Byte])

    /** Real downscale/upscale: bilinear Graphics2D draw into the
      * target raster, re-encoded as PNG.
      */
    override def resize(content: Array[Byte], w: Int, h: Int): Array[Byte] =
      withReader(content) { r =>
        val src = r.read(0)
        val dst = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = dst.createGraphics()
        try {
          g.setRenderingHint(
            java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(src, 0, 0, w, h, null)
        } finally g.dispose()
        pngBytes(dst)
      }.getOrElse(Array.empty[Byte])
  }

  object ImageIoCodec {
    /** One-time per-JVM guard: disable ImageIO's disk-backed stream
      * cache so `createImageInputStream`/`createImageOutputStream`
      * anywhere on this executor return memory-cached streams. The
      * codec constructs memory streams directly regardless; this pins
      * the default for any indirect path (e.g. `ImageIO.read` in
      * future code).
      */
    lazy val init: Unit = javax.imageio.ImageIO.setUseCache(false)

    /** PNG-encode through an explicit in-memory ImageOutputStream —
      * the `ImageIO.write(img, fmt, OutputStream)` convenience overload
      * routes through `createImageOutputStream`, which under the JVM
      * default spools the encode to a temp file first.
      */
    private[multimodal] def pngBytes(img: java.awt.image.RenderedImage): Array[Byte] = {
      init
      val out = new java.io.ByteArrayOutputStream()
      val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(out)
      try javax.imageio.ImageIO.write(img, "png", ios) finally ios.close()
      out.toByteArray
    }
  }

  /** Parse binary headers into a typed metadata struct column.
    * Batched per-partition map — no shuffle; invalid blobs yield
    * `valid=false` rows, never task failures (bad media at scale is
    * data, not an error).
    */
  def withMeta(
      spark: SparkSession,
      media: DataFrame,
      codec: MediaCodec): DataFrame = {
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("kind"), col("content"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, kind, content) =>
          val m = codec.decodeMeta(content)
          (id, kind, content, m.width, m.height, m.n_bytes, m.valid)
        }
      }
      .toDF("media_id", "kind", "content", "width", "height", "n_bytes", "valid")
      .withColumn("meta", struct(col("width"), col("height"), col("n_bytes"), col("valid")))
      .drop("width", "height", "n_bytes", "valid")
  }

  /** Uniform frame sampling: each media row explodes into ≤
    * `maxFrames` rows (media_id, frame_idx, frame binary), indices
    * spread evenly across the stream (i·count/n — strictly
    * increasing, hits the first frame, never duplicates). Invalid
    * blobs yield zero rows, not failures. The row explosion is a
    * narrow flatMap — no shuffle; downstream per-frame feature
    * extraction then runs with frame-level parallelism after a
    * repartition, which is the point of sampling BEFORE decoding
    * whole videos at 100 TB.
    */
  def sampleFrames(
      spark: SparkSession,
      media: DataFrame,
      codec: MediaCodec,
      maxFrames: Int = 5): DataFrame = {
    import spark.implicits._
    require(maxFrames > 0)
    media.select(col("media_id").cast("long"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, content) =>
          val fc = codec.frameCount(content)
          val n = math.min(fc, maxFrames)
          (0 until n).iterator.map { i =>
            val idx = (i.toLong * fc / n).toInt
            (id, idx, codec.frameAt(content, idx))
          }
        }
      }
      .toDF("media_id", "frame_idx", "frame")
  }

  /** Batched thumbnailing — (media_id, resized binary). Narrow
    * mapPartitions (decode + scale + re-encode per row, no shuffle);
    * at 100 TB this runs resize BEFORE any frame/feature stage so
    * downstream work is proportional to thumbnail bytes, not source
    * bytes. Invalid blobs yield empty binaries, never failures.
    */
  def resizeAll(
      spark: SparkSession,
      media: DataFrame,
      codec: MediaCodec,
      w: Int,
      h: Int): DataFrame = {
    import spark.implicits._
    require(w > 0 && h > 0)
    media.select(col("media_id").cast("long"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(it => it.map { case (id, c) => (id, codec.resize(c, w, h)) })
      .toDF("media_id", "resized")
  }

  /** Batched media feature extraction — (media_id, features array).
    * Same mapPartitions + grouped(batch) shape as text embedding.
    */
  def extractFeatures(
      spark: SparkSession,
      media: DataFrame,
      codec: MediaCodec,
      dim: Int = 64,
      batchSize: Int = 32): DataFrame = {
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.map { case (id, content) => (id, codec.features(content, dim)) }
        }
      }
      .toDF("media_id", "features")
  }
}
