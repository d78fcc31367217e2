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
  * CODEC SEAM: real decoders (libjpeg/ffmpeg/…) are not available in
  * this environment. [[MediaCodec]] is the drop-in boundary; the
  * deterministic [[FakeCodec]] implements a tiny structured format
  * ("GIMG" header + payload) so every piece of Spark plumbing —
  * binary schema, header parsing into struct metadata, batched
  * feature extraction, partition-shape invariance — is real and
  * tested even though the codec itself is a stand-in.
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
