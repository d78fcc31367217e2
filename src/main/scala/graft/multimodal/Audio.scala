package graft.multimodal

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Audio feature extraction over binary PCM columns — the audio leg
  * of the multimodal layer (SURVEY §2.12): opaque `binary` content +
  * typed features, exactly the shape a speech-data curation pipeline
  * needs (silence trimming, energy/ZCR voice-activity features)
  * before expensive ASR inference.
  *
  * The container has no audio codecs (the q147 image situation), so
  * the DECODE boundary is s16le PCM — a REAL codec ([[PcmCodec]]:
  * little-endian int16, the WAV payload format), not a fake; what's
  * stubbed out is only compressed-container parsing. Features are
  * pure integer arithmetic on samples:
  *   energy(frame) = Σ s², zcr(frame) = #{t : s_{t−1}·s_t < 0},
  *   silent = energy < [[EnergyFloor]]
  * so a DuckDB oracle reproduces them exactly from the same samples
  * (q176 regenerates its fixture waveform BY FORMULA in both
  * engines; the byte round-trip itself is spec-pinned).
  *
  * Scale shape: decode + framing is a narrow per-row flatMap
  * (mapPartitions tier — the documented media-decode seam, like
  * [[Multimodal.extractFeatures]]); one output row per frame,
  * never whole-clip state across rows.
  */
object Audio {

  /** Frames with Σs² below this are silence (s16 square units). */
  val EnergyFloor = 10000L

  /** s16le PCM codec — bytes ↔ samples, exact round-trip. */
  object PcmCodec {
    def encode(samples: Array[Int]): Array[Byte] = {
      val out = new Array[Byte](samples.length * 2)
      var i = 0
      while (i < samples.length) {
        val s = samples(i)
        require(s >= Short.MinValue && s <= Short.MaxValue, s"not s16: $s")
        out(2 * i) = (s & 0xff).toByte
        out(2 * i + 1) = ((s >> 8) & 0xff).toByte
        i += 1
      }
      out
    }

    def decode(bytes: Array[Byte]): Array[Int] = {
      require(bytes.length % 2 == 0, "odd s16le payload")
      val out = new Array[Int](bytes.length / 2)
      var i = 0
      while (i < out.length) {
        out(i) = ((bytes(2 * i + 1).toInt << 8) | (bytes(2 * i).toInt & 0xff))
        i += 1
      }
      out
    }
  }

  /** Per-frame integer features over an s16le binary column:
    * (idCol, frame_id, energy, zcr, is_silent), ordered. Frames are
    * non-overlapping windows of `frameSize` samples; a trailing
    * partial frame is kept (its features cover the remainder).
    */
  def frameFeatures(
      clips: DataFrame,
      idCol: String,
      bytesCol: String,
      frameSize: Int): DataFrame = {
    require(frameSize >= 2, "frameSize must be >= 2")
    val spark = clips.sparkSession
    import spark.implicits._
    clips.select(col(idCol).cast("long"), col(bytesCol))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        val s = PcmCodec.decode(bytes)
        s.indices.grouped(frameSize).zipWithIndex.map { case (idx, f) =>
          var energy = 0L
          var zcr = 0L
          idx.foreach { t =>
            energy += s(t).toLong * s(t)
            if (t > idx.head && s(t - 1).toLong * s(t) < 0L) zcr += 1L
          }
          (id, f.toLong, energy, zcr, energy < EnergyFloor)
        }
      }(Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
        Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaBoolean))
      .toDF(idCol, "frame_id", "energy", "zcr", "is_silent")
      .orderBy(col(idCol), col("frame_id"))
  }
}
