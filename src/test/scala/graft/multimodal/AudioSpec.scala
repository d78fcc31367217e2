package graft.multimodal

import graft.SparkSpec

/** Audio leg (multimodal/Audio): s16le codec round-trip (negative
  * and boundary samples), hand-computed frame features including the
  * trailing partial frame, and the silence rule.
  */
class AudioSpec extends SparkSpec {

  test("s16le encode/decode is an exact round-trip at the boundaries") {
    val xs = Array(0, 1, -1, 255, 256, -255, -256, 32767, -32768, 12345, -12288)
    assert(Audio.PcmCodec.decode(Audio.PcmCodec.encode(xs)).toSeq == xs.toSeq)
    intercept[IllegalArgumentException] {
      Audio.PcmCodec.encode(Array(40000)) // not s16
    }
    intercept[IllegalArgumentException] {
      Audio.PcmCodec.decode(Array[Byte](1)) // odd payload
    }
  }

  test("hand-computed energy/zcr/silence with a trailing partial frame") {
    import spark.implicits._
    val clip = Array(100, -100, 100, 0, 50)
    val df = Seq((7L, Audio.PcmCodec.encode(clip))).toDF("clip_id", "audio")
    val out = Audio.frameFeatures(df, "clip_id", "audio", frameSize = 4)
      .as[(Long, Long, Long, Long, Boolean)].collect().toSeq
    // frame 0: energy 30000, crossings (100,-100),(-100,100); the
    // (100, 0) pair is NOT a crossing (product 0)
    // frame 1 (partial): energy 2500 < floor → silent
    assert(out == Seq(
      (7L, 0L, 30000L, 2L, false),
      (7L, 1L, 2500L, 0L, true)), s"got $out")
  }

  test("frame features are layout invariant") {
    import spark.implicits._
    val clips = (0L until 6L).map { c =>
      val s = Array.tabulate(1000)(t =>
        ((((c * 31 + t) * 2654435761L) % 8192L - 4096L) * (c % 4L)).toInt)
      (c, Audio.PcmCodec.encode(s))
    }
    def run(np: Int) =
      Audio.frameFeatures(clips.toDF("clip_id", "audio").repartition(np),
          "clip_id", "audio", frameSize = 128)
        .as[(Long, Long, Long, Long, Boolean)].collect().toSeq
    assert(run(1) == run(5))
  }
}
