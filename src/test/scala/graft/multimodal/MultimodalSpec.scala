package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  private val codec = Multimodal.FakeCodec()

  private def mediaDf = {
    import spark.implicits._
    Seq(
      (1L, "image", codec.encode(640, 480, Array.fill[Byte](100)(7))),
      (2L, "image", codec.encode(64, 64, Array.tabulate[Byte](256)(_.toByte))),
      (3L, "image", "not an image at all".getBytes("UTF-8")),
      (4L, "image", Array.empty[Byte])
    ).toDF("media_id", "kind", "content")
  }

  test("withMeta: header parse into struct; invalid blobs flagged, not failed") {
    import spark.implicits._
    val out = Multimodal.withMeta(spark, mediaDf, codec)
    val metas = out.select($"media_id", $"meta.width", $"meta.height", $"meta.valid")
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getBoolean(3)))).toMap
    assert(metas(1L) === ((640, 480, true)))
    assert(metas(2L) === ((64, 64, true)))
    assert(metas(3L) === ((-1, -1, false)))
    assert(metas(4L) === ((-1, -1, false)))
    import spark.implicits._
    assert(out.schema("meta").dataType.typeName === "struct")
  }

  test("sampleFrames: uniform indices, short last frame, invalid blobs yield no rows") {
    import spark.implicits._
    // media 1: payload 100 bytes → 2 frames (64 + 36); media 2: 256 → 4 frames
    val frames = Multimodal.sampleFrames(spark, mediaDf, codec, maxFrames = 5)
      .as[(Long, Int, Array[Byte])].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    assert(frames.keySet === Set(1L, 2L))          // invalid (3) and empty (4) → nothing
    assert(frames(1L).map(_._2).toSeq === Seq(0, 1))
    assert(frames(1L).map(_._3.length).toSeq === Seq(64, 36))
    assert(frames(2L).map(_._2).toSeq === Seq(0, 1, 2, 3))
    // frame content is the exact payload slice
    assert(frames(2L)(1)._3.toSeq === Array.tabulate[Byte](256)(_.toByte).slice(64, 128).toSeq)

    // many frames, few samples: evenly spread, first frame always hit
    val long = Seq((9L, "video", codec.encode(1, 1, Array.fill[Byte](64 * 20)(3))))
      .toDF("media_id", "kind", "content")
    val idx = Multimodal.sampleFrames(spark, long, codec, maxFrames = 5)
      .as[(Long, Int, Array[Byte])].collect().map(_._2).sorted.toSeq
    assert(idx === Seq(0, 4, 8, 12, 16))
  }

  test("extractFeatures: deterministic, unit-norm, batch-shape invariant") {
    import spark.implicits._
    val f1 = Multimodal.extractFeatures(spark, mediaDf.repartition(1), codec, dim = 32, batchSize = 2)
      .as[(Long, Array[Float])].collect().toMap
    val f4 = Multimodal.extractFeatures(spark, mediaDf.repartition(4), codec, dim = 32, batchSize = 32)
      .as[(Long, Array[Float])].collect().toMap
    assert(f1.keySet === Set(1L, 2L, 3L, 4L))
    f1.foreach { case (id, v) => assert(v.toSeq === f4(id).toSeq, s"media $id") }
    val norm = math.sqrt(f1(2L).map(x => x.toDouble * x).sum)
    assert(math.abs(norm - 1.0) < 1e-5)
    assert(f1(4L).forall(_ === 0.0f))   // empty payload → zero vector, no crash
  }

  // ---------- real bytes through the same seam (ImageIoCodec) ----------

  /** In-memory encoded image: left half dark, right half bright. */
  private def realImage(w: Int, h: Int, format: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, if (x < w / 2) 0x101010 else 0xf0f0f0)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, format, out)
    out.toByteArray
  }

  private def realMediaDf = {
    import spark.implicits._
    Seq(
      (1L, "image", realImage(64, 48, "png")),
      (2L, "image", realImage(20, 20, "jpg")),
      (3L, "image", "definitely not an image".getBytes("UTF-8")),
      (4L, "image", Array.empty[Byte])
    ).toDF("media_id", "kind", "content")
  }

  test("ImageIoCodec: header-only metadata for real PNG/JPEG, invalid degrades like Fake") {
    import spark.implicits._
    val out = Multimodal.withMeta(spark, realMediaDf, Multimodal.ImageIoCodec())
      .select($"media_id", $"meta.width", $"meta.height", $"meta.valid")
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getBoolean(3)))).toMap
    assert(out(1L) === ((64, 48, true)))
    assert(out(2L) === ((20, 20, true)))
    assert(out(3L) === ((-1, -1, false)))
    assert(out(4L) === ((-1, -1, false)))
  }

  test("ImageIoCodec: luma-grid features see real pixels (q50/q54 feature path)") {
    import spark.implicits._
    val codec = Multimodal.ImageIoCodec()
    val f = Multimodal.extractFeatures(spark, realMediaDf, codec, dim = 4, batchSize = 2)
      .as[(Long, Array[Float])].collect().toMap
    // dim=4 → 2×2 grid: right cells (bright) must dominate left cells
    val v = f(1L)
    assert(v(1) > v(0) * 3 && v(3) > v(2) * 3, v.toSeq.toString)
    assert(math.abs(math.sqrt(v.map(x => x.toDouble * x).sum) - 1.0) < 1e-5)
    assert(f(3L).forall(_ === 0.0f))     // undecodable → zero vector
    // deterministic across partition layouts
    val f2 = Multimodal.extractFeatures(spark, realMediaDf.repartition(4), codec,
      dim = 4, batchSize = 32).as[(Long, Array[Float])].collect().toMap
    f.foreach { case (id, vec) => assert(vec.toSeq === f2(id).toSeq) }
  }

  test("ImageIoCodec: still image is a 1-frame stream; frame round-trips as PNG") {
    import spark.implicits._
    val codec = Multimodal.ImageIoCodec()
    val frames = Multimodal.sampleFrames(spark, realMediaDf, codec, maxFrames = 5)
      .as[(Long, Int, Array[Byte])].collect()
    assert(frames.map(f => (f._1, f._2)).toSet === Set((1L, 0), (2L, 0)))
    // the sampled frame decodes back to the source dimensions
    val frame1 = frames.find(_._1 == 1L).get._3
    val meta = codec.decodeMeta(frame1)
    assert(meta.valid && meta.width === 64 && meta.height === 48)
  }

  test("ImageIoCodec: resize re-encodes at the target raster, invalid degrades") {
    import spark.implicits._
    val codec = Multimodal.ImageIoCodec()
    val out = Multimodal.resizeAll(spark, realMediaDf, codec, w = 16, h = 12)
      .as[(Long, Array[Byte])].collect().toMap
    val m1 = codec.decodeMeta(out(1L))
    assert(m1.valid && m1.width === 16 && m1.height === 12)
    assert(out(1L).length < realMediaDf.as[(Long, String, Array[Byte])]
      .collect().find(_._1 == 1L).get._3.length, "thumbnail must shrink")
    assert(out(3L).isEmpty)              // undecodable → empty, not failure
    // scaled pixels still carry the source's bright-right structure
    val f = codec.features(out(1L), 4)
    assert(f(1) > f(0) && f(3) > f(2))
  }

  test("ImageIoCodec: decode/encode never touches a disk cache (r14 q202 root cause)") {
    // The JVM-default ImageIO stream cache spools every in-memory blob
    // to a temp file before decoding — per-image disk IOPS on a 100 TB
    // media corpus, and the measured cause of the r14 q202 bench trip.
    // Contract: the codec constructs memory-cached streams directly
    // AND flips the per-JVM default off. Enforcement: point ImageIO's
    // cache at a READ-ONLY directory — any code path that still tried
    // to create a disk cache file would throw inside decode and the
    // assertions below would see invalid/empty results.
    val codec = Multimodal.ImageIoCodec()
    val dir = java.nio.file.Files.createTempDirectory("graft-imageio-guard")
    val prevDir = javax.imageio.ImageIO.getCacheDirectory
    try {
      javax.imageio.ImageIO.setCacheDirectory(dir.toFile)
      dir.toFile.setWritable(false)
      val png = realImage(32, 24, "png")
      val jpg = realImage(16, 16, "jpg")
      for (_ <- 1 to 25) {
        assert(codec.decodeMeta(png).valid)
        assert(codec.features(jpg, 8).exists(_ != 0.0f))
        assert(codec.frameAt(png, 0).nonEmpty)   // PNG re-encode path
        assert(codec.resize(jpg, 8, 8).nonEmpty) // encode path
      }
      assert(!javax.imageio.ImageIO.getUseCache,
        "codec init must pin the per-JVM ImageIO cache default off")
      assert(dir.toFile.listFiles() === null || dir.toFile.listFiles().isEmpty,
        "no ImageIO cache files may appear during decode/encode")
    } finally {
      dir.toFile.setWritable(true)
      javax.imageio.ImageIO.setCacheDirectory(prevDir)
      java.nio.file.Files.deleteIfExists(dir)
    }
  }

  test("FakeCodec: resize is meta-consistent, area-proportional, deterministic") {
    val codec = Multimodal.FakeCodec()
    val src = codec.encode(100, 100, Array.fill(1000)(7.toByte))
    val small = codec.resize(src, 10, 10)
    val m = codec.decodeMeta(small)
    assert(m.valid && m.width === 10 && m.height === 10)
    assert(small.length === 12 + 10)     // 1% of the area → 1% of payload
    assert(codec.resize(src, 10, 10).toSeq === small.toSeq)
    assert(codec.resize(Array[Byte](1, 2, 3), 10, 10).isEmpty)
  }
}
