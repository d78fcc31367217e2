package graft.multimodal

import graft.SparkSpec
import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

class ImageDedupSpec extends SparkSpec {
  import spark.implicits._

  /** Real PNG bytes with a deterministic per-pixel pattern. */
  private def png(w: Int, h: Int, f: (Int, Int) => Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = f(x, y) & 0xff
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  private val codec = Multimodal.ImageIoCodec()

  test("dHash is invariant to uniform brightness shift, sensitive to content") {
    val base = png(64, 64, (x, y) => (x * 3 + y) % 200)
    val brighter = png(64, 64, (x, y) => math.min((x * 3 + y) % 200 + 40, 255))
    val other = png(64, 64, (x, y) => 255 - (x * 7 ^ y * 13) % 256)
    val hBase = ImageDedup.dHash(codec, base)
    // +40 brightness preserves every horizontal gradient comparison
    assert(ImageDedup.dHash(codec, brighter) === hBase)
    val d = java.lang.Long.bitCount(hBase ^ ImageDedup.dHash(codec, other))
    assert(d > 10, s"unrelated images should be far, hamming=$d")
    // re-encode stability: decode + re-encode to PNG yields same hash
    val reencoded = {
      val img = ImageIO.read(new java.io.ByteArrayInputStream(base))
      val out = new ByteArrayOutputStream(); ImageIO.write(img, "png", out)
      out.toByteArray
    }
    assert(ImageDedup.dHash(codec, reencoded) === hBase)
  }

  test("pigeonhole block join finds exactly the brute-force Hamming pairs") {
    // hashes crafted around the threshold: flip 0..8 bits off a base
    val baseHash = 0x00FACEB00C5L
    val rows = (0 to 8).map { k =>
      (k.toLong, (0 until k).foldLeft(baseHash)((h, i) => h ^ (1L << (i * 6))))
    } :+ (99L, ~baseHash & ((1L << 56) - 1))
    val df = rows.toDF("id", "phash")
    val t = 4
    val got = ImageDedup.nearDupPairs(df, "id", maxHamming = t)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val brute = (for {
      (ia, ha) <- rows; (ib, hb) <- rows if ia < ib
      d = java.lang.Long.bitCount(ha ^ hb) if d <= t
    } yield (ia, ib, d.toLong)).toSet
    assert(got === brute)
    assert(brute.nonEmpty && brute.exists(_._3 == t), "threshold boundary exercised")
  }

  test("pigeonhole equals brute force on 200 random hashes at every threshold") {
    val rnd = new scala.util.Random(147)
    // mix of independent hashes and near-dup perturbations so every
    // Hamming band is populated
    val base = Seq.fill(60)(rnd.nextLong() & ((1L << 56) - 1))
    val rows = base.zipWithIndex.flatMap { case (h, i) =>
      val flips = rnd.nextInt(10)
      Seq((i.toLong * 10, h),
        (i.toLong * 10 + 1,
          (0 until flips).foldLeft(h)((x, _) => x ^ (1L << rnd.nextInt(56)))))
    }.take(200)
    val df = rows.toDF("id", "phash")
    for (t <- Seq(0, 3, 7)) {
      val got = ImageDedup.nearDupPairs(df, "id", t)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val brute = (for {
        (ia, ha) <- rows; (ib, hb) <- rows if ia < ib
        d = java.lang.Long.bitCount(ha ^ hb) if d <= t
      } yield (ia, ib, d.toLong)).toSet
      assert(got === brute, s"threshold $t")
    }
  }

  test("end-to-end on real images through withPHash: dup pair found, distinct not") {
    val imgs = Seq(
      (1L, png(48, 48, (x, y) => (x * 5 + y * 2) % 220)),
      (2L, png(48, 48, (x, y) => math.min((x * 5 + y * 2) % 220 + 25, 255))), // bright dup
      (3L, png(48, 48, (x, y) => (x * x + 31 * y) % 251))
    ).toDF("media_id", "content")
    val pairs = ImageDedup.nearDupPairs(
        ImageDedup.withPHash(imgs, "media_id", "content", codec), "media_id", 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._2 == 3L || p._1 == 3L))
  }

  test("FakeCodec path is deterministic and layout-independent") {
    val blobs = (0L until 40L).map { i =>
      (i, Multimodal.FakeCodec().encode(32, 32,
        s"payload payload $i ${i % 5}".getBytes("UTF-8")))
    }
    def run(parts: Int) = ImageDedup.withPHash(
        blobs.toDF("media_id", "content").repartition(parts),
        "media_id", "content", Multimodal.FakeCodec())
      .orderBy($"media_id").collect().map(_.getLong(1)).toSeq
    assert(run(1) === run(7))
  }

  test("HashGridCodec cells follow the three-surface hash formula exactly") {
    // the q202 oracle recomputes these cells in SQL — the Scala side
    // must be the same arithmetic, masked under Float's exact-integer
    // range (< 2^24), and the dHash must follow from the grid's
    // gradient comparisons
    val salt = 202L
    val codec = Multimodal.HashGridCodec(salt)
    val id = 1234567L
    val content = java.nio.ByteBuffer.allocate(8).putLong(id).array()
    val f = codec.features(content, 64)
    (0 until 64).foreach { p =>
      val expect = graft.operators.Sampling.hashBitsScalar(id * 64L + p, salt) % 1048576L
      assert(f(p) === expect.toFloat, s"cell $p")
    }
    var h = 0L
    var bit = 0
    for (y <- 0 until 8; x <- 0 until 7) {
      if (f(y * 8 + x) < f(y * 8 + x + 1)) h |= 1L << bit
      bit += 1
    }
    assert(ImageDedup.dHash(codec, content) === h)
    // invalid content degrades like every codec: zero grid, not a throw
    assert(codec.features(Array[Byte](1, 2, 3), 64).forall(_ == 0f))
  }

  test("mega-bucket guard: level-2 sub-split keeps brute-force recall") {
    // the r15-flagged shape: every hash's set bits live ABOVE bit 18,
    // so block 0 of the t=2 split holds ONE value (0) with every
    // distinct hash — an over-cap bucket. Twins flip one bit in block
    // 1 AND one in bits [54,56), so the ONLY agreeing full block is
    // the over-cap one and recall depends entirely on the level-2
    // complement sub-split (sub-range [36,54) of the original bits).
    val rnd = new scala.util.Random(1616)
    val rows: Seq[(Long, Long)] = (0 until 40).flatMap { i =>
      val h = (rnd.nextLong() & ((1L << 38) - 1)) << 18
      val twin = h ^ (1L << (18 + rnd.nextInt(18))) ^ (1L << (54 + rnd.nextInt(2)))
      Seq((i.toLong * 2, h), (i.toLong * 2 + 1, twin))
    }
    val df = rows.toDF("id", "phash")
    val got = ImageDedup.nearDupPairs(df, "id", maxHamming = 2, bucketCap = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    spark.catalog.clearCache()
    val brute = (for {
      (ia, ha) <- rows; (ib, hb) <- rows if ia < ib
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 2
    } yield (ia, ib, d.toLong)).toSet
    assert(got === brute)
    assert(brute.size >= 40)                 // every planted twin pair present
  }

  test("mega-bucket guard: default cap unchanged results, no trip at suite scale") {
    val rnd = new scala.util.Random(1617)
    val rows = (0 until 100).map(i => (i.toLong, rnd.nextLong() & ((1L << 56) - 1)))
    val df = rows.toDF("id", "phash")
    val guarded = ImageDedup.nearDupPairs(df, "id", 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    spark.catalog.clearCache()
    val brute = (for {
      (ia, ha) <- rows; (ib, hb) <- rows if ia < ib
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 6
    } yield (ia, ib, d.toLong)).toSet
    assert(guarded === brute)
  }

  test("mega-bucket guard: doubly-degenerate corpus — strict throws, lossy warns") {
    // bits confined to [18,36): blocks 0 and 2 are constant AND the
    // level-2 sub-ranges outside [18,36) are constant too — the
    // star-link regime. Non-strict output must stay a SUBSET of brute
    // force (verification exact: no false pairs); strict must refuse.
    val rnd = new scala.util.Random(1618)
    val rows = (0 until 60)
      .map(i => (i.toLong, (rnd.nextLong() & ((1L << 18) - 1)) << 18)).distinct
    val df = rows.toDF("id", "phash")
    val lossy = ImageDedup.nearDupPairs(df, "id", maxHamming = 2, bucketCap = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    spark.catalog.clearCache()
    val brute = (for {
      (ia, ha) <- rows; (ib, hb) <- rows if ia < ib
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 2
    } yield (ia, ib, d.toLong)).toSet
    assert(lossy.subsetOf(brute))
    assertThrows[IllegalStateException] {
      ImageDedup.nearDupPairs(df, "id", maxHamming = 2, bucketCap = 8,
        strict = true).collect()
    }
    spark.catalog.clearCache()
  }
}
