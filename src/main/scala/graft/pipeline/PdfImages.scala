package graft.pipeline

import java.nio.charset.StandardCharsets

import graft.multimodal.Multimodal

/** One raster image XObject extracted from a PDF.
  *
  * `codec` tells what `data` holds:
  *  - `"raw"`   — fully decoded 8-bit component bytes, row-major
  *    (`width * height * components`); every text-side filter
  *    (Flate/LZW/A85/AHx/RunLength) and any `/Predictor` transform
  *    has already been reversed.
  *  - `"dct"`   — the JPEG payload exactly as stored (transport
  *    coats stripped): directly decodable by `javax.imageio`.
  *  - `"jpx" | "ccitt" | "jbig2"` — the codec payload (no pure-JVM
  *    decoder in this container; carried for the OCR seam).
  *  - `"opaque"` — an 8-bit decode this subset cannot interpret as
  *    pixels (unknown colorspace, sub-8-bit samples, size mismatch);
  *    the decoded bytes are carried, luma pooling declines.
  */
final case class PdfImage(
    objNum: Int,
    width: Int,
    height: Int,
    bitsPerComponent: Int,
    colorSpace: String,
    codec: String,
    data: Array[Byte])

/** Embedded raster-image extraction — the scanned-document leg of the
  * PDF pipeline. [[PdfTextPartitioner]] recovers born-digital text
  * layers; documents whose pages are pictures (scans, figure-only
  * pages) carry their content as `/Subtype /Image` XObjects, which
  * this walks out of the object table so a corpus of scanned PDFs can
  * be perceptually deduplicated ([[graft.multimodal.ImageDedup]])
  * and measured (dims, codec mix) WITHOUT an OCR model: the reference
  * pipeline's hi_res strategy rasterizes exactly these objects before
  * inference (reference `02-ocr-pdfs.py` partition step), so image
  * identity/near-dup is decidable long before the expensive model
  * pass — at 100 TB that ordering (dedup first, OCR survivors) is the
  * difference between OCRing every copy of a viral scan and OCRing
  * one.
  *
  * Scale shape: `extract` is a pure per-row function (PDF bytes in,
  * image list out) — embarrassingly parallel under `mapPartitions`,
  * no driver state, no shuffle; malformed containers yield fewer
  * images, never task failures. Shadowing follows
  * [[PdfTextPartitioner.objectsWithPos]]: an incrementally-updated
  * image object resolves to its LAST (visible) definition.
  */
object PdfImages {
  import PdfTextPartitioner.{objectsWithPos, filterList, PdfObj}

  /** Raster-codec filter names (PDF 32000-1 §7.4, incl. inline-image
    * abbreviations) → the codec tag carried on [[PdfImage]]. */
  val RasterCodecs: Map[String, String] = Map(
    "DCTDecode" -> "dct", "DCT" -> "dct",
    "JPXDecode" -> "jpx",
    "CCITTFaxDecode" -> "ccitt", "CCF" -> "ccitt",
    "JBIG2Decode" -> "jbig2")

  private val imageSubtype = """/Subtype\s*/Image(?![A-Za-z0-9])""".r
  private val nameAfter = """/ColorSpace\s*/([A-Za-z0-9]+)""".r
  private val refAfter = """/ColorSpace\s+(\d{1,9})\s+\d+\s+R(?![A-Za-z0-9])""".r
  private val firstName = """/([A-Za-z0-9]+)""".r

  /** Components per sample for the colorspaces this subset pools. */
  def components(colorSpace: String): Int = colorSpace match {
    case "DeviceGray" | "CalGray" => 1
    case "DeviceRGB" | "CalRGB" => 3
    case "DeviceCMYK" => 4
    case _ => -1
  }

  /** All image XObjects of `bytes` in byte-stream order (the winning
    * definition per object number). Run AFTER
    * [[PdfCrypt.decryptStreams]] for encrypted-decryptable files —
    * the same ordering [[AutoPartitioner]] applies to the text leg.
    */
  def extract(bytes: Array[Byte]): Seq[PdfImage] = {
    if (bytes == null || bytes.length < 8) return Seq.empty
    if (!PdfTextPartitioner.hasPdfMagic(bytes)) return Seq.empty
    val objs = objectsWithPos(bytes)

    // /Width 16  (direct)  or  /Width 9 0 R  (indirect: the referenced
    // object's body is the integer). Image dicts are top-level stream
    // dicts, but writers do emit indirect dims.
    def intEntry(dict: String, key: String): Option[Int] = {
      val direct = (key + """\s+(-?\d{1,9})(?!\d)(?!\s*\d+\s+R)""").r
      val indirect = (key + """\s+(\d{1,9})\s+\d+\s+R(?![A-Za-z0-9])""").r
      direct.findFirstMatchIn(dict).map(_.group(1).toInt).orElse(
        indirect.findFirstMatchIn(dict).flatMap { m =>
          objs.get(m.group(1).toInt)
            .flatMap(e => e._2.dict.trim.toIntOption)
        })
    }

    def colorSpaceOf(dict: String): String =
      nameAfter.findFirstMatchIn(dict).map(_.group(1)).orElse(
        refAfter.findFirstMatchIn(dict).flatMap { m =>
          objs.get(m.group(1).toInt).flatMap(e =>
            firstName.findFirstMatchIn(e._2.dict).map(_.group(1)))
        }).getOrElse("")

    objs.toSeq
      .filter { case (_, (_, o)) => imageSubtype.findFirstIn(o.dict).isDefined }
      .sortBy(_._2._1)
      .flatMap { case (num, (_, o)) =>
        val w = intEntry(o.dict, "/Width").getOrElse(0)
        val h = intEntry(o.dict, "/Height").getOrElse(0)
        val bpc = intEntry(o.dict, "/BitsPerComponent").getOrElse(
          if (o.dict.contains("/ImageMask")) 1 else 8)
        val cs = colorSpaceOf(o.dict)
        if (w <= 0 || h <= 0) None
        else {
          val filters = filterList(o.dict)
          val rasterIdx = filters.indexWhere(RasterCodecs.contains)
          if (rasterIdx >= 0) {
            val tag = RasterCodecs(filters(rasterIdx))
            transportDecode(o, bytes, filters.take(rasterIdx), o.dict).map { p =>
              // CCITT G4 (/K < 0) has a pure-JVM decoder: scans become
              // 8-bit gray luma (255 white / 0 black) and join the
              // perceptual-hash path; G3 (/K >= 0) and a /Columns that
              // contradicts /Width stay payload-passthrough
              val k = intEntry(o.dict, "/K").getOrElse(0)
              val cols = intEntry(o.dict, "/Columns").getOrElse(1728)
              val rows = intEntry(o.dict, "/Rows").getOrElse(h)
              val g4 =
                if (tag == "ccitt" && k < 0 && cols == w && rows == h)
                  CcittG4.decode(p, cols, rows)
                else None
              g4 match {
                case Some(px) => PdfImage(num, w, h, 8, "DeviceGray", "raw", px)
                case None => PdfImage(num, w, h, bpc, cs, tag, p)
              }
            }
          }
          else
            o.data.map { px =>
              val comps = components(cs)
              val ok = bpc == 8 && comps > 0 &&
                px.length == w.toLong * h * comps
              PdfImage(num, w, h, bpc, cs, if (ok) "raw" else "opaque", px)
            }
        }
      }
  }

  /** Strip the transport coats AHEAD of a raster codec (e.g.
    * `/Filter [/ASCII85Decode /DCTDecode]` stores base85'd JPEG):
    * text-side stages only — a second raster name or an unknown
    * filter in the coat fails the image, never misparses it. The
    * `/Predictor` post-transform belongs to the decompression stage
    * of a RAW image; a raster payload is handed to its codec as-is.
    */
  private def transportDecode(
      o: PdfObj, bytes: Array[Byte], coats: Seq[String],
      dict: String): Option[Array[Byte]] = {
    o.span.flatMap { case (ds, de) =>
      if (de <= ds) None
      else {
        var cur: Option[Array[Byte]] =
          Some(java.util.Arrays.copyOfRange(bytes, ds, de))
        for (f <- coats if cur.isDefined) cur = f match {
          case "FlateDecode" | "Fl" => cur.flatMap(PdfTextPartitioner.inflate)
          case "LZWDecode" | "LZW" =>
            val early = """/EarlyChange\s+(\d)""".r.findFirstMatchIn(dict)
              .map(_.group(1).toInt).getOrElse(1)
            cur.flatMap(PdfTextPartitioner.lzwDecode(_, early))
          case "ASCIIHexDecode" | "AHx" =>
            cur.flatMap(PdfTextPartitioner.asciiHexDecode)
          case "ASCII85Decode" | "A85" =>
            cur.flatMap(PdfTextPartitioner.ascii85Decode)
          case "RunLengthDecode" | "RL" =>
            cur.flatMap(PdfTextPartitioner.runLengthDecode)
          case _ => None
        }
        cur
      }
    }
  }

  /** `grid`×`grid` luma cells of one image, row-major — the input of
    * [[graft.multimodal.ImageDedup.dHashOfGrid]]. Pixel (py, px)
    * pools into cell (py*grid/height, px*grid/width); a cell value is
    * `Σ(component sum) / (pixels · components)` — integer numerators
    * accumulate in any order, ONE double division, one float cast, so
    * the value is bit-replayable from the pixel formula alone (the
    * q348 oracle recomputes it in SQL).
    *
    * Pools `raw` gray/RGB directly; `dct` through an in-memory
    * `javax.imageio` decode (no disk cache — the r14 q202 lesson);
    * other codecs and sub-8-bit samples → None (no pure-JVM decoder:
    * the caller falls toward the OCR seam, never a fake hash).
    */
  def lumaGrid(img: PdfImage, grid: Int = 8): Option[Array[Float]] = {
    if (img.width < grid || img.height < grid) return None
    img.codec match {
      case "raw" =>
        val comps = components(img.colorSpace)
        if (comps != 1 && comps != 3) None
        else if (img.data.length != img.width.toLong * img.height * comps) None
        else {
          val num = new Array[Long](grid * grid)
          val cnt = new Array[Long](grid * grid)
          var py = 0
          while (py < img.height) {
            val cy = py * grid / img.height
            var px = 0
            while (px < img.width) {
              val cx = px * grid / img.width
              val base = (py * img.width + px) * comps
              var sv = 0L
              var c = 0
              while (c < comps) { sv += img.data(base + c) & 0xff; c += 1 }
              num(cy * grid + cx) += sv
              cnt(cy * grid + cx) += 1
              px += 1
            }
            py += 1
          }
          Some(Array.tabulate(grid * grid)(i =>
            (num(i).toDouble / (cnt(i) * comps)).toFloat))
        }
      case "dct" =>
        decodeJpeg(img.data).flatMap { bi =>
          val (w, h) = (bi.getWidth, bi.getHeight)
          if (w < grid || h < grid) None
          else {
            val num = new Array[Long](grid * grid)
            val cnt = new Array[Long](grid * grid)
            var py = 0
            while (py < h) {
              val cy = py * grid / h
              var px = 0
              while (px < w) {
                val cx = px * grid / w
                val rgb = bi.getRGB(px, py)
                num(cy * grid + cx) +=
                  ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
                cnt(cy * grid + cx) += 1
                px += 1
              }
              py += 1
            }
            Some(Array.tabulate(grid * grid)(i =>
              (num(i).toDouble / (cnt(i) * 3L)).toFloat))
          }
        }
      case _ => None
    }
  }

  private def decodeJpeg(payload: Array[Byte]): Option[java.awt.image.BufferedImage] = {
    if (payload == null || payload.length == 0) return None
    Multimodal.ImageIoCodec.init        // per-JVM: no disk-backed stream cache
    val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(payload))
    try Option(javax.imageio.ImageIO.read(iis))   // read() closes iis itself
    catch { case _: Exception => None }
    finally { try iis.close() catch { case _: java.io.IOException => () } }
  }
}

/** [[Multimodal.MediaCodec]] over WHOLE-PDF bytes: frame k is the
  * k-th embedded raster image, features are the first luma-poolable
  * image's grid — so `ImageDedup.withPHash(docs, "doc_id", "pdf",
  * PdfRasterCodec())` perceptually hashes a scanned-PDF corpus with
  * zero new plumbing, and `Multimodal.sampleFrames` walks a PDF's
  * images like video frames. Each call re-extracts (the codec
  * interface is stateless per blob); single-pass consumers that need
  * metadata AND hashes should use [[PdfImages.extract]] +
  * [[graft.multimodal.ImageDedup.dHashOfGrid]] directly.
  */
final case class PdfRasterCodec() extends Multimodal.MediaCodec {
  import graft.multimodal.Multimodal.MediaMeta

  private def firstPoolable(content: Array[Byte]): Option[(PdfImage, Array[Float])] =
    PdfImages.extract(content).iterator
      .flatMap(im => PdfImages.lumaGrid(im).map((im, _)))
      .nextOption()

  override def decodeMeta(content: Array[Byte]): MediaMeta =
    firstPoolable(content) match {
      case Some((im, _)) =>
        MediaMeta(im.width, im.height, content.length.toLong, valid = true)
      case None =>
        MediaMeta(-1, -1,
          if (content == null) 0L else content.length.toLong, valid = false)
    }

  override def features(content: Array[Byte], dim: Int): Array[Float] = {
    val grid = math.sqrt(dim.toDouble).toInt
    require(grid * grid == dim, s"PdfRasterCodec pools square grids, dim $dim")
    firstPoolable(content) match {
      case Some((im, g)) if g.length == dim => g
      case Some((im, _)) =>
        PdfImages.lumaGrid(im, grid).getOrElse(new Array[Float](dim))
      case None => new Array[Float](dim)
    }
  }

  override def frameCount(content: Array[Byte]): Int =
    PdfImages.extract(content).size

  override def frameAt(content: Array[Byte], idx: Int): Array[Byte] = {
    val imgs = PdfImages.extract(content)
    if (idx < 0 || idx >= imgs.size) Array.empty[Byte] else imgs(idx).data
  }

  /** Nearest-neighbor gray thumbnail of the first poolable image, in
    * [[Multimodal.FakeCodec]]'s GIMG container (magic | w | h |
    * payload) so downstream stages that speak GIMG can consume it;
    * empty for PDFs with no poolable image (bad media is data).
    */
  override def resize(content: Array[Byte], w: Int, h: Int): Array[Byte] = {
    if (w <= 0 || h <= 0) return Array.empty[Byte]
    val src = PdfImages.extract(content).iterator.flatMap { im =>
      val comps = PdfImages.components(im.colorSpace)
      if (im.codec == "raw" && (comps == 1 || comps == 3) &&
          im.data.length == im.width.toLong * im.height * comps)
        Some((im, comps))
      else None
    }.nextOption()
    src match {
      case None => Array.empty[Byte]
      case Some((im, comps)) =>
        val out = new Array[Byte](w * h)
        var y = 0
        while (y < h) {
          val sy = y * im.height / h
          var x = 0
          while (x < w) {
            val sx = x * im.width / w
            val base = (sy * im.width + sx) * comps
            var sv = 0
            var c = 0
            while (c < comps) { sv += im.data(base + c) & 0xff; c += 1 }
            out(y * w + x) = (sv / comps).toByte
            x += 1
          }
          y += 1
        }
        val bb = java.nio.ByteBuffer.allocate(12 + out.length)
        bb.put("GIMG".getBytes(StandardCharsets.US_ASCII))
        bb.putInt(w).putInt(h).put(out)
        bb.array()
    }
  }
}
