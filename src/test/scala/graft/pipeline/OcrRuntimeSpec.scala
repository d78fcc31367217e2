package graft.pipeline

import java.nio.charset.StandardCharsets

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The round-7 OCR readiness probe: if the sandbox ever grows a
  * `tesseract` binary the engine must light up real OCR without a
  * code round; until then the deterministic fallback must carry the
  * same pipeline. Both branches are asserted — whichever one this
  * environment takes.
  */
class OcrRuntimeSpec extends SparkSpec {
  import spark.implicits._

  test("probe never throws and selection is consistent with it") {
    val v = OcrRuntime.tesseractVersion          // forced lazy probe
    // r11: bestPartitioner wraps the probed base in the PDF-magic
    // dispatching AutoPartitioner — the base still follows the probe
    val p = OcrRuntime.bestPartitioner()
    assert(p.isInstanceOf[AutoPartitioner])
    val base = p.asInstanceOf[AutoPartitioner].base
    assert(v.isDefined === base.isInstanceOf[TesseractPartitioner])
    if (v.isEmpty) assert(base === TextPartitioner())
    info(s"probe: ${v.getOrElse("absent — TextPartitioner fallback")}")
  }

  test("extractText runs green end-to-end with the probed partitioner") {
    val part = OcrRuntime.bestPartitioner()
    part match {
      case AutoPartitioner(TextPartitioner()) =>
        // sandbox branch: fallback must equal the golden stand-in path
        val docs = Seq(
          (1L, "page one\n\npage two", 19L),
          (2L, "solo", 4L))
          .map { case (id, t, n) => (id, t.getBytes(StandardCharsets.UTF_8), n) }
          .toDF("doc_id", "content", "filesize")
        val got = OcrPipeline.extractText(spark, docs, part)
          .orderBy($"doc_id").collect().map(r => (r.getLong(0), r.getString(1)))
        assert(got.toSeq === Seq((1L, "page one\npage two"), (2L, "solo")))
      case AutoPartitioner(TesseractPartitioner(_)) =>
        // live branch: OCR a rendered PNG and find the planted word
        val img = new java.awt.image.BufferedImage(
          360, 80, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = img.createGraphics()
        g.setColor(java.awt.Color.WHITE); g.fillRect(0, 0, 360, 80)
        g.setColor(java.awt.Color.BLACK)
        g.setFont(new java.awt.Font(java.awt.Font.SANS_SERIF, java.awt.Font.PLAIN, 32))
        g.drawString("HELLO GRAFT", 20, 50)
        g.dispose()
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        val docs = Seq((1L, bos.toByteArray, bos.size().toLong))
          .toDF("doc_id", "content", "filesize")
        val got = OcrPipeline.extractText(spark, docs, part)
          .select($"text").as[String].collect().mkString(" ")
        assert(got.toUpperCase.contains("HELLO"), s"OCR output was: $got")
    }
  }

  test("tesseract partitioner is failure-isolated: garbage bytes yield empty, not an exception") {
    // runs on BOTH branches: with the binary absent the CLI spawn
    // itself fails (IOException path); with it present tesseract
    // rejects the input (non-zero exit path) — either way Seq.empty,
    // never a thrown error that would kill a corpus job
    val junk = Array.fill[Byte](64)(0x7f)
    assert(TesseractPartitioner().partition(junk, PartitionStrategy.OcrOnly) === Seq.empty)
    assert(TesseractPartitioner().partition(null, PartitionStrategy.HiRes) === Seq.empty)
    assert(TesseractPartitioner().partition(Array.emptyByteArray, PartitionStrategy.OcrOnly) === Seq.empty)
  }
}
