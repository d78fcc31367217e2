package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.types._

class CsvIngestSpec extends SparkSpec {

  test("multiLine quoted cells with embedded newlines, declaratively cleaned") {
    val dir = Files.createTempDirectory("graft-csv")
    val csv = dir.resolve("meta.csv")
    Files.write(csv,
      ("entry_id,title,pdf_url\n" +
        "e1,\"A Title\nSplit Over\r\nThree Lines\",http://x/1.pdf\n" +
        "e2,Plain Title,http://x/2.pdf\n" +
        "e3,\"Quoted, with comma\",\n").getBytes(StandardCharsets.UTF_8))
    val schema = StructType(Seq(
      StructField("entry_id", StringType),
      StructField("title", StringType),
      StructField("pdf_url", StringType)))
    val df = CsvIngest.readClean(spark, csv.toString, schema, cleanCols = Seq("title"))
    val rows = df.collect().map(r => (r.getString(0), r.getString(1), Option(r.getString(2)))).sortBy(_._1)
    assert(rows.length === 3)
    assert(rows(0) === (("e1", "A Title Split Over Three Lines", Some("http://x/1.pdf"))))
    assert(rows(1) === (("e2", "Plain Title", Some("http://x/2.pdf"))))
    assert(rows(2)._3 === None)            // empty url → null (P2's filter target)
  }

  test("quarantine mode: malformed rows routed to corrupt side, clean rows typed") {
    val dir = Files.createTempDirectory("graft-csv3")
    val csv = dir.resolve("mixed.csv")
    Files.write(csv,
      "name,size\nok,123\nbroken,notanumber\nfine,456\n".getBytes(StandardCharsets.UTF_8))
    val schema = StructType(Seq(
      StructField("name", StringType), StructField("size", LongType)))
    val (clean, corrupt) = CsvIngest.readQuarantined(spark, csv.toString, schema)
    assert(clean.collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq ===
      Seq(("fine", 456L), ("ok", 123L)))
    val bad = corrupt.collect().map(_.getString(0))
    assert(bad.length === 1 && bad.head.contains("notanumber"))
  }

  test("schema is explicit: malformed numeric cells become null, not strings") {
    val dir = Files.createTempDirectory("graft-csv2")
    val csv = dir.resolve("sizes.csv")
    Files.write(csv, "name,size\nok,123\nbad,notanumber\n".getBytes(StandardCharsets.UTF_8))
    val schema = StructType(Seq(
      StructField("name", StringType), StructField("size", LongType)))
    val df = CsvIngest.readClean(spark, csv.toString, schema, Nil)
    val m = df.collect().map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(m("ok") === Some(123L))
    assert(m("bad") === None)
  }
}
