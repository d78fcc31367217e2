package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.types._

/** JSON-lines ingest (sources.JsonIngest): strict-schema read,
  * malformed-line quarantine, and the in-place payload-column parse.
  */
class JsonIngestSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("title", StringType),
    StructField("score", DoubleType)))

  private def writeLines(lines: String*): String = {
    val dir = Files.createTempDirectory("graft-jsonl")
    val f = dir.resolve("data.jsonl")
    Files.write(f, lines.mkString("\n").getBytes(StandardCharsets.UTF_8))
    f.toString
  }

  test("strict-schema read: typed columns, missing fields null") {
    val path = writeLines(
      """{"doc_id": 1, "title": "a", "score": 0.5}""",
      """{"doc_id": 2, "title": "b"}""")
    val rows = JsonIngest.read(spark, path, schema)
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).sortBy(_._1)
    assert(rows.toSeq == Seq((1L, "a", Some(0.5)), (2L, "b", None)))
  }

  test("quarantine: malformed lines land verbatim in the corrupt side") {
    val path = writeLines(
      """{"doc_id": 1, "title": "ok", "score": 1.0}""",
      """{"doc_id": oops not json""",
      """{"doc_id": 3, "title": "also ok", "score": 3.0}""")
    val (clean, corrupt) = JsonIngest.readQuarantined(spark, path, schema)
    assert(clean.count() == 2L)
    val bad = corrupt.collect().map(_.getString(0))
    assert(bad.length == 1 && bad.head.contains("oops not json"))
    // clean side carries no corrupt column
    assert(!clean.columns.contains("_corrupt_record"))
  }

  test("parseColumn: schema-conformant payloads parse, broken ones null") {
    import spark.implicits._
    val df = Seq(
      (1L, """{"k": 7}"""),
      (2L, """{broken"""),
      (3L, """{"k": 9}""")).toDF("id", "props")
    val pSchema = StructType(Seq(StructField("k", LongType)))
    val out = JsonIngest.parseColumn(df, "props", pSchema, "p")
      .selectExpr("id", "p.k AS k")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)))).sortBy(_._1)
    assert(out.toSeq == Seq((1L, Some(7L)), (2L, None), (3L, Some(9L))))
  }
}
