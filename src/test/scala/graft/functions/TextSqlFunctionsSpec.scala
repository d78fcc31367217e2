package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The SQL surface of the text-function family: every function is one
  * expression tree behind two call syntaxes, so SQL and DataFrame
  * results must be IDENTICAL (not merely close).
  */
class TextSqlFunctionsSpec extends SparkSpec {

  test("SQL calls equal DataFrame calls on the same documents") {
    import spark.implicits._
    graft.Graft.install(spark)
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    docs.createOrReplaceTempView("docs_sql")

    val viaSql = spark.sql(
      """SELECT doc_id, token_count(text) AS tc, bpe_token_count(text) AS bc,
        |  lang_id(text) AS lid, quality_score(text) AS q,
        |  doc_fingerprint(text) AS fp, repetition_ratio(text, 2) AS rep
        |FROM docs_sql ORDER BY doc_id""".stripMargin).collect()
    val viaDf = docs.select($"doc_id",
        TextFunctions.tokenCount($"text").as("tc"),
        TextFunctions.bpeTokenCount($"text").as("bc"),
        TextFunctions.langId($"text").as("lid"),
        TextFunctions.qualityScore($"text").as("q"),
        TextFunctions.fingerprint($"text").as("fp"),
        graft.operators.Boilerplate.repetitionRatio($"text", 2).as("rep"))
      .orderBy($"doc_id").collect()
    assert(viaSql.toSeq === viaDf.toSeq)
    assert(viaSql.length > 0)
  }

  test("repetition_ratio requires a literal n") {
    graft.Graft.install(spark)
    val r = spark.sql("SELECT repetition_ratio('a b a b', 2) AS r").head.getDouble(0)
    assert(r === 0.3333)   // 3 bigrams, 2 distinct → r4(1/3)
  }
}
