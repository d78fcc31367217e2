package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AnonymitySpec extends SparkSpec {
  import spark.implicits._

  // QI = (zip, age_band); sensitive = diagnosis.
  // zip 10: 3 rows, 2 diagnoses | zip 20: 2 rows, 1 diagnosis (l-fail)
  // zip 30: 1 row (k-fail)
  private def rows() = Seq(
    (1L, 10, "30s", "flu"), (2L, 10, "30s", "flu"), (3L, 10, "30s", "cold"),
    (4L, 20, "40s", "flu"), (5L, 20, "40s", "flu"),
    (6L, 30, "50s", "rare")
  ).toDF("id", "zip", "age_band", "diag")

  test("classSizes and histogram count classes and violating rows") {
    val hist = Anonymity.sizeHistogram(rows(), Seq("zip", "age_band"), k = 2L)
      .orderBy($"class_size").collect()
    assert(hist.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq ===
      Seq((1L, 1L, 1L, 1L), (2L, 1L, 2L, 0L), (3L, 1L, 3L, 0L)))
  }

  test("riskAnnotate feeds suppression: filtering k<2 drops exactly the singleton") {
    val kept = Anonymity.riskAnnotate(rows(), Seq("zip", "age_band"))
      .filter($"class_size" >= 2)
    assert(kept.count() === 5L)
    assert(kept.filter($"zip" === 30).count() === 0L)
    // annotation preserves every input column
    assert(kept.columns.toSet === Set("zip", "age_band", "id", "diag", "class_size"))
  }

  test("riskAnnotate is NULL-safe: a NULL QI row is a class, not a dropped row") {
    val withNull = rows().union(
      Seq((7L, 10, null.asInstanceOf[String], "flu"),
          (8L, 10, null.asInstanceOf[String], "cold"))
        .toDF("id", "zip", "age_band", "diag"))
    val annotated = Anonymity.riskAnnotate(withNull, Seq("zip", "age_band"))
    // every input row survives annotation — compliance must see all
    assert(annotated.count() === withNull.count())
    // the two NULL-age rows form their own class of size 2
    val nullClass = annotated.filter($"age_band".isNull).collect()
    assert(nullClass.length === 2 && nullClass.forall(_.getAs[Long]("class_size") == 2L))
  }

  test("lDiversity flags the homogeneous class, not the small one per se") {
    val ld = Anonymity.lDiversity(rows(), Seq("zip", "age_band"), "diag")
      .collect().map(r => r.getInt(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(ld(10) === ((3L, 2L)))   // k-safe and diverse
    assert(ld(20) === ((2L, 1L)))   // k-safe at k=2, but l-diversity fails at l=2
    assert(ld(30) === ((1L, 1L)))
  }

  test("generalizing a QI column repairs k-anonymity (the audit→fix loop)") {
    val coarse = rows().withColumn("zip2", ($"zip" / 10).cast("int") * 10 / 100)
    // collapse all zips into one band: single class of 6
    val hist = Anonymity.sizeHistogram(
      rows().withColumn("zip_any", lit("*")), Seq("zip_any"), k = 2L).collect()
    assert(hist.length === 1 && hist.head.getLong(0) === 6L
      && hist.head.getLong(3) === 0L)
    assert(coarse.count() === 6L) // the derived-column path stays a plain column
  }
}
