package graft.functions

import graft.SparkSpec
import graft.pipeline.VectorSearch
import org.apache.spark.sql.functions._

class CosineSimilaritySpec extends SparkSpec {

  test("native expression matches composed zip_with/aggregate form bit-for-bit") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val r = new scala.util.Random(3)
    val df = (0 until 200).map { i =>
      (i.toLong, Array.fill(64)(r.nextGaussian().toFloat), Array.fill(64)(r.nextGaussian().toFloat))
    }.toDF("id", "a", "b")
    val both = df.select(
      GraftFunctions.cosine_sim($"a", $"b").as("native"),
      VectorSearch.cosineSim($"a", $"b").as("composed")
    ).collect()
    both.foreach { row =>
      assert(java.lang.Double.doubleToLongBits(row.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(row.getDouble(1)))
    }
  }

  test("SQL registration, nulls, length mismatch, double arrays") {
    import spark.implicits._
    GraftFunctions.register(spark)
    Seq((Seq(1.0, 0.0), Seq(1.0, 0.0))).toDF("a", "b").createOrReplaceTempView("v")
    assert(spark.sql("SELECT cosine_sim(a, b) FROM v").head().getDouble(0) === 1.0)
    val res = Seq((Seq(1.0f, 2.0f), Seq(1.0f, 2.0f, 3.0f))).toDF("a", "b")
      .select(GraftFunctions.cosine_sim($"a", $"b")).head()
    assert(res.isNullAt(0))                       // length mismatch → null
    val nullRes = spark.sql("SELECT cosine_sim(CAST(NULL AS ARRAY<FLOAT>), array(CAST(1.0 AS FLOAT)))").head()
    assert(nullRes.isNullAt(0))
  }

  test("null ELEMENT null-poisons to null, matching the composed form") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val df = spark.sql(
      "SELECT array(CAST(1.0 AS DOUBLE), CAST(NULL AS DOUBLE)) AS a, " +
        "array(CAST(1.0 AS DOUBLE), CAST(2.0 AS DOUBLE)) AS b")
    val native = df.select(GraftFunctions.cosine_sim($"a", $"b")).head()
    val composed = df.select(VectorSearch.cosineSim($"a", $"b")).head()
    assert(composed.isNullAt(0))                  // zip_with null-poisons
    assert(native.isNullAt(0))                    // expression must agree
    // null on either side, interpreted path too
    val flipped = df.select(GraftFunctions.cosine_sim($"b", $"a")).head()
    assert(flipped.isNullAt(0))
  }

  test("extensions class injects the function into a fresh session") {
    val s2 = SparkSpec.session.newSession()
    new GraftExtensions().apply(
      new org.apache.spark.sql.SparkSessionExtensions) // construct smoke (injection API)
    GraftFunctions.register(s2)
    assert(s2.sql("SELECT cosine_sim(array(CAST(1.0 AS FLOAT)), array(CAST(1.0 AS FLOAT)))")
      .head().getDouble(0) === 1.0)
  }
}
