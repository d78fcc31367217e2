package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LinkageSpec extends SparkSpec {
  import spark.implicits._

  private val fields = Seq(
    Linkage.Field("name", "name",
      (a, b) => levenshtein(a, b) <= 1, m = 0.9, u = 0.05),
    Linkage.Field("city", "city",
      (a, b) => a === b, m = 0.8, u = 0.2))

  private def people() = Seq(
    // block 1: a true duplicate pair (typo'd name, same city)
    (1L, 1, "jon smith", "berlin"),
    (2L, 1, "jon smyth", "berlin"),
    // block 1: an unrelated person
    (3L, 1, "maria lopez", "munich"),
    // block 2: same name, different city
    (4L, 2, "wei chen", "lyon"),
    (5L, 2, "wei chen", "paris")
  ).toDF("id", "blk", "name", "city")

  test("weights: agreement positive, disagreement negative, integer micro-nats") {
    val f = fields.head
    assert(f.wAgree === math.floor(math.log(0.9 / 0.05) * 1e6 + 0.5).toLong)
    assert(f.wAgree > 0 && f.wDisagree < 0)
  }

  test("blocked pairs: scores rank the planted duplicate first") {
    val pairs = Linkage.fsPairs(people(), "id", Seq("blk"), fields)
      .orderBy($"fs_score".desc, $"id_a", $"id_b").collect()
    // cross-block pairs never generated: 3 pairs in block 1, 1 in block 2
    assert(pairs.length === 4)
    val top = pairs.head
    assert((top.getLong(0), top.getLong(1)) === (1L, 2L))
    assert(top.getLong(2) === 1L && top.getLong(3) === 1L) // both fields agree
    val expected = fields.map(_.wAgree).sum
    assert(top.getLong(4) === expected)
    // (4,5): name agrees, city disagrees
    val p45 = pairs.find(r => r.getLong(0) == 4L).get
    assert(p45.getLong(4) === fields(0).wAgree + fields(1).wDisagree)
  }

  test("classify splits on the integer thresholds") {
    val scored = Linkage.fsPairs(people(), "id", Seq("blk"), fields)
      .withColumn("cls", Linkage.classify($"fs_score", 0L, 4000000L))
    val byPair = scored.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getString(5)).toMap
    assert(byPair((1L, 2L)) === "link")
    assert(byPair((4L, 5L)) === "possible")  // one strong agree, one disagree
    assert(byPair((1L, 3L)) === "nonlink")
  }

  test("refuses unblocked (n²) linkage") {
    intercept[IllegalArgumentException] {
      Linkage.fsPairs(people(), "id", Seq.empty, fields)
    }
  }

  test("layout-independent: same pairs and scores after repartition") {
    def run(df: org.apache.spark.sql.DataFrame) =
      Linkage.fsPairs(df, "id", Seq("blk"), fields)
        .orderBy($"id_a", $"id_b").collect().toSeq
    assert(run(people()) === run(people().repartition(5, $"name")))
  }
}
