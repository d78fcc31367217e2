package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkSpec {

  test("salted join equals the plain join, row for row") {
    import spark.implicits._
    // 90% of fact rows hit key 7
    val fact = (0 until 5000)
      .map(i => (i.toLong, if (i % 10 != 0) 7L else (i % 20).toLong, i * 1.0))
      .toDF("row_id", "k", "v")
    val dim = (0L until 20L).map(k => (k, s"attr_$k")).toDF("k", "attr")
    val salted = SkewJoin.saltedJoin(fact, "row_id", dim, "k", salts = 16)
      .select($"row_id", $"k", $"v", $"attr")
      .collect().map(_.toSeq).sortBy(_.toString)
    val plain = fact.join(dim, "k").select($"row_id", $"k", $"v", $"attr")
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(salted.toSeq === plain.toSeq)
  }

  test("the hot key spreads across many (key, salt) shuffle groups") {
    import spark.implicits._
    val fact = (0 until 5000)
      .map(i => (i.toLong, 7L, i * 1.0)).toDF("row_id", "k", "v")
    val used = fact
      .withColumn("__salt", pmod(hash($"row_id"), lit(16)))
      .select($"__salt").distinct().count()
    assert(used === 16L, s"hot key used only $used of 16 salts")
  }

  test("build rows replicate exactly once per salt (no dup, no loss)") {
    import spark.implicits._
    val fact = (0 until 100).map(i => (i.toLong, (i % 5).toLong)).toDF("row_id", "k")
    val dim = (0L until 5L).map(k => (k, k * 10)).toDF("k", "d")
    val joined = SkewJoin.saltedJoin(fact, "row_id", dim, "k", salts = 4)
    assert(joined.count() === 100)   // every fact row exactly one match
  }
}
