package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

import scala.util.Random

class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  private def mutate(s: String, rnd: Random): String = {
    val i = rnd.nextInt(s.length)
    rnd.nextInt(3) match {
      case 0 => s.updated(i, ('a' + rnd.nextInt(26)).toChar)          // substitute
      case 1 => s.substring(0, i) + s.substring(math.min(i + 1, s.length)) // delete
      case _ => s.substring(0, i) + ('a' + rnd.nextInt(26)).toChar + s.substring(i) // insert
    }
  }

  test("editDistancePairs equals brute force on a typo corpus (tau=1 and 2)") {
    val rnd = new Random(11)
    val base = (1 to 60).map(_ => (1 to 8).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString)
    // plant typo variants of some strings, plus exact-distinct noise
    val strs = (base ++ base.take(20).map(mutate(_, rnd)) ++
      base.take(5).map(s => mutate(mutate(s, rnd), rnd))).distinct
    val df = strs.toDF("s")
    for (tau <- Seq(1, 2)) {
      val fast = FuzzyJoin.editDistancePairs(spark, df, "s", tau = tau)
        .select($"name_a", $"name_b")
      val naive = df.as("a").join(df.as("b"),
          $"a.s" < $"b.s" && levenshtein($"a.s", $"b.s") <= tau)
        .select($"a.s".as("name_a"), $"b.s".as("name_b"))
      assert(fast.count() === naive.count(), s"tau=$tau count")
      assert(fast.except(naive).isEmpty && naive.except(fast).isEmpty, s"tau=$tau set")
    }
  }

  test("strings shorter than q are handled (whole string as its gram)") {
    val df = Seq("a", "b", "ab", "ax").toDF("s")
    val out = FuzzyJoin.editDistancePairs(spark, df, "s", tau = 1)
      .select($"name_a", $"name_b").collect().map(r => (r.getString(0), r.getString(1))).toSet
    val naive = Set(("a", "b"), ("a", "ab"), ("a", "ax"), ("ab", "ax"), ("ab", "b"))
    assert(out === naive)
  }

  test("candidate generation is an equi-join on prefix ranks, not a product") {
    val rnd = new Random(13)
    val strs = (1 to 200).map(_ => (1 to 10).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString).distinct
    val out = FuzzyJoin.editDistancePairs(spark, strs.toDF("s"), "s", tau = 1)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"fuzzy join fell back to a product plan:\n$plan")
  }

  test("prefix join avoids the stop-gram blowup: candidates stay near true pairs") {
    // 500 strings sharing a common prefix "the" — joining on ALL grams
    // would pair everything with everything through "th"/"he"
    val rnd = new Random(3)
    val strs = (1 to 500).map(i => "the" + (1 to 10).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString).distinct
    val out = FuzzyJoin.editDistancePairs(spark, strs.toDF("s"), "s", tau = 1)
    // random 10-char suffixes: essentially no true pairs expected
    assert(out.count() <= 5)
  }
}
