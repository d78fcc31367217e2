package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

import scala.util.Random

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("overlapJoin equals the naive inequality join (randomized)") {
    val rnd = new Random(42)
    val left = (1 to 300).map { i =>
      val s = rnd.nextInt(1000); (i.toLong, s.toLong, (s + rnd.nextInt(20)).toLong)
    }.toDF("lid", "ls", "le")
    val right = (1 to 200).map { i =>
      val s = rnd.nextInt(1000); (i.toLong, s.toLong, (s + rnd.nextInt(30)).toLong)
    }.toDF("rid", "rs", "re")

    val grid = RangeJoin.overlapJoin(left, "ls", "le", right, "rs", "re", binWidth = 16)
      .select($"lid", $"rid")
    val naive = left.join(right, $"ls" <= $"re" && $"rs" <= $"le")
      .select($"lid", $"rid")
    assert(grid.count() === naive.count())          // exactly-once emission
    assert(grid.except(naive).isEmpty && naive.except(grid).isEmpty)
  }

  test("overlapJoin emits each pair once even when intervals span many bins") {
    val left = Seq((1L, 0L, 100L)).toDF("lid", "ls", "le")     // 26 bins at w=4
    val right = Seq((1L, 50L, 60L), (2L, 200L, 210L)).toDF("rid", "rs", "re")
    val out = RangeJoin.overlapJoin(left, "ls", "le", right, "rs", "re", binWidth = 4)
    assert(out.select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      === Seq((1L, 1L)))
  }

  test("overlapJoin plans as a shuffled EQUI-join on the bin — never a nested-loop product") {
    val left = (1 to 50).map(i => (i.toLong, i.toLong, i + 5L)).toDF("lid", "ls", "le")
    val right = (1 to 50).map(i => (i.toLong, i.toLong, i + 3L)).toDF("rid", "rs", "re")
    val out = RangeJoin.overlapJoin(left, "ls", "le", right, "rs", "re", binWidth = 8)
    out.collect()  // execute so the AQE final plan materializes
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join fell back to a product plan:\n$plan")
  }

  test("pointInInterval matches the naive formulation") {
    val rnd = new Random(7)
    val pts = (1 to 500).map(i => (i.toLong, rnd.nextInt(1000).toLong)).toDF("pid", "p")
    val ivs = (1 to 100).map { i =>
      val s = rnd.nextInt(1000); (i.toLong, s.toLong, (s + rnd.nextInt(50)).toLong)
    }.toDF("iid", "rs", "re")
    val grid = RangeJoin.pointInInterval(pts, "p", ivs, "rs", "re", binWidth = 32)
      .select($"pid", $"iid")
    val naive = pts.join(ivs, $"p" >= $"rs" && $"p" <= $"re").select($"pid", $"iid")
    assert(grid.count() === naive.count())
    assert(grid.except(naive).isEmpty && naive.except(grid).isEmpty)
  }
}
