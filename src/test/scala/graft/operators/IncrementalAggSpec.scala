package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IncrementalAggSpec extends SparkSpec {

  test("merged moments equal one-shot aggregation, including variance") {
    import spark.implicits._
    val data = (1 to 3000).map(i => (s"k${i % 3}", (i % 100) * 1.5)).toDF("k", "v")
    val parts = Seq(
      data.filter($"v" < 60), data.filter($"v" >= 60 && $"v" < 100), data.filter($"v" >= 100))
    val states = parts.map(IncrementalAgg.momentsState(_, Seq("k"), "v"))
    val inc = IncrementalAgg.finalize(IncrementalAgg.merge(states, Seq("k")), Seq("k"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    val batch = data.groupBy($"k")
      .agg(count($"v").as("n"), avg($"v").as("m"), var_samp($"v").as("vs"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    for ((k, (n, m, vs)) <- batch) {
      val (ni, mi, vi) = inc(k)
      assert(ni === n)
      assert(math.abs(mi - m) < 1e-9, s"$k mean $mi vs $m")
      assert(math.abs(vi - vs) / vs < 1e-9, s"$k var $vi vs $vs")
    }
  }

  test("n=1 keys report null variance, n=0 keys absent") {
    import spark.implicits._
    val one = Seq(("solo", 5.0)).toDF("k", "v")
    val fin = IncrementalAgg.finalize(
      IncrementalAgg.momentsState(one, Seq("k"), "v"), Seq("k")).collect()
    assert(fin.length === 1)
    assert(fin.head.getLong(1) === 1L)
    assert(fin.head.isNullAt(3))   // var_samp
  }

  test("constant-valued keys report zero variance, never NaN") {
    import spark.implicits._
    // raw moments cancel to a tiny NEGATIVE for constants (0.1*3)
    val const = Seq(("c", 0.1), ("c", 0.1), ("c", 0.1)).toDF("k", "v")
    val fin = IncrementalAgg.finalize(
      IncrementalAgg.momentsState(const, Seq("k"), "v"), Seq("k")).head
    assert(fin.getDouble(3) === 0.0)            // var_samp
    assert(fin.getDouble(4) === 0.0)            // stddev_samp, not NaN
  }

  test("streaming foreachBatch + Upsert maintains the view across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

    // the materialized view: per-key moment state, upserted each batch
    var view = IncrementalAgg.momentsState(
      Seq.empty[(String, Double)].toDF("k", "v"), Seq("k"), "v")

    val mem = MemoryStream[(String, Double)]
    val q = mem.toDS().toDF("k", "v").writeStream
      .outputMode("update")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val delta = IncrementalAgg.momentsState(batch, Seq("k"), "v")
        view = IncrementalAgg.merge(Seq(view, delta), Seq("k"))
          .localCheckpoint(true)   // truncate lineage per refresh
        ()
      }.start()
    try {
      mem.addData(("a", 1.0), ("a", 3.0), ("b", 10.0))
      q.processAllAvailable()
      mem.addData(("a", 5.0), ("c", 7.0))
      q.processAllAvailable()
    } finally q.stop()

    val fin = IncrementalAgg.finalize(view, Seq("k"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(fin("a") === ((3L, 3.0)))   // mean of 1,3,5
    assert(fin("b") === ((1L, 10.0)))
    assert(fin("c") === ((1L, 7.0)))
  }

  test("distinct-count state maintains incrementally: merged deltas equal one-shot") {
    import spark.implicits._
    // two "days" of per-group key arrivals with cross-batch overlap
    val day1 = ((0L until 500L).map(i => ("g1", i)) ++
      (0L until 200L).map(i => ("g2", i))).toDF("k", "id")
    val day2 = ((300L until 800L).map(i => ("g1", i)) ++
      (0L until 200L).map(i => ("g2", i))).toDF("k", "id")  // g2: pure replay
    val merged = IncrementalAgg.mergeDistinct(
      Seq(IncrementalAgg.distinctState(day1, Seq("k"), "id"),
        IncrementalAgg.distinctState(day2, Seq("k"), "id")), Seq("k"))
    val oneShot = IncrementalAgg.distinctState(
      day1.unionByName(day2), Seq("k"), "id")
    val m = merged.collect().map(r => r.getString(0) -> r.getSeq[Int](1)).toMap
    val o = oneShot.collect().map(r => r.getString(0) -> r.getSeq[Int](1)).toMap
    assert(m === o, "maintained registers must equal the unsplit-history sketch")
    val est = IncrementalAgg.finalizeDistinct(merged, Seq("k"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(est("g1") - 800.0) / 800.0 < 0.10)  // 0..799 distinct
    assert(math.abs(est("g2") - 200.0) / 200.0 < 0.10)  // replay adds nothing
  }
}
