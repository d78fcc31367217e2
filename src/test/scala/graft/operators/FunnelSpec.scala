package graft.operators

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int) = new Timestamp(minute * 60000L)

  private val stages = Seq(
    Funnel.Stage("a", col("et") === "a"),
    Funnel.Stage("b", col("et") === "b", withinSeconds = 600),  // 10 min
    Funnel.Stage("c", col("et") === "c", withinSeconds = 600))

  test("funnel picks first qualifying event per stage, honors windows") {
    val events = Seq(
      // u1: full conversion — a@0, b@5 (in window), c@12 (in window of b)
      (1L, "a", ts(0)), (1L, "b", ts(5)), (1L, "c", ts(12)),
      // u2: b outside 10-min window → stages b,c null even though c exists
      (2L, "a", ts(0)), (2L, "b", ts(20)), (2L, "c", ts(22)),
      // u3: two b's — the EARLIEST in-window one wins; c within window of b@4
      (3L, "a", ts(0)), (3L, "b", ts(4)), (3L, "b", ts(8)), (3L, "c", ts(9)),
      // u4: never saw a — not in the frame at all
      (4L, "b", ts(1)), (4L, "c", ts(2)),
      // u5: b strictly-after rule — b at the same instant as a does NOT count
      (5L, "a", ts(0)), (5L, "b", ts(0)), (5L, "c", ts(3))
    ).toDF("uid", "et", "t")
    val per = Funnel.funnel(events, col("uid"), col("t"), stages)
      .orderBy("entity").collect()
    assert(per.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L, 5L))
    val byU = per.map(r => r.getLong(0) -> r).toMap
    assert(byU(1L).getTimestamp(2) === ts(5) && byU(1L).getTimestamp(3) === ts(12))
    assert(byU(2L).isNullAt(2) && byU(2L).isNullAt(3))
    assert(byU(3L).getTimestamp(2) === ts(4) && byU(3L).getTimestamp(3) === ts(9))
    assert(byU(5L).isNullAt(2) && byU(5L).isNullAt(3))
  }

  test("funnelStats counts reached entities and rounds conversion") {
    val events = Seq(
      (1L, "a", ts(0)), (1L, "b", ts(5)), (1L, "c", ts(12)),
      (2L, "a", ts(0)), (2L, "b", ts(20)),
      (3L, "a", ts(0)), (3L, "b", ts(4))
    ).toDF("uid", "et", "t")
    val per = Funnel.funnel(events, col("uid"), col("t"), stages)
    val stats = Funnel.funnelStats(per, stages).collect()
    assert(stats.map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq ===
      Seq((1, "a", 3L), (2, "b", 2L), (3, "c", 1L)))
    assert(stats.map(_.getDouble(3)).toSeq === Seq(1.0, 0.6667, 0.3333))
  }
}
