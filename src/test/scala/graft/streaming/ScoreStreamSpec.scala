package graft.streaming

import graft.SparkSpec
import graft.operators.LogReg
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

class ScoreStreamSpec extends SparkSpec {
  import ScoreStream.VecDoc

  private val sf = "/root/testdata/sf0.001"

  test("stream scoring is bit-identical to batch scoring across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // q128's exact configuration: one-vs-rest label 0, 8 iterations,
    // eta 1/2, posWeight 9
    val embs = graft.Tables.embeddings(spark, sf)
      .withColumn("y", org.apache.spark.sql.functions.expr(
        "CASE WHEN label = 0 THEN 1 ELSE 0 END"))
    val model = LogReg.train(embs, "embedding", "y", 8, 2L, 9L)
    val batch = LogReg.scoreAll(embs, "vec_id", "embedding", "y", model)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(batch.nonEmpty)

    val docs = embs.selectExpr("CAST(vec_id AS LONG)", "embedding", "y")
      .as[(Long, Array[Float], Int)].collect()
      .map { case (id, v, y) => VecDoc(id, v, y) }
    val mem = MemoryStream[VecDoc]
    val q = ScoreStream.scored(mem.toDS(), model)
      .writeStream.format("memory").queryName("score_out")
      .outputMode(OutputMode.Append).trigger(Trigger.ProcessingTime(0)).start()
    try {
      docs.grouped(math.max(1, docs.length / 3 + 1)).foreach { chunk =>
        mem.addData(chunk.toSeq)
        q.processAllAvailable()
      }
      val streamed = spark.table("score_out")
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      assert(streamed === batch, "stateless scoring must be stream/batch exact")
      assert(spark.table("score_out").count() === batch.size) // no duplicates
    } finally q.stop()
  }

  test("kept() gates exactly the predicted-positive rows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val model = LogReg.Model(Array(LogReg.WeightScale, 0L)) // w = [1.0, bias 0]
    val docs = Seq(VecDoc(1L, Array(0.5f), -1), VecDoc(2L, Array(-0.5f), -1))
    val mem = MemoryStream[VecDoc]
    val q = ScoreStream.kept(mem.toDS(), model)
      .writeStream.format("memory").queryName("kept_out")
      .outputMode(OutputMode.Append).trigger(Trigger.ProcessingTime(0)).start()
    try {
      mem.addData(docs)
      q.processAllAvailable()
      val ids = spark.table("kept_out").select("id").as[Long].collect().toSeq
      assert(ids == Seq(1L), "only the positive-margin row passes the gate")
    } finally q.stop()
  }
}
