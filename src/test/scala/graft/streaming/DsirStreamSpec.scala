package graft.streaming

import graft.SparkSpec
import graft.operators.Dsir
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** DSIR importance scoring on a stream — the deployment shape of
  * [[Dsir]]: the ratio LUT is trained in batch (a corpus-level
  * statistic), and per-document scoring is a STATELESS narrow
  * projection (array literal + integer sums), so the same scoreDocs
  * call runs unchanged on a streaming DataFrame — the [[ScoreStream]]
  * discipline for the distribution-matching filter. Resampling stays
  * batch (top-k is a corpus-level decision); a streaming deployment
  * thresholds qlogw instead, exactly like q135's learned gate.
  */
class DsirStreamSpec extends SparkSpec {

  test("stream scoring with a batch-trained LUT is bit-identical to batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val corpus = ((0 until 30).map(i => (i.toLong, s"alpha beta gamma w$i", "en")) ++
      (0 until 30).map(i => (100L + i, s"zebra yak xylo u$i", "de")))
      .toDF("doc_id", "text", "lang")
    val qlr = Dsir.quantizedLogRatios(
      Dsir.bucketCounts(corpus, "text", col("lang") === "en"))

    val batchScores = Dsir.scoreDocs(corpus, "text", qlr)
      .select($"doc_id", $"n_bigrams", $"qlogw")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

    val mem = MemoryStream[(Long, String, String)]
    val seen = scala.collection.mutable.Map[Long, (Long, Long)]()
    val q = Dsir.scoreDocs(
        mem.toDF().toDF("doc_id", "text", "lang"), "text", qlr)
      .select($"doc_id", $"n_bigrams", $"qlogw")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.collect().foreach(r =>
          seen(r.getLong(0)) = (r.getLong(1), r.getLong(2)))
        ()
      }
      .outputMode(OutputMode.Append).trigger(Trigger.ProcessingTime(0)).start()
    try {
      val rows = corpus.collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      mem.addData(rows.take(25).toIndexedSeq: _*)
      q.processAllAvailable()
      mem.addData(rows.drop(25).toIndexedSeq: _*)
      q.processAllAvailable()
      assert(seen.toMap === batchScores)
    } finally q.stop()
  }
}
