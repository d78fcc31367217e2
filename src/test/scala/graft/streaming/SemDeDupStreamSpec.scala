package graft.streaming

import graft.SparkSpec
import graft.operators.{Dedup, KMeans}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

class SemDeDupStreamSpec extends SparkSpec {
  import SemDeDupStream.EmbDoc

  private val sf = "/root/testdata/sf0.001"

  // q119's exact configuration (ClusterQueries): k=8, 4 Lloyd
  // iterations, salt 118, threshold 0.4
  private def trained(): (KMeans.Model, org.apache.spark.sql.DataFrame) = {
    val embs = graft.Tables.embeddings(spark, sf)
    (KMeans.train(embs, "vec_id", "embedding", k = 8, iterations = 4, salt = 118L),
      embs)
  }

  test("stream replay reproduces batch q119 exactly (same model, same rows)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val (model, embs) = trained()
    // the batch side of q119 with the SAME pre-trained model: assign
    // cells, exact grid cosine within cells
    val batch = Dedup.cosineJoinGrid(
        KMeans.assignCells(embs, "vec_id", "embedding", model),
        "vec_id", "embedding", threshold = 0.4, blockCol = Some("cell"))
      .as[(Long, Long, Double)].collect().toSet
    assert(batch.nonEmpty) // q119 has 27 rows at sf0.01; sf0.001 plants some too

    val docs = embs.select($"vec_id".cast("long"), $"embedding")
      .as[(Long, Array[Float])].collect()
      .map { case (id, v) => EmbDoc(id, v) }

    val mem = MemoryStream[EmbDoc]
    // stateTtlMs = 0: a TTL schedules timeout-only batches that spin
    // processAllAvailable under Trigger.ProcessingTime(0)
    val q = SemDeDupStream.semanticPairs(mem.toDS(), model, threshold = 0.4,
        maxPerCell = 100000, stateTtlMs = 0)
      .writeStream.format("memory").queryName("semdedup_out")
      .outputMode(OutputMode.Append).trigger(Trigger.ProcessingTime(0)).start()
    try {
      // replay in three micro-batches: pairs must form across batch
      // boundaries via cell state, and the union must equal batch
      docs.grouped(math.max(1, docs.length / 3 + 1)).foreach { chunk =>
        mem.addData(chunk.toSeq)
        q.processAllAvailable()
      }
      val streamed = spark.table("semdedup_out")
        .as[(Long, Long, Double)].collect().toSet
      assert(streamed === batch,
        s"stream=${streamed.size} batch=${batch.size}; " +
          s"onlyStream=${(streamed -- batch).take(3)} onlyBatch=${(batch -- streamed).take(3)}")
      // exactly-once emission: one cell per doc → no duplicate rows
      assert(spark.table("semdedup_out").count() === streamed.size)
    } finally q.stop()
  }

  test("FIFO cap bounds state: flood of one topic still links, never n²") {
    import spark.implicits._
    val (model, _) = trained()
    // 120 near-identical vectors (one cell, all pairs > threshold):
    // with cap 2 each arrival sees ≤2 retained members
    val base = Array.tabulate(64)(i => (math.sin(i + 1) * 0.5).toFloat)
    val flood = (1L to 120L).map { id =>
      EmbDoc(id, base.map(x => x + (id % 7).toFloat * 1e-4f))
    }.toDS()
    val pairs = SemDeDupStream.semanticPairs(flood, model, threshold = 0.9,
        maxPerCell = 2)
      .collect()
    assert(pairs.length <= 120 * 2)
    val linked = pairs.flatMap(p => Seq(p.id_a, p.id_b)).toSet
    assert(linked.size >= 119)  // every doc still linked to a neighbor
  }
}
