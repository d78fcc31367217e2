package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpec {

  test("assign: start-offset packing within a shard, straddlers stay whole") {
    import spark.implicits._
    // one shard; budget 10; token runs 4,4,4,4 → cum 4,8,12,16;
    // starts 0,4,8,12 → packs 0,0,0,1 (doc 3 starts at offset 8 < 10,
    // so it STRADDLES the boundary and still belongs to pack 0)
    val docs = Seq((1L, 4), (2L, 4), (3L, 4), (4L, 4)).toDF("id", "n")
    val got = Packing.assign(docs, "id", "n", budget = 10, shards = 1)
      .select($"id", $"shard", $"pack_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set((1L, 0L, 0L), (2L, 0L, 0L), (3L, 0L, 0L), (4L, 0L, 1L)))
  }

  test("manifest: pack token mass conserved, sharding deterministic") {
    import spark.implicits._
    val docs = (1L to 200L).map(i => (i, 100 + (i % 7).toInt * 50)).toDF("id", "n")
    val m = Packing.manifest(docs, "id", "n", budget = 1024, shards = 4)
    // every token lands in exactly one pack
    val packed = m.agg(sum($"pack_tokens")).head.getLong(0)
    val total = docs.agg(sum($"n")).head.getLong(0)
    assert(packed === total)
    // shards are id mod 4
    val shards = m.select($"shard").distinct().collect().map(_.getLong(0)).toSet
    assert(shards === Set(0L, 1L, 2L, 3L))
    // a pack overflows the budget only by its straddling last doc:
    // pack_tokens < budget + max doc size
    val maxPack = m.agg(max($"pack_tokens")).head.getLong(0)
    assert(maxPack < 1024 + 400, s"pack too fat: $maxPack")
    // deterministic: second run identical
    val again = Packing.manifest(docs, "id", "n", budget = 1024, shards = 4)
    assert(m.orderBy($"shard", $"pack_id").collect().toSeq ===
      again.orderBy($"shard", $"pack_id").collect().toSeq)
  }

  test("packs fill greedily: all but the last pack per shard reach the budget") {
    import spark.implicits._
    val docs = (1L to 1000L).map(i => (i, 37)).toDF("id", "n")
    val m = Packing.manifest(docs, "id", "n", budget = 512, shards = 2).cache()
    val lastPerShard = m.groupBy($"shard").agg(max($"pack_id").as("last"))
    val nonLast = m.join(lastPerShard, Seq("shard"))
      .filter($"pack_id" =!= $"last")
    // a non-final pack always straddles into the next budget boundary:
    // its token mass is at least the budget minus one doc's tail
    val minNonLast = nonLast.agg(min($"pack_tokens")).head.getLong(0)
    assert(minNonLast >= 512 - 37, s"under-filled non-final pack: $minNonLast")
    m.unpersist()
  }
}
