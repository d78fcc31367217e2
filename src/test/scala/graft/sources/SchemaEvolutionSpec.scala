package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Schema evolution on read: a long-lived dataset accumulates files
  * written under different schema versions (columns added over time).
  * `mergeSchema` unions the footer schemas so old files read with
  * nulls for columns they predate — the contract an append-only
  * 100 TB corpus depends on when its pipeline gains a field.
  */
class SchemaEvolutionSpec extends SparkSpec {

  test("mergeSchema reads v1+v2 files; v1 rows null-fill the new column") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-evolve").toString
    Seq((1L, "a"), (2L, "b")).toDF("id", "name")
      .write.mode("append").parquet(dir)
    Seq((3L, "c", 0.9)).toDF("id", "name", "quality")
      .write.mode("append").parquet(dir)

    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.sorted.toSeq === Seq("id", "name", "quality"))
    assert(merged.count() === 3)
    assert(merged.filter($"quality".isNull).count() === 2)   // v1 rows
    assert(merged.filter($"quality" === 0.9).select($"id").head.getLong(0) === 3L)
  }
}
