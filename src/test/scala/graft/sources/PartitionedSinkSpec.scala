package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Dynamic partition overwrite (sources/PartitionedSink): re-writing
  * one partition's slice replaces exactly that partition, static mode
  * replaces everything, re-runs are idempotent, and the layout prunes
  * partition-predicate reads at the file listing.
  */
class PartitionedSinkSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "en", "alpha"), (2L, "en", "bravo"),
    (3L, "de", "gamma"), (4L, "fr", "delta"))
    .toDF("doc_id", "lang", "text")

  test("dynamic overwrite replaces only the partitions present in the frame") {
    val dir = Files.createTempDirectory("psink").toString + "/t"
    PartitionedSink.overwritePartitions(corpus, dir, Seq("lang"))
    // daily re-run recomputes ONLY lang=en, with a changed row set
    val enFix = Seq((1L, "en", "alpha-v2"), (9L, "en", "echo"))
      .toDF("doc_id", "lang", "text")
    PartitionedSink.overwritePartitions(enFix, dir, Seq("lang"))
    val got = spark.read.parquet(dir)
      .select($"doc_id", $"lang", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(got === Set(
      (1L, "en", "alpha-v2"), (9L, "en", "echo"),  // replaced slice
      (3L, "de", "gamma"), (4L, "fr", "delta")))   // untouched partitions survive
  }

  test("dynamic re-run of the same slice is idempotent (one copy, not append)") {
    val dir = Files.createTempDirectory("psink2").toString + "/t"
    PartitionedSink.overwritePartitions(corpus, dir, Seq("lang"))
    PartitionedSink.overwritePartitions(corpus.filter($"lang" === "en"), dir, Seq("lang"))
    PartitionedSink.overwritePartitions(corpus.filter($"lang" === "en"), dir, Seq("lang"))
    assert(spark.read.parquet(dir).count() === 4L)
  }

  test("static replaceAll destroys unrepresented partitions (the explicit foot-gun)") {
    val dir = Files.createTempDirectory("psink3").toString + "/t"
    PartitionedSink.overwritePartitions(corpus, dir, Seq("lang"))
    PartitionedSink.replaceAll(corpus.filter($"lang" === "en"), dir, Seq("lang"))
    val langs = spark.read.parquet(dir).select("lang").distinct()
      .collect().map(_.getString(0)).toSet
    assert(langs === Set("en"))
  }

  test("partition-column predicates prune at the listing (PartitionFilters, no data filter)") {
    val dir = Files.createTempDirectory("psink4").toString + "/t"
    PartitionedSink.overwritePartitions(corpus, dir, Seq("lang"))
    val q = spark.read.parquet(dir).filter($"lang" === "en")
    val physical = q.queryExecution.executedPlan.toString
    assert(physical.contains("PartitionFilters") &&
      physical.contains("lang"), s"no partition pruning:\n$physical")
    assert(q.count() === 2L)
    // the scan's read schema must NOT carry lang as a data column —
    // it is directory metadata, zero bytes read for it
    assert(physical.contains("ReadSchema") &&
      !physical.replaceAll("(?s).*ReadSchema: ([^\\n]*).*", "$1").contains("lang"),
      s"lang read as data, not partition metadata:\n$physical")
  }
}
