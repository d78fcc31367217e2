package graft.operators

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {

  test("zvalue: Morton bit interleave, dimension 0 most significant") {
    import spark.implicits._
    // a=1010₂, b=0101₂ with 4 bits → a3 b3 a2 b2 a1 b1 a0 b0 = 10011001₂ = 153
    val z = Seq((10, 5)).toDF("a", "b")
      .select(ZOrder.zvalue(Seq($"a", $"b"), 4).as("z"))
      .head.getLong(0)
    assert(z === 153L)
    // single dimension degenerates to identity
    val zid = Seq(Tuple1(11)).toDF("a")
      .select(ZOrder.zvalue(Seq($"a"), 4).as("z")).head.getLong(0)
    assert(zid === 11L)
  }

  test("clustered layout: 2-dim range predicate touches few files, plain touches most") {
    import spark.implicits._
    // row-major 100×100 grid: x and y independent, each (x, y) once
    val df = (0 until 10000)
      .map(i => (i.toLong, (i % 100).toDouble, (i / 100).toDouble))
      .toDF("id", "x", "y")
    val plainDir = Files.createTempDirectory("graft-plain").toString
    val zDir = Files.createTempDirectory("graft-zorder").toString
    df.repartition(16).write.mode("overwrite").parquet(plainDir)
    ZOrder.cluster(df, Seq("x", "y"), bits = 4, numFiles = 16)
      .write.mode("overwrite").parquet(zDir)

    def probe(dir: String): (Long, Long) = {
      val hit = spark.read.parquet(dir)
        .filter($"x".between(10, 15) && $"y".between(20, 25))
      (hit.count(), hit.select(input_file_name()).distinct().count())
    }
    val (plainRows, plainFiles) = probe(plainDir)
    val (zRows, zFiles) = probe(zDir)

    assert(plainRows === zRows)              // layout never changes answers
    assert(plainRows > 0)
    // hash layout smears matches over ~every file; the z layout
    // confines the 2-dim range to a handful of contiguous-z files
    assert(plainFiles >= 12, s"plain layout unexpectedly clustered: $plainFiles files")
    assert(zFiles <= 4, s"z layout not clustered enough: $zFiles files")
  }

  test("ensureClustered is idempotent via the success marker") {
    import spark.implicits._
    val df = (0 until 100).map(i => (i.toLong, i.toDouble, (99 - i).toDouble))
      .toDF("id", "x", "y")
    val dir = Files.createTempDirectory("graft-zcache").resolve("art").toString
    ZOrder.ensureClustered(df, Seq("x", "y"), dir, bits = 2, numFiles = 2)
    val stamp = Files.getLastModifiedTime(java.nio.file.Paths.get(dir, "_SUCCESS"))
    ZOrder.ensureClustered(df, Seq("x", "y"), dir, bits = 2, numFiles = 2)
    assert(Files.getLastModifiedTime(java.nio.file.Paths.get(dir, "_SUCCESS")) === stamp)
    assert(spark.read.parquet(dir).count() === 100)
  }
}
