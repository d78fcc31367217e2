package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Randomized equivalence pins for the round-13 optimizer rules: a
  * session WITH the rules installed must return exactly the rows a
  * plain session returns, across random corpora, thresholds, and
  * predicate polarities — the adversarial check that the band
  * injection and the join-condition hoist are EQUIVALENCES, not just
  * plausible rewrites on the hand-picked spec fixtures.
  */
class Round13PropertiesSpec extends SparkSpec {

  private lazy val installed = {
    val s = spark.newSession()
    GraftOptimizations.install(s)
    s
  }
  private lazy val plain = spark.newSession()

  /** One random corpus, parquet round-tripped so both sessions scan
    * identical bytes and literals don't constant-fold away. */
  private def corpus(seed: Int, n: Int): String = {
    val rnd = new scala.util.Random(seed)
    val vocab = Vector("a", "b", "c", "d", "e", "f", "g", "h", "spark", "rows")
    val rows = (1 to n).map { i =>
      val len = rnd.nextInt(12) // 0 => whitespace-only text
      val words = Seq.fill(len)(vocab(rnd.nextInt(vocab.size)))
      (i.toLong, if (words.isEmpty) "  " else words.mkString(" "))
    }
    val tmp = java.nio.file.Files.createTempDirectory(s"r13prop$seed").toString
    import spark.implicits._
    rows.toDF("id", "t").write.mode("overwrite").parquet(tmp)
    tmp
  }

  private val tok =
    "array_distinct(filter(split(trim(%s), '\\\\s+'), x -> x <> ''))"
  private def jac(a: String, b: String) =
    s"cast(size(array_intersect(${tok.format(a)}, ${tok.format(b)})) as double)" +
      s" / size(array_union(${tok.format(a)}, ${tok.format(b)}))"

  test("jaccard band + hoist: installed ≡ plain on random joins across " +
    "thresholds and polarities") {
    val rnd = new scala.util.Random(131)
    for (case_ <- 1 to 8) {
      val path = corpus(seed = 1000 + case_, n = 10 + rnd.nextInt(15))
      val t = math.max(0.05, math.round(rnd.nextDouble() * 19) / 20.0)
      val op = Seq(">=", ">")(rnd.nextInt(2))
      val negate = rnd.nextBoolean()
      def run(s: org.apache.spark.sql.SparkSession): Set[(Long, Long)] = {
        // empty-token rows are excluded so ANSI 0/0 cannot throw —
        // the error-preservation case has its own dedicated spec
        val d = s.read.parquet(path)
          .filter(expr("size(filter(split(trim(t), '\\\\s+'), x -> x <> '')) > 0"))
        val l = d.select(col("id").as("ia"), col("t").as("ta"))
        val r = d.select(col("id").as("ib"), col("t").as("tb"))
        val base = s"${jac("ta", "tb")} $op $t"
        val cond = expr(s"ia < ib AND ${if (negate) s"NOT ($base)" else base}")
        l.join(r, cond).select("ia", "ib").collect()
          .map(x => (x.getLong(0), x.getLong(1))).toSet
      }
      val got = run(installed)
      val want = run(plain)
      assert(got === want,
        s"case $case_ diverged (t=$t, op=$op, negate=$negate): " +
          s"installed ${got.size} rows vs plain ${want.size}")
    }
  }

  test("levenshtein band: installed ≡ plain on random fuzzy joins") {
    val rnd = new scala.util.Random(137)
    for (case_ <- 1 to 6) {
      val words = Seq.fill(12 + rnd.nextInt(10))(
        Seq.fill(2 + rnd.nextInt(6))(('a' + rnd.nextInt(4)).toChar).mkString)
      val tmp = java.nio.file.Files.createTempDirectory(s"r13lev$case_").toString
      import spark.implicits._
      words.zipWithIndex.map { case (w, i) => (i.toLong, w) }
        .toDF("id", "w").write.mode("overwrite").parquet(tmp)
      val k = rnd.nextInt(4)
      def run(s: org.apache.spark.sql.SparkSession): Set[(Long, Long)] = {
        val d = s.read.parquet(tmp)
        val l = d.select(col("id").as("ia"), col("w").as("wa"))
        val r = d.select(col("id").as("ib"), col("w").as("wb"))
        l.join(r, expr(s"ia < ib AND levenshtein(wa, wb) <= $k"))
          .select("ia", "ib").collect()
          .map(x => (x.getLong(0), x.getLong(1))).toSet
      }
      assert(run(installed) === run(plain), s"case $case_ diverged at k=$k")
    }
  }
}
