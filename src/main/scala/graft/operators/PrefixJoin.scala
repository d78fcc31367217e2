package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Prefix-filtered exact set-similarity self-join (the AllPairs/
  * PPJoin candidate scheme — Bayardo et al. WWW'07, Xiao et al.
  * WWW'08): order every document's distinct tokens by GLOBAL RARITY
  * and join only on each document's first
  * `|A| − ⌈t·|A|⌉ + 1` tokens (its "prefix").
  *
  * Guarantee (prefix-filter lemma): if J(A,B) ≥ t, the first common
  * token in the global order lies inside BOTH prefixes — were it past
  * A's prefix, the overlap would fit in A's ⌈t·|A|⌉−1 suffix slots,
  * below the t·|A| floor that J ≥ t implies. So the prefix equi-join
  * loses nothing, and candidates concentrate on RARE tokens (df-
  * ascending order), whose inverted lists are short — the pruning
  * complements LSH banding (Dedup.minhashPairsExact): deterministic
  * full recall without signatures, best on dup-sparse corpora where
  * rare tokens discriminate.
  *
  * Scale shape:
  *  - the global order is a VOCABULARY-sized artifact (one df
  *    aggregate), ranked by sort + zipWithIndex — contiguous global
  *    ordinals with NO single-partition window (plan-pinned in
  *    PlanAuditSpec);
  *  - token→rank translation joins the exploded stream — broadcast
  *    while the vocabulary fits `maxBroadcastVocab`, shuffle join
  *    past it (a 100M-term vocabulary is not broadcastable) —
  *    re-grouped with sort_array (ranks are longs, so the verify
  *    merge compares longs, not strings);
  *  - candidate volume is Σ_token df_prefix(token)², bounded by the
  *    rarity ordering; the verify stage is q28's exact sorted-merge.
  */
object PrefixJoin {

  /** Shared candidate machinery for the prefix-filtered joins: the
    * per-doc rarity-ranked token arrays (id, ranks, nt, p) with
    * prefix length p = nt − ⌈t·nt⌉ + 1 — the same bound serves the
    * Jaccard lemma (first common token of a qualifying pair falls in
    * both prefixes) and the containment lemma (a set whose t-fraction
    * is covered must share a prefix token with its coverer). The
    * result is persist()ed — both joins read it ≥3 times.
    */
  private def rankedArrays(
      spark: SparkSession,
      docs: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double,
      pretokenized: Option[DataFrame],
      maxBroadcastVocab: Long): (DataFrame, Long, Long) = {
    import spark.implicits._

    // id kept in its NATIVE type (string ids are legal, as in
    // Dedup.jaccardPairs) — a long cast would NULL non-numeric ids
    // and silently collapse the corpus into one NULL-keyed group.
    // `pretokenized` (idCol + `toks` = sorted distinct xxhash64 token
    // arrays, the minhashPairsExact contract) shares one materialized
    // tokenization pass across the corpus's set-similarity operators
    // (q28/q78/q239 read the same artifact). Hashed tokens are a valid
    // feature set here: the prefix lemma needs only SOME fixed total
    // order over features, and df/rarity ranks of hashed tokens equal
    // those of the strings up to vanishing 64-bit collisions (the
    // same p < 1e-11/pair bound minhashPairsExact documents).
    val toks = pretokenized match {
      case Some(pt) =>
        graft.Par.spread(pt.select(col(idCol).as("id"), col("toks")))
          .select($"id", explode($"toks").as("tok"))
      case None =>
        graft.Par.spread(docs.select(col(idCol).as("id"), col(textCol)))
          .select($"id",
            explode(array_distinct(graft.functions.TextFunctions.tokens(col(textCol)))).as("tok"))
    }

    // global rarity order: df ascending, token as tie-break → one
    // unique long rank per vocabulary term. GlobalOrder.zipRank (sort
    // + zipWithIndex), NOT an unpartitioned row_number window: the
    // sorted frame stays range-partitioned and zipWithIndex numbers
    // it contiguously across partitions (partition order = range
    // order), so the vocabulary-sized ranking never serializes on one
    // task — at a 100M-term vocabulary the window form is a single-
    // partition bottleneck. (zipWithIndex runs its partition-size job
    // at build time; Bench times construction, so the cost stays
    // measured.) Row-generic so `tok` may be a string or a hashed
    // long.
    val (rank, vocabSize) = GlobalOrder.zipRankWithCount(
      toks.groupBy($"tok").agg(count(lit(1)).as("df"))
        .sort($"df", $"tok")
        .select($"tok"),
      "r")

    // token→rank translation: broadcast the vocabulary ONLY while it
    // is broadcast-sized (zipRankWithCount measured it for free) — a
    // 100M-term vocabulary is a multi-GB relation, and an
    // unconditional hint would force it onto every executor. Past the
    // threshold the hint is dropped and the planner/AQE picks the
    // shuffle join.
    val rankSide = if (vocabSize <= maxBroadcastVocab) broadcast(rank) else rank

    // per-doc rank array, ascending = rarest-first; prefix size
    // p = nt − ceil(t·nt) + 1
    val ranked = toks.join(rankSide, Seq("tok"))
      .groupBy($"id")
      .agg(sort_array(collect_list($"r")).as("ranks"))
      .withColumn("nt", size($"ranks"))
      .withColumn("p", ($"nt" - ceil(lit(threshold) * $"nt") + 1).cast("int"))
      // feeds candidates + two verify joins; storage released by the
      // caller's clearCache between queries (Bench/Verify do), the
      // repo-wide convention for operator-internal persists
      .persist()
    // eager count: one tokenize/rank build feeds ≥3 readers, and the
    // doc count + total token count gate the verify-side broadcast
    // (the r14 ×10 probe found the verify joins falling to sort-merge
    // past the 10 MB auto threshold — two full shuffles+sorts of the
    // candidate stream, ×43 wall for ×10 data; an explicit size-gated
    // hint keeps the doc-sized build side broadcast while it fits —
    // and the r14 ADVICE found a row-count-only gate blind to a
    // million docs each carrying a LARGE rank array)
    val org.apache.spark.sql.Row(nDocs: Long, totalToks: Long) = ranked
      .agg(count(lit(1)), coalesce(sum($"nt".cast("long")), lit(0L)))
      .head()
    (ranked, nDocs, totalToks)
  }

  /** Estimated broadcast bytes for the ranked doc table: 8 bytes per
    * long rank + ~64 bytes/row of array+id overhead, ×2 because the
    * verify stage broadcasts TWO projections (the _a and _b sides are
    * separate broadcast variables) — deliberately pessimistic (same
    * convention as Dedup.jaccardPairs). */
  private def estRankedBytes(nDocs: Long, totalToks: Long): Long =
    2L * (totalToks * 8L + nDocs * 64L)

  /** All pairs with exact Jaccard(token sets) > threshold:
    * (id_a, id_b, jaccard), r4-rounded. Output is identical to the
    * brute-force all-pairs join (and to minhashPairsExact at the same
    * threshold, up to its vanishing LSH miss probability).
    */
  def jaccardPairsPrefix(
      spark: SparkSession,
      docs: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double,
      pretokenized: Option[DataFrame] = None,
      maxBroadcastVocab: Long = 10000000L,
      maxBroadcastDocs: Long = 1000000L,
      maxBroadcastBytes: Long = 1L << 30): DataFrame = {
    import spark.implicits._
    require(threshold > 0 && threshold < 1, "threshold in (0,1)")
    graft.functions.SortedIntersectCount.register(spark)
    import graft.functions.SortedIntersectCount.sorted_intersect_count
    graft.functions.FirstCommonBounded.register(spark)
    import graft.functions.FirstCommonBounded.first_common_bounded

    val (ranked, _, _) = rankedArrays(spark, docs, idCol, textCol,
      threshold, pretokenized, maxBroadcastVocab)

    // FULLY FUSED candidate + verify join (r19; supersedes the r14
    // hydrate-then-verify shape — maxBroadcastDocs/Bytes kept in the
    // signature for callers but no longer consulted, there is no
    // verify join left to broadcast). Prefix rows carry their doc's
    // whole rank array (the array rides the SKINNY pre-join stream —
    // Σ prefix rows, linear — never the quadratic candidate stream),
    // so every filter runs INSIDE the join, cheapest first:
    //  - size band: least(na,nb) > t·greatest(na,nb) (J > t forces it);
    //  - PPJoin position filter: a shared token at 1-based positions
    //    (ia, ib) caps the overlap at ub = 1 + min(na−ia, nb−ib); for
    //    the FIRST shared token of a qualifying pair ub ≥ |A∩B| >
    //    t·(na+nb)/(1+t), so pruning rows with
    //    ub·(1+t) < t·(na+nb) − ε loses nothing (ε absorbs the
    //    double-arithmetic edge; a pruned row is strictly below the
    //    bound, so the pair it came from cannot verify);
    //  - FIRST-COLLISION dedup (first_common_bounded === current
    //    token): each pair is emitted from exactly its first shared
    //    prefix token — the old emit-everywhere + distinct() shuffled
    //    the full candidate stream (the r14 ×10 probe's dominant
    //    cost); a qualifying pair's first-common row always survives
    //    the position filter (the lemma above), so recall is intact;
    //  - the EXACT verify, one sorted merge per surviving row: for
    //    t = k/10 the double test i/(s−i) > t equals the integer test
    //    (10+k)·i > k·s (the minhashPairsExact proof — margins ≥
    //    1/(10(s−i)) dwarf the 1-ulp division error, equality rounds
    //    to the same double on both sides). Non-decimal thresholds
    //    fall back to the double comparison.
    val prefixes = ranked
      .select($"id", $"nt", $"p", $"ranks",
        posexplode(slice($"ranks", lit(1), col("p"))))
      .withColumnRenamed("col", "r")
      .withColumn("pos", $"pos" + 1)      // 1-based position in ranks
    val k10 = math.round(threshold * 10)
    val thresholdTest =
      if (k10 / 10.0 == threshold)
        lit(10 + k10) * sorted_intersect_count($"l.ranks", $"r.ranks") >
          lit(k10) * ($"l.nt" + $"r.nt")
      else {
        val sic = sorted_intersect_count($"l.ranks", $"r.ranks").cast("double")
        sic / (($"l.nt" + $"r.nt") - sic) > threshold
      }
    prefixes.as("l").join(prefixes.as("r"),
        $"l.r" === $"r.r" && $"l.id" < $"r.id" &&
        least($"l.nt", $"r.nt") > lit(threshold) * greatest($"l.nt", $"r.nt") &&
        (lit(1.0) + least($"l.nt" - $"l.pos", $"r.nt" - $"r.pos")) *
          lit(1.0 + threshold) >=
          lit(threshold) * ($"l.nt" + $"r.nt") - lit(1e-7) &&
        first_common_bounded($"l.ranks", $"r.ranks", $"l.p", $"r.p") === $"l.r" &&
        thresholdTest)
      .select($"l.id".as("id_a"), $"r.id".as("id_b"),
        sorted_intersect_count($"l.ranks", $"r.ranks").cast("double").as("inter"),
        ($"l.nt" + $"r.nt").as("s"))
      .select($"id_a", $"id_b",
        graft.functions.TextFunctions.r4($"inter" / ($"s" - $"inter")).as("jaccard"))
  }

  /** All DIRECTED pairs with exact containment |A∩B| / |A| >
    * threshold: (id_a, id_b, containment), r4-rounded — "B covers
    * ≥ t of A", the asymmetric set-overlap the dedup family needs for
    * subset/quotation detection where Jaccard fails (a doc fully
    * contained in a 10× larger one has Jaccard ≤ 0.1 but containment
    * 1.0). Candidate lemma (the JOSIE/PPJoin+ containment prefix): if
    * |A∩B| ≥ ⌈t·|A|⌉ then A's first |A| − ⌈t·|A|⌉ + 1 rarity-ordered
    * tokens intersect B SOMEWHERE — so candidates are A-prefix tokens
    * joined against B's FULL posting lists (asymmetric: the coveree's
    * prefix meets the coverer's whole set). Rarity ordering keeps the
    * full-side lists short where it matters; a nb ≥ ⌈t·na⌉ size prune
    * drops impossible pairs before the verify merge.
    */
  def containmentPairsPrefix(
      spark: SparkSession,
      docs: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double,
      pretokenized: Option[DataFrame] = None,
      minSize: Int = 1,
      maxBroadcastVocab: Long = 10000000L,
      maxBroadcastDocs: Long = 1000000L,
      maxBroadcastBytes: Long = 1L << 30): DataFrame = {
    import spark.implicits._
    require(threshold > 0 && threshold < 1, "threshold in (0,1)")
    graft.functions.SortedIntersectCount.register(spark)
    import graft.functions.SortedIntersectCount.sorted_intersect_count

    graft.functions.FirstCommonBounded.register(spark)
    import graft.functions.FirstCommonBounded.first_common_bounded
    val (ranked, _, _) = rankedArrays(spark, docs, idCol, textCol,
      threshold, pretokenized, maxBroadcastVocab)
    // the minSize floor applies to the COVEREE (A) side only: tiny
    // sets are trivially contained everywhere and would make the
    // output quadratic; the coverer (B) side stays unrestricted
    val rankedA = ranked.filter($"nt" >= minSize)

    // FULLY FUSED candidate + verify join — the jaccardPairsPrefix r19
    // shape, asymmetric: A-prefix tokens against B's FULL posting
    // list, every filter inside the join, cheapest first —
    //  - size prune nb ≥ ⌈t·na⌉;
    //  - containment position filter: a shared token at 1-based
    //    positions (ia, jb) caps |A∩B| at ub = 1 + min(na−ia, nb−jb);
    //    a qualifying pair's FIRST shared token has ub ≥ |A∩B| > t·na,
    //    so pruning ub < t·na − ε loses nothing;
    //  - first-collision dedup: emit only from A-prefix-vs-B-full's
    //    first common token (first_common_bounded over (A's prefix,
    //    B's whole array) — replaces the candidate-stream distinct());
    //  - exact verify, one merge per surviving row: containment
    //    i/na > k/10 ⟺ 10·i > k·na (the integer-test proof), double
    //    fallback for non-decimal thresholds.
    val prefixes = rankedA
      .select($"id", $"nt", $"p", $"ranks",
        posexplode(slice($"ranks", lit(1), col("p"))))
      .withColumnRenamed("col", "r")
      .withColumn("pos", $"pos" + 1)
    val full = ranked
      .select($"id", $"nt", $"ranks", posexplode($"ranks"))
      .withColumnRenamed("col", "r")
      .withColumn("pos", $"pos" + 1)
    val k10 = math.round(threshold * 10)
    val thresholdTest =
      if (k10 / 10.0 == threshold)
        lit(10L) * sorted_intersect_count($"l.ranks", $"r.ranks") >
          lit(k10) * $"l.nt"
      else
        sorted_intersect_count($"l.ranks", $"r.ranks").cast("double") / $"l.nt" >
          threshold
    prefixes.as("l").join(full.as("r"),
        $"l.r" === $"r.r" && $"l.id" =!= $"r.id" &&
        $"r.nt" >= ceil(lit(threshold) * $"l.nt") &&
        lit(1.0) + least($"l.nt" - $"l.pos", $"r.nt" - $"r.pos") >=
          lit(threshold) * $"l.nt" - lit(1e-7) &&
        first_common_bounded($"l.ranks", $"r.ranks", $"l.p", $"r.nt") === $"l.r" &&
        thresholdTest)
      .select($"l.id".as("id_a"), $"r.id".as("id_b"),
        sorted_intersect_count($"l.ranks", $"r.ranks").cast("double").as("inter"),
        $"l.nt".as("na"))
      .select($"id_a", $"id_b",
        graft.functions.TextFunctions.r4($"inter" / $"na").as("containment"))
  }
}
