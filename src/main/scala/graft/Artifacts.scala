package graft

import org.apache.spark.sql.SparkSession

/** Registry of every materialized derived artifact the query suite
  * amortizes through [[ArtifactCache]] — the ANN indexes, tokenized /
  * pair / component tables, bucketed and z-ordered layout copies.
  *
  * Purpose: ATTRIBUTION. A full bench run starts from a clean
  * artifact root (Bench.scala), so without this registry each build
  * lands in the cold time of whichever consumer query happens to run
  * first — q125 "costing" 9 s of which 8.7 s is the shared component
  * build, and round-over-round per-query deltas turning into phantom
  * regressions whenever suite order shifts (r11/r12 verdicts: q239,
  * q58). Bench drives each entry below as its own `artifact:<name>`
  * row BEFORE the query loop, so consumer rows measure steady-state
  * reads and build costs are first-class, separately-tracked rows —
  * exactly how a lakehouse accounts an OPTIMIZE/index job vs the
  * queries that use it.
  *
  * Entries are ORDERED: an artifact that consumes another (the
  * prefix-join pair tables read the token artifacts; the component
  * assignment reads the band-30 pair table) comes after it, so each
  * timed build measures only its own work.
  *
  * Each thunk is ensure-style (build iff the content-stamped marker
  * is missing) and cheap when already built — running the registry
  * twice costs reads, not rebuilds.
  */
object Artifacts {

  /** (name, force) pairs in dependency order. Forcing returns Unit —
    * the build (if any) happens eagerly inside the helper.
    */
  def builders: Seq[(String, (SparkSession, String) => Unit)] = Seq(
    "toks" -> ((s, d) => { queries.DedupQueries.hashedToks(s, d); () }),
    "toks3" -> ((s, d) => { queries.DedupQueries.hashedShingles(s, d); () }),
    "jacpairs_prefix" -> ((s, d) => { queries.DedupQueries.jacPairsArtifact(s, d); () }),
    "conpairs" -> ((s, d) => { queries.DedupQueries.conPairsArtifact(s, d); () }),
    "mhkeys" -> ((s, d) => { queries.DedupQueries.mhKeysArtifact(s, d); () }),
    "jacpairs_band" -> ((s, d) => { queries.DedupQueries.jaccardPairsArtifact(s, d); () }),
    "comps" -> ((s, d) => { queries.DedupQueries.componentArtifact(s, d); () }),
    "lpa" -> ((s, d) => { queries.AnalyticsQueries.lpaLabels(s, d); () }),
    "lsh" -> ((s, d) => { queries.PipelineQueries.lshIndex(s, d); () }),
    "lsh_rad" -> ((s, d) => { queries.PipelineQueries.lshRadIndex(s, d); () }),
    "ivf" -> ((s, d) => { queries.PipelineQueries.ivfIndex(s, d); () }),
    "buck_li" -> ((s, d) => { queries.ScaleQueries.bucketedLi(s, d); () }),
    "buck_od" -> ((s, d) => { queries.ScaleQueries.bucketedOd(s, d); () }),
    "zorder_li" -> ((s, d) => { queries.ScaleQueries.zorderedLi(s, d); () }))
}
