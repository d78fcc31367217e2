package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming PAGERANK maintenance — the incremental
  * counterpart of `GraphOps.pageRank` (q99's batch power iteration),
  * completing the graph family's batch/stream pairing next to
  * [[KCoreStream]]: edges arrive incrementally and a downstream
  * id-keyed upsert sink always holds the current ranks of the tracked
  * graph.
  *
  * Parity discipline: each batch folds the new edges into the tracked
  * undirected adjacency (dedup + self-loop drop — exactly
  * `GraphOps.orient`), then re-runs the SAME fixed-iteration damped
  * recurrence with the SAME arithmetic as the batch operator — per
  * node cv = p/deg, per in-neighbor contribution floor(cv·2⁴⁰) summed
  * as exact integers (order-free, so in-memory accumulation ≡ the
  * batch reduceByKey bit-for-bit), rank = (1−d)/n + d·(sum/2⁴⁰).
  * After any split/order of an edge stream the upsert therefore holds
  * EXACTLY the batch `pageRank` output over the same edges — pinned
  * bit-for-bit in PageRankStreamSpec.
  *
  * Unlike k-core, PageRank is NOT monotone — one edge shifts every
  * rank in its component (and, through the 1/n base term, slightly
  * everywhere) — so emissions are value-changed upserts, not
  * grow-only ones; the changed set is usually component-local because
  * unaffected doubles reproduce identically.
  *
  * Shape honesty (the [[ComponentStream]] argument): the recurrence
  * is global (n sits in every rank), so the registry lives under ONE
  * group key and re-iterates the tracked subgraph per batch —
  * O(iterations·E) in memory, millions of edges/sec on one core. The
  * input is an EDGE stream (already pair-reduced); at a rate where
  * one core saturates, run the distributed batch `pageRank` on a
  * schedule and keep this for the low-latency window — the
  * incremental-index-between-batch-rebuilds convention.
  *
  * State cap (the family's rule): past `maxNodes`, whole
  * least-recently-touched connected components are evicted BEFORE the
  * batch's recurrence runs, so every emitted rank is computed over
  * exactly the surviving tracked graph — retained answers stay exact
  * for the TRACKED graph, the same recall trade every capped stream
  * documents. Evicted ids whose ranks were previously emitted get a
  * TOMBSTONE row — TYPE-VISIBLE as `pr = None` (NULL in the sink
  * schema), so a retraction can never be mistaken for a value and an
  * id-keyed upsert sink drops NULL-rank rows; the registry family
  * (CentralityStream's three operators) shares this emission shape.
  */
object PageRankStream {

  final case class Edge(u: Long, v: Long)
  /** One emission: `pr = Some(rank)` upserts, `pr = None` RETRACTS a
    * previously-emitted id (eviction tombstone — NULL in the sink
    * schema, never an in-band sentinel). */
  final case class RankRow(id: Long, pr: Option[Double])

  /** adj: undirected deduped adjacency. ranks: last emitted rank per
    * id. touch: node → last batch tick. tick: monotone counter. */
  final case class Registry(
      adj: Map[Long, Seq[Long]],
      ranks: Map[Long, Double],
      touch: Map[Long, Long],
      tick: Long)

  private val Q = 1099511627776L    // 2^40, the batch operator's quantum

  def rankAssignments(
      edges: Dataset[Edge],
      iterations: Int = 5,
      damping: Double = 0.85,
      maxNodes: Int = 1 << 20): Dataset[RankRow] = {
    require(iterations >= 1, "iterations >= 1")
    val spark = edges.sparkSession
    import spark.implicits._

    def fn(key: Int, it: Iterator[Edge],
        state: GroupState[Registry]): Iterator[RankRow] = {
      val st = state.getOption.getOrElse(Registry(Map.empty, Map.empty, Map.empty, 0L))
      val adj = scala.collection.mutable.HashMap.from(
        st.adj.view.mapValues(scala.collection.mutable.HashSet.from(_)))
      val touch = scala.collection.mutable.HashMap.from(st.touch)
      val tick = st.tick + 1

      it.foreach { e =>
        if (e.u != e.v) {
          val a = adj.getOrElseUpdate(e.u, scala.collection.mutable.HashSet.empty)
          val b = adj.getOrElseUpdate(e.v, scala.collection.mutable.HashSet.empty)
          a += e.v; b += e.u
          touch(e.u) = tick; touch(e.v) = tick
        }
      }

      // cap FIRST: evict whole least-recently-touched components (the
      // KCoreStream scan; eviction is the rare path), so the
      // recurrence below — and therefore every emission this batch —
      // runs over exactly the surviving tracked graph
      val evicted = scala.collection.mutable.HashSet.empty[Long]
      if (adj.size > maxNodes) {
        val seen = scala.collection.mutable.HashSet.empty[Long]
        val comps = scala.collection.mutable.ArrayBuffer.empty[(Long, Seq[Long])]
        adj.keys.foreach { s =>
          if (!seen.contains(s)) {
            val comp = scala.collection.mutable.ArrayBuffer(s)
            seen += s
            var i = 0
            while (i < comp.length) {
              adj(comp(i)).foreach { w =>
                if (!seen.contains(w)) { seen += w; comp += w }
              }
              i += 1
            }
            val recency = comp.iterator.map(touch.getOrElse(_, 0L)).max
            comps += ((recency, comp.toSeq))
          }
        }
        comps.sortInPlaceBy { case (recency, comp) => (recency, comp.min) }
        var ci = 0
        while (adj.size > maxNodes && ci < comps.length) {
          comps(ci)._2.foreach { v =>
            adj.remove(v); touch.remove(v); evicted += v
          }
          ci += 1
        }
      }

      // the batch recurrence, verbatim arithmetic
      val n = adj.size.toLong
      val newRanks: Map[Long, Double] =
        if (n == 0L) Map.empty
        else {
          val base = (1.0 - damping) / n
          var pr = scala.collection.mutable.HashMap.from(
            adj.view.mapValues(_ => 1.0 / n))
          for (_ <- 1 to iterations) {
            // cv = p / deg per node (deg ≥ 1: every tracked node has
            // an edge), then exact integer contribution sums
            val contrib = scala.collection.mutable.HashMap.empty[Long, Long]
            adj.foreach { case (u, nbrs) =>
              val cv = pr(u) / nbrs.size
              val qc = math.floor(cv * Q).toLong
              nbrs.foreach { w =>
                contrib(w) = contrib.getOrElse(w, 0L) + qc
              }
            }
            val next = scala.collection.mutable.HashMap.empty[Long, Double]
            adj.keys.foreach { v =>
              next(v) = base +
                damping * (contrib.getOrElse(v, 0L).toDouble / Q)
            }
            pr = next
          }
          pr.toMap
        }

      val changed = newRanks.iterator.filter { case (v, p) =>
        !st.ranks.get(v).contains(p)
      }.toSeq
      // tombstones: evicted ids whose rank was previously emitted —
      // pr = None (NULL downstream) tells an id-keyed upsert sink to
      // DROP the row, so untracked nodes never linger as stale ranks
      val tombstones = evicted.iterator
        .filter(st.ranks.contains).toSeq.sorted
        .map(id => RankRow(id, None))

      state.update(Registry(
        adj.view.mapValues(_.toSeq.sorted).toMap,
        newRanks,
        touch.toMap, tick))
      (tombstones ++
        changed.sortBy(_._1).map { case (id, p) => RankRow(id, Some(p)) }).iterator
    }

    edges.groupByKey(_ => 0)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.NoTimeout())(fn)
  }
}
