package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Rank-1 alternating least squares over a sparse (entity × item,
  * rating) matrix — the RECOMMENDER primitive: u_c·v_p approximates
  * r_cp, u is "customer appetite", v is "item pull", and the residual
  * r − u·v is the personalization signal a rank-2+ model would chase.
  * Rank 1 keeps every update a plain grouped aggregation, which is
  * the point: the alternating closed form
  *   u_c ← Σ_p r·v / Σ_p v²,  v_p ← Σ_c r·u / Σ_c u²
  * is exactly expressible in integer algebra and therefore
  * oracle-replayable (the [[KMeans]]/[[LogReg]] recurrence-replay
  * discipline applied to factorization).
  *
  * Fixed point: factors are MILLI-quantized BIGINTs; each update is
  *   m ← (1e6 · Σ r·m') DIV (Σ m'²)
  * — all operands positive (ratings > 0 keep both factors > 0), so
  * Spark's truncating DIV and DuckDB's floor `//` agree exactly, with
  * NO double anywhere (unlike fdiv this survives operands past 2^53).
  *
  * Headroom: the v-step numerator 1e6·Σ_c(r·u_m) is the largest value
  * (~2·10¹⁷ at sf0.1 — measured); it grows with rows-per-item, ~5×
  * from int64 overflow at this corpus shape. One decade up, drop the
  * factor quantum to centi (the q267 rescale class) or lift the
  * products to decimal(38,0).
  *
  * Scale shape per half-round: one join of the cell table with an
  * entity-sized factor frame + one grouped aggregation with map-side
  * partials — cells never shuffle twice, factors stay entity-sized.
  *
  * Returns one row per round: (round, su, sv, sse) — factor-mass
  * sums and the exact integer SSE of r − (u_m·v_m DIV 1e6), the
  * training curve the oracle replays.
  */
object Als {

  def fitRank1(
      cells0: DataFrame,
      cCol: String,
      pCol: String,
      rCol: String,
      rounds: Int = 3): Seq[(Long, Long, Long, Long)] = {
    require(rounds >= 1, "rounds >= 1")
    val spark = cells0.sparkSession
    import spark.implicits._
    val cells = cells0.select(col(cCol).cast("long").as("c"),
        col(pCol).cast("long").as("p"), col(rCol).cast("long").as("r"))
      .transform(graft.operators.Iterate.truncate)          // consumed 3× per round
    var v = cells.select($"p").distinct()
      .withColumn("vm", lit(1000L))
      .transform(graft.operators.Iterate.truncate)
    val out = Seq.newBuilder[(Long, Long, Long, Long)]
    for (t <- 1 to rounds) {
      val u = cells.join(v, "p")
        .groupBy($"c")
        .agg(sum($"r" * $"vm").as("num"), sum($"vm" * $"vm").as("den"))
        .select($"c", expr("(num * 1000000) DIV den").as("um"))
        .transform(graft.operators.Iterate.truncate)
      v = cells.join(u, "c")
        .groupBy($"p")
        .agg(sum($"r" * $"um").as("num"), sum($"um" * $"um").as("den"))
        .select($"p", expr("(num * 1000000) DIV den").as("vm"))
        .transform(graft.operators.Iterate.truncate)
      val su = u.agg(sum($"um")).head().getLong(0)
      val sv = v.agg(sum($"vm")).head().getLong(0)
      val sse = cells.join(u, "c").join(v, "p")
        .select(($"r" - expr("(um * vm) DIV 1000000")).as("e"))
        .agg(sum($"e" * $"e")).head().getLong(0)
      out += ((t.toLong, su, sv, sse))
    }
    out.result()
  }
}
