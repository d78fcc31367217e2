package graft.queries

import graft.{QueryDef, Tables}
import graft.functions.TextFunctions.r4
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** SQL-surface breadth: map-typed columns (q104), exact interpolated
  * percentiles (q105), and the conditional/argmax aggregate family
  * (q106). Oracles compute the same results relationally — the point
  * is that the Spark surface (map lambdas, percentile arrays,
  * FILTER-style aggregates) reduces to the same answers.
  */
object SurfaceQueries {

  private def dec(c: Column): Column = c.cast("decimal(18,2)")

  def defs: Seq[QueryDef] = Seq(
    // ----- q104: map functions — per-order flag→quantity map built
    // with map_from_entries(collect_list(struct)), transformed with
    // transform_values, pruned with map_filter, read back with
    // element_at, and exploded to rows for the oracle. Map columns
    // stay inside the plan; only the exploded view leaves it.
    QueryDef(
      "q104_map_functions",
      (s, d) => {
        import s.implicits._
        val m = Tables.lineitem(s, d)
          .groupBy($"l_orderkey", $"l_returnflag")
          .agg(sum(dec($"l_quantity")).cast("double").as("qty"))
          .groupBy($"l_orderkey")
          .agg(map_from_entries(
            array_sort(collect_list(struct($"l_returnflag", $"qty"))))
            .as("flag_qty"))
          // double every value, then keep only flags with qty > 30
          .withColumn("scaled", transform_values($"flag_qty", (_, v) => v * 2))
          .withColumn("big", map_filter($"scaled", (_, v) => v > 30))
          .withColumn("n_flags", size($"big"))
          .withColumn("r_qty", element_at($"big", "R"))
        m.filter($"n_flags" > 0)
          .select($"l_orderkey", explode($"big").as(Seq("flag", "qty2")), $"n_flags",
            $"r_qty")
          .orderBy($"l_orderkey", $"flag")
      },
      Some("""WITH base AS (
             |  SELECT l_orderkey, l_returnflag AS flag,
             |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) * 2 AS qty2
             |  FROM lineitem GROUP BY 1, 2),
             |big AS (SELECT * FROM base WHERE qty2 > 30),
             |meta AS (
             |  SELECT l_orderkey, count(*) AS n_flags,
             |    max(CASE WHEN flag = 'R' THEN qty2 END) AS r_qty
             |  FROM big GROUP BY 1)
             |SELECT big.l_orderkey, flag, qty2, n_flags, r_qty
             |FROM big JOIN meta ON big.l_orderkey = meta.l_orderkey
             |ORDER BY big.l_orderkey, flag""".stripMargin)),

    // ----- q105: exact interpolated percentiles (quartiles + IQR)
    // per market segment — Spark `percentile(col, array(...))` vs
    // DuckDB `quantile_cont`, both the linear-interpolation
    // definition. At 100 TB the q43 KLL sketch approximates exactly
    // this; the pair pins what "approximate" deviates from.
    QueryDef(
      "q105_exact_percentiles",
      (s, d) => {
        import s.implicits._
        Tables.customer(s, d)
          .groupBy($"c_mktsegment")
          .agg(percentile($"c_acctbal", array(lit(0.25), lit(0.5), lit(0.75)))
            .as("qs"))
          .select($"c_mktsegment",
            r4(element_at($"qs", 1)).as("q25"),
            r4(element_at($"qs", 2)).as("median"),
            r4(element_at($"qs", 3)).as("q75"),
            r4(element_at($"qs", 3) - element_at($"qs", 1)).as("iqr"))
          .orderBy($"c_mktsegment")
      },
      Some("""SELECT c_mktsegment,
             |  floor(quantile_cont(c_acctbal, 0.25) * 10000 + 0.5) / 10000 AS q25,
             |  floor(quantile_cont(c_acctbal, 0.5) * 10000 + 0.5) / 10000 AS median,
             |  floor(quantile_cont(c_acctbal, 0.75) * 10000 + 0.5) / 10000 AS q75,
             |  floor((quantile_cont(c_acctbal, 0.75) - quantile_cont(c_acctbal, 0.25))
             |    * 10000 + 0.5) / 10000 AS iqr
             |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)),

    // ----- q106: conditional / argmax aggregate family — count_if,
    // bool_or/bool_and, max_by/min_by (DuckDB arg_max/arg_min).
    // DuckDB's arg_max can't order by a struct, and ties in
    // o_totalprice DO exist within priority groups (61 at sf0.1) —
    // max_by with a tied ordinal is partition-order-nondeterministic.
    // So the ordinal is a single exact integer: price-cents·10^10 +
    // orderkey (price has 2 decimals; round() lands both engines on
    // the same integer, and the sum stays < 2^63 for orderkeys up to
    // 10^10).
    QueryDef(
      "q106_conditional_aggs",
      (s, d) => {
        import s.implicits._
        val ord = round($"o_totalprice" * 100).cast("long") *
          lit(10000000000L) + $"o_orderkey"
        Tables.orders(s, d)
          .groupBy($"o_orderpriority")
          .agg(
            count_if($"o_totalprice" > 300000).as("n_big"),
            bool_or($"o_orderstatus" === "F").as("any_f"),
            bool_and($"o_totalprice" > 1000).as("all_over_1k"),
            max_by($"o_orderkey", ord).as("key_of_max"),
            min_by($"o_orderkey", ord).as("key_of_min"))
          .orderBy($"o_orderpriority")
      },
      Some("""SELECT o_orderpriority,
             |  count(*) FILTER (WHERE o_totalprice > 300000) AS n_big,
             |  bool_or(o_orderstatus = 'F') AS any_f,
             |  bool_and(o_totalprice > 1000) AS all_over_1k,
             |  arg_max(o_orderkey,
             |    CAST(round(o_totalprice * 100) AS BIGINT) * 10000000000
             |      + o_orderkey) AS key_of_max,
             |  arg_min(o_orderkey,
             |    CAST(round(o_totalprice * 100) AS BIGINT) * 10000000000
             |      + o_orderkey) AS key_of_min
             |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)))
}
