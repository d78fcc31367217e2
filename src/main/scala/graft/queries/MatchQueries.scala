package graft.queries

import graft.{QueryDef, Tables}
import graft.operators.{FuzzyJoin, RangeJoin}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Non-equi matching operators: interval-overlap range join (grid-
  * binned equi-join, never a cartesian) and edit-distance fuzzy join
  * (q-gram prefix filter). The DuckDB oracles run the NAIVE
  * inequality-join formulations — same answer through an independent
  * plan, which is exactly what these operators must prove.
  */
object MatchQueries {

  def defs: Seq[QueryDef] = Seq(
    // ----- q92: interval-overlap range join — returned-lineitem ship
    // windows [shipdate, +7d] overlapping urgent high-value order
    // windows [orderdate, +3d], counted per order. Spark executes the
    // grid-binned equi-join with canonical-bin dedup; the oracle is
    // the plain inequality join.
    QueryDef(
      "q92_range_join",
      (s, d) => {
        import s.implicits._
        val o = Tables.orders(s, d)
          .filter($"o_orderpriority" === "1-URGENT" && $"o_totalprice" > 400000)
          .withColumn("os", datediff(to_date($"o_orderdate"), lit("1990-01-01")))
          .withColumn("oe", $"os" + 3)
          .select($"o_orderkey", $"os", $"oe")
        val l = Tables.lineitem(s, d)
          .filter($"l_returnflag" === "R")
          .withColumn("ls", datediff(to_date($"l_shipdate"), lit("1990-01-01")))
          .withColumn("le", $"ls" + 7)
          .select($"l_quantity", $"ls", $"le")
        RangeJoin.overlapJoin(l, "ls", "le", o, "os", "oe", binWidth = 8)
          .groupBy($"o_orderkey")
          .agg(count(lit(1)).as("n_overlap"),
            // decimal accumulation (repo determinism contract): a raw
            // double sum is partition-order-dependent; exact today only
            // because fixture quantities are integral
            sum($"l_quantity".cast("decimal(18,2)")).cast("double").as("sum_qty"))
          .orderBy($"o_orderkey")
      },
      Some("""WITH o AS (
             |  SELECT o_orderkey,
             |    datediff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE)) AS os
             |  FROM orders
             |  WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 400000),
             |l AS (
             |  SELECT l_quantity,
             |    datediff('day', DATE '1990-01-01', CAST(l_shipdate AS DATE)) AS ls
             |  FROM lineitem WHERE l_returnflag = 'R')
             |SELECT o_orderkey, count(*) AS n_overlap,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
             |FROM o JOIN l ON l.ls <= o.os + 3 AND o.os <= l.ls + 7
             |GROUP BY o_orderkey ORDER BY o_orderkey""".stripMargin)),

    // ----- q93: fuzzy self-join of part names within edit distance 2.
    // Spark runs the Ed-Join prefix-filtered plan; the oracle runs the
    // naive O(N²) inequality join (fine at oracle scale, impossible at
    // corpus scale — which is the point).
    QueryDef(
      "q93_fuzzy_join",
      (s, d) => {
        import s.implicits._
        val names = Tables.part(s, d).select($"p_name").distinct()
        FuzzyJoin.editDistancePairs(s, names, "p_name", tau = 2)
          .orderBy($"name_a", $"name_b")
      },
      Some("""SELECT a.p_name AS name_a, b.p_name AS name_b,
             |  CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
             |FROM (SELECT DISTINCT p_name FROM part) a
             |JOIN (SELECT DISTINCT p_name FROM part) b
             |  ON a.p_name < b.p_name
             | AND levenshtein(a.p_name, b.p_name) <= 2
             |ORDER BY name_a, name_b""".stripMargin)))
}
