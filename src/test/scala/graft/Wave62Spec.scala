package graft

import org.apache.spark.sql.functions._

import graft.engine.{Relational44, Tables}

/** Wave 62 (q327–q329): the Q6 scan-aggregate (plan-asserted pushdown
  * — the query IS its pushdown), HHI identities, and the BPE pruning
  * cost's monotone compression contract. */
class Wave62Spec extends SparkTestBase {

  test("q327 pushes all three predicates into the parquet scan") {
    import spark.implicits._
    val d = Relational44.q327ForecastRevenue(spark, sf)
    assert(d.head().getAs[Long]("n_lines") > 0)
    val scanLine = d.queryExecution.executedPlan.toString.linesIterator
      .find(_.contains("PushedFilters")).getOrElse("")
    for (col <- Seq("l_shipdate", "l_discount", "l_quantity"))
      assert(scanLine.contains(col), s"$col must reach PushedFilters")
  }

  test("q328 HHI bands partition all parts and respect the 1/n floor") {
    import spark.implicits._
    val d = Relational44.q328HhiBands(spark, sf)
    val total = d.agg(sum($"n_parts")).head().getLong(0)
    val parts = Tables.lineitem(spark, sf).select($"l_partkey")
      .distinct().count()
    assert(total === parts)
    // HHI is bounded: 10^6/n <= hhi <= 10^6; with n <= ~few dozen
    // suppliers the floor is far above 0 and the ceiling exact.
    assert(d.filter($"max_hhi" > 1000000L || $"min_hhi" < 1000L).count() === 0)
  }

  test("q329 compression is monotone: raw >= half >= full, tail value >= 0") {
    import spark.implicits._
    val d = Relational44.q329PruningCost(spark, sf)
    assert(d.count() > 0)
    assert(d.filter($"half_chars" > $"raw_chars" ||
      $"full_chars" > $"half_chars" || $"tail_value_chars" < 0).count() === 0)
    // the merge table is non-trivial: full must actually compress
    assert(d.agg(sum($"raw_chars" - $"full_chars")).head().getLong(0) > 0)
  }
}
