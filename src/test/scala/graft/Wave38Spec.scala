package graft

import org.apache.spark.sql.functions._

import graft.engine.{Relational30, Tables}

/** Wave 38 (q261–q262): incremental OPTIMIZE planning and MV routing.
  * Invariants: assignment conservation across the plan, and rollup
  * additivity across the MV ladder. */
class Wave38Spec extends SparkTestBase {

  test("q261 plan conserves files and append rows") {
    import spark.implicits._
    val plan = Relational30.q261OptimizePlan(spark, sf)
    val files = plan.agg(sum($"n_files")).head.getLong(0)
    assert(files === Relational30.OptFiles.toLong,
      "every base file must receive exactly one decision")
    val appended = plan.agg(sum($"rows_appended")).head.getLong(0)
    val n = Tables.events(spark, sf).count()
    assert(appended === n - (n * 8 / 10),
      "every appended row must be assigned to exactly one file")
    // a rewrite touches at least its own appended rows
    plan.collect().foreach { r =>
      if (r.getString(0) == "rewrite")
        assert(r.getAs[Long]("rows_rewritten") > r.getAs[Long]("rows_appended"))
    }
  }

  test("q262 every routed answer equals the base scan; MV ladder shrinks") {
    import spark.implicits._
    val res = Relational30.q262MvRouting(spark, sf)
    assert(res.filter($"mv_checksum" =!= $"base_checksum").count() === 0,
      "SUM is additive, so rollup routing must be answer-invisible")
    val rows = res.orderBy($"query_name").collect().map(_.getAs[Long]("mv_rows"))
    assert(rows(0) > rows(1) && rows(1) > rows(2),
      "coarser grains must be strictly smaller MVs")
    assert(res.filter($"mv_rows" >= $"base_rows").count() === 0)
  }

  test("q263 allocation conserves lines and hits the 60% stock bound exactly") {
    import spark.implicits._
    val res = Relational30.q263Allocation(spark, sf)
    val n = res.agg(sum($"n_lines")).head.getLong(0)
    assert(n === Tables.lineitem(spark, sf).count(),
      "every order line receives exactly one outcome")
    // stock is 60% of demand per part and the greedy fill exhausts it
    // up to per-part integer floors, so the global rate sits at 60%
    // minus at most the per-part floor loss
    val rate = res.head.getAs[Long]("fill_rate_ppm")
    assert(rate <= 600000L && rate >= 599000L, s"fill rate $rate")
    val filled = res.filter($"status" === "1_filled").head
    assert(filled.getAs[Long]("requested_cents") ===
      filled.getAs[Long]("allocated_cents"))
  }
}
