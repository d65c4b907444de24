package graft

import org.apache.spark.sql.functions._

import graft.engine.{Relational43, Tables}

/** Wave 61 (q324–q326): datasheet, hybrid skew join, balanced
  * downsample. Teeth: the hybrid's plan contains BOTH join strategies
  * and its hot side is non-empty at test SF; the downsample achieves
  * exact uniformity; datasheet fields cross-check against their
  * dedicated queries. */
class Wave61Spec extends SparkTestBase {

  test("q324 datasheet fields cross-check against dedicated computations") {
    import spark.implicits._
    val row = Relational43.q324Datasheet(spark, sf).head()
    assert(row.getAs[Long]("n_docs") ===
      Tables.documents(spark, sf).count())
    assert(row.getAs[Long]("n_langs") === 5L)
    val vocab = Tables.documents(spark, sf)
      .select(explode(graft.functions.TextFunctions.tokens($"text")).as("t"))
      .filter($"t" =!= "").distinct().count()
    assert(row.getAs[Long]("vocab") === vocab)
    val q = row.getAs[Long]("mean_quality_permille")
    assert(q > 0 && q <= 1000)
    assert(row.getAs[Long]("median_len") > 0)
  }

  test("q325 hybrid plan carries both a broadcast and a merge join; hot side real") {
    import spark.implicits._
    val d = Relational43.q325HybridSkewJoin(spark, sf)
    val plan = d.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "hot path must broadcast")
    assert(plan.contains("SortMergeJoin"), "cold path must stay a shuffle join")
    // Hot keys exist at test SF (threshold calibrated to the fixture's
    // ~10 orders/customer Poisson).
    val hot = Tables.orders(spark, sf).groupBy($"o_custkey")
      .agg(count(lit(1)).as("f")).filter($"f" > 15).count()
    assert(hot > 0, "fixture must produce hot keys for the hybrid to exercise")
    // Exactness: totals equal the plain join.
    val want = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf), $"o_custkey" === $"c_custkey")
      .count()
    assert(d.agg(sum($"n_orders")).head().getLong(0) === want)
  }

  test("q326 downsample is exactly uniform across languages") {
    import spark.implicits._
    val d = Relational43.q326BalancedDownsample(spark, sf).cache()
    try {
      assert(d.select($"kept").distinct().count() === 1,
        "every language keeps exactly the quota")
      val bad = d.filter($"kept" =!= $"quota" ||
        $"kept" + $"dropped" =!= $"n_docs")
      assert(bad.count() === 0)
    } finally d.unpersist()
  }
}
