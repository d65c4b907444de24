package graft

import org.apache.spark.sql.functions._

import graft.engine.{Relational24, Tables}

class Relational24Spec extends SparkTestBase {
  import spark.implicits._

  test("q220 profit rows cover exactly the widget-part nations and plan one fact shuffle") {
    val df = Relational24.q220ProductProfit(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    // every (nation, year) group's line count sums to the filtered join size
    val expected = Tables.lineitem(spark, sf)
      .join(Tables.part(spark, sf)
        .filter($"p_name".contains(Relational24.Q220NameToken)),
        $"l_partkey" === $"p_partkey")
      .count()
    assert(rows.map(_.getAs[Long]("n_lines")).sum == expected,
      "grouped line counts must partition the part-filtered lineitem set")
    // dims broadcast; the only shuffle-shuffle join is lineitem⋈orders
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
  }

  test("q221 returns at most topN rows, sorted by lost revenue with custkey tiebreak") {
    val rows = Relational24.q221ReturnedItems(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= Relational24.Q221TopN)
    val keys = rows.map(r => (-r.getAs[Long]("lost_units"), r.getAs[Long]("c_custkey")))
    assert(keys.sameElements(keys.sorted), "output must be ordered (lost desc, custkey)")
  }

  test("q222 promo share: promo <= total and bps on the exact integer grid") {
    val rows = Relational24.q222PromoShare(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val promo = r.getAs[Long]("promo_units")
      val total = r.getAs[Long]("total_units")
      assert(promo >= 0 && promo <= total)
      assert(r.getAs[Long]("promo_bps") == promo * 10000L / total,
        "bps must be the integer cross-multiplication, not a float round-trip")
    }
  }

  test("q223 winners all share the quarter's max revenue; no single-partition window in plan") {
    val rows = Relational24.q223TopSupplier(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("rev_units")).distinct.length == 1,
      "every surviving supplier must carry the identical max revenue")
    val p = Relational24.q223TopSupplier(spark, sf).queryExecution.executedPlan.toString
    assert(!p.contains("Window"), "argmax must not use a global-sort window:\n" + p)
  }

  test("q224 merged-from-daily-sketches estimate equals the single-pass estimate") {
    val rows = Relational24.q224SketchRollup(spark, sf).collect()
    assert(rows.nonEmpty)
    // KMV merge exactness is the whole point: rollup == direct, per grain
    rows.foreach { r =>
      assert(r.getAs[Long]("est_merged") == r.getAs[Long]("est_direct"),
        s"sketch rollup diverged from direct for ${r.getAs[String]("event_type")}")
    }
    // the __all__ grain must be present and at least as large as any type's
    val all = rows.find(_.getAs[String]("event_type") == "__all__").get
    assert(rows.forall(_.getAs[Long]("est_direct") <= all.getAs[Long]("est_direct") ||
      rows.length == 1))
  }
}
