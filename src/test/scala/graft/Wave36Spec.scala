package graft

import org.apache.spark.sql.functions._

import graft.engine.{Relational28, Tables}

/** Wave 36 (q255–q257): record linkage, skew audit, sampling design.
  * Value-level invariants the hash gate can't express: blocking recall,
  * decision-rule separation, skew ordering, clustering-bias direction. */
class Wave36Spec extends SparkTestBase {

  test("q255 blocking recall is 100% and every true pair lands in `link`") {
    import spark.implicits._
    val res = Relational28.q255RecordLinkage(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val nCust = Tables.customer(spark, sf).count()
    assert(res.values.map(_._2).sum === nCust,
      "each customer's dirty twin must be found by the tail-2 blocking")
    assert(res("link")._2 === nCust,
      "a clean or single-error pair always scores ≥ the link threshold")
    assert(res.get("possible").forall(_._2 === 0L) &&
      res.get("non_link").forall(_._2 === 0L))
    assert(res("link")._1 >= nCust, "chance collisions may add false links")
  }

  test("q256 skew ordering: low-cardinality keys skew worst, salting helps, " +
    "unique keys are the uniform baseline") {
    val m = Relational28.q256SkewAudit(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(3))).toMap
    assert(m("1_event_type")._1 <= 5, "5 key values cannot fill more buckets")
    assert(m("1_event_type")._2 > m("4_type_salted")._2,
      "salting must strictly reduce the skew of the hot-key scheme")
    assert(m("4_type_salted")._2 > m("3_event_id")._2,
      "a ×8 salt cannot beat a unique key")
  }

  test("q257 block sampling inherits clustering bias on the clustered metric") {
    val rows = Relational28.q257SamplingAudit(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(5)).toMap
    assert(rows(("block_2pct", "ship_day")) > rows(("block_2pct", "qty_cents")),
      "shipdate clusters along orderkey blocks; quantity does not — the " +
        "block design's error must reflect that asymmetry")
    rows.values.foreach(err => assert(err < 200000,
      s"a 2% sample of this fixture should stay within 20% of truth ($err ppm)"))
  }
}
