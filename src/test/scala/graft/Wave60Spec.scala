package graft

import org.apache.spark.sql.functions._

import graft.engine.{Relational42, Tables}

/** Wave 60 (q321–q323): coverage calendar, overlap matrix, quota
  * top-k. Invariants: calendar identities (active + missing = span,
  * longest gap inside the span), Jaccard symmetry/bounds vs an
  * independent set computation, and the quota cap + plan shape
  * (TakeOrderedAndProject, no global sort). */
class Wave60Spec extends SparkTestBase {

  test("q321 calendar identities hold for every type") {
    import spark.implicits._
    val d = Relational42.q321CoverageCalendar(spark, sf)
    assert(d.count() > 0)
    assert(d.filter($"active_days" + $"missing_days" =!= $"span_days")
      .count() === 0)
    assert(d.filter($"longest_gap_days" > $"missing_days").count() === 0,
      "a contiguous gap can never exceed total missing days")
    assert(d.filter($"active_days" < 1 || $"span_days" < 1).count() === 0)
  }

  test("q322 Jaccard matches an independent set computation for one pair") {
    import spark.implicits._
    val m = Relational42.q322OverlapMatrix(spark, sf).cache()
    try {
      assert(m.filter($"source_a" >= $"source_b").count() === 0)
      assert(m.filter($"inter" > $"uni" || $"jaccard_permille" > 1000)
        .count() === 0)
      val row = m.orderBy($"source_a", $"source_b").head()
      val (sa, sb) = (row.getAs[String]("source_a"), row.getAs[String]("source_b"))
      def vocab(s: String) = Tables.documents(spark, sf)
        .filter($"source" === s)
        .select(explode(graft.functions.TextFunctions.tokens($"text")).as("t"))
        .filter($"t" =!= "").distinct().as[String].collect().toSet
      val (va, vb) = (vocab(sa), vocab(sb))
      assert(row.getAs[Long]("inter") === (va & vb).size.toLong)
      assert(row.getAs[Long]("uni") === (va | vb).size.toLong)
    } finally m.unpersist()
  }

  test("q323 quota holds and the plan is a TakeOrdered, not a global sort") {
    import spark.implicits._
    val d = Relational42.q323QuotaTopK(spark, sf)
    val rows = d.collect()
    assert(rows.length === 50)
    val bySource = rows.groupBy(_.getAs[String]("source"))
    assert(bySource.values.forall(_.length <= 5), "no source may exceed 5")
    assert(rows.forall(_.getAs[Long]("src_rank") <= 5))
    // top-50 is globally sorted by (qp desc, doc_id)
    val qps = rows.map(r => (-r.getAs[Long]("qp"), r.getAs[Long]("doc_id"))).toSeq
    assert(qps === qps.sorted)
    val plan = d.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      "global top-k must plan as TakeOrderedAndProject")
  }
}
