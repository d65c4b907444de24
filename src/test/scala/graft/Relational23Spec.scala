package graft

import org.apache.spark.sql.functions._

import graft.engine.{Relational23, Tables}

class Relational23Spec extends SparkTestBase {
  import spark.implicits._

  test("q211 every kept row achieves its part's regional minimum cost") {
    val rows = Relational23.q211MinCostSupplier(spark, sf).collect()
    assert(rows.nonEmpty)
    // re-derive the min per part from the output itself: a row whose
    // cost exceeds another row's cost for the same part escaped the filter
    rows.groupBy(_.getAs[Long]("p_partkey")).foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Long]("cost_cents")).distinct.length == 1,
        "two different costs survived for one part — the min filter leaked")
    }
    // suppliers must all be from the region
    val euSupp = Tables.supplier(spark, sf)
      .join(Tables.nation(spark, sf), $"s_nationkey" === $"n_nationkey")
      .join(Tables.region(spark, sf)
        .filter($"r_name" === Relational23.Q211Region),
        $"n_regionkey" === $"r_regionkey")
      .select($"s_name").as[String].collect().toSet
    assert(rows.forall(r => euSupp.contains(r.getAs[String]("s_name"))))
  }

  test("q211 plans broadcast joins for all dimensions (one fact shuffle)") {
    val p = Relational23.q211MinCostSupplier(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"),
      "dimension joins must broadcast, not shuffle the aggregated facts:\n" + p)
  }

  test("q212 kept parts each exceed the global share threshold") {
    val rows = Relational23.q212ImportantParts(spark, sf).collect()
    assert(rows.nonEmpty)
    val vals = rows.map(_.getAs[Long]("value_cents"))
    assert(vals.zip(vals.tail).forall { case (a, b) => a >= b })
  }

  test("q213 distribution covers every customer exactly once") {
    val rows = Relational23.q213CustDist(spark, sf).collect()
    val totalCust = rows.map(_.getAs[Long]("custdist")).sum
    assert(totalCust == Tables.customer(spark, sf).count(),
      "custdist must partition the full customer population (zeros included)")
    assert(rows.exists(_.getAs[Long]("c_count") == 0L) ||
      Tables.customer(spark, sf).count() == rows.map(r =>
        r.getAs[Long]("custdist")).sum)
  }

  test("q214 qualifying lines are genuinely below 20% of part average") {
    val rows = Relational23.q214SmallQtyRevenue(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("n_lines") > 0))
    // revenue of small-qty lines must be a strict subset of brand revenue
    val brandTotals = Tables.lineitem(spark, sf)
      .join(Tables.part(spark, sf)
        .filter($"p_brand".isin(Relational23.Q214Brands: _*)),
        $"l_partkey" === $"p_partkey")
      .groupBy($"p_brand")
      .agg(sum(graft.engine.Exact.cents($"l_extendedprice")).as("tot"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r.getAs[Long]("rev_cents") < brandTotals(r.getAs[String]("p_brand")))
    }
  }

  test("q215 every returned supplier is in-range and actually qualified") {
    val rows = Relational23.q215QualifiedSuppliers(spark, sf).collect()
    assert(rows.nonEmpty)
    val names = rows.map(_.getAs[String]("s_name")).toSeq
    assert(names == names.sorted)
    val lowNation = Tables.supplier(spark, sf)
      .filter($"s_nationkey" < Relational23.Q215MaxNation)
      .select($"s_name").as[String].collect().toSet
    assert(rows.forall(r => lowNation.contains(r.getAs[String]("s_name"))))
  }

  test("q216 anti join: no returned segment count exceeds its rich population") {
    val rows = Relational23.q216RichInactive(spark, sf).collect()
    assert(rows.nonEmpty, "the priority-scoped anti join must keep some customers")
    val segCust = Tables.customer(spark, sf)
      .filter($"c_mktsegment".isin(Relational23.Q216Segments: _*))
      .groupBy($"c_mktsegment").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r.getAs[Long]("n_cust") < segCust(r.getAs[String]("c_mktsegment")),
        "anti join kept the whole segment — filter or anti arm is broken")
    }
  }

  test("q217 nation pairs are symmetric-complete and never self-paired") {
    val rows = Relational23.q217VolumeShipping(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[String]("supp_nation") != r.getAs[String]("cust_nation"))
      assert(Seq(Relational23.Q217NationA, Relational23.Q217NationB)
        .contains(r.getAs[String]("supp_nation")))
    }
  }

  test("q218 disjunctive join stays a single broadcast hash join") {
    val df = Relational23.q218DisjunctiveRevenue(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("BroadcastNestedLoopJoin") &&
           !p.contains("CartesianProduct"),
      "the disjunction must stay a residual on the partkey equi join:\n" + p)
    assert(df.collect().nonEmpty)
  }
}
