package graft

import org.apache.spark.sql.functions._

import graft.engine.Relational

class RelationalSpec extends SparkTestBase {
  import spark.implicits._

  test("q01: one row per returnflag, share in [0,1], counts positive") {
    val rows = Relational.q01FlagShareCount(spark, sf).collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      val share = r.getAs[Double]("disc_share")
      assert(share >= 0.0 && share <= 1.0)
      assert(r.getAs[Long]("counts") > 0)
    }
  }

  test("q02 counts sum to lineitem row count") {
    val total = Relational.q02TwoKeyCount(spark, sf)
      .agg(sum($"counts")).as[Long].head()
    val expected = spark.read.parquet(s"$sf/lineitem.parquet").count()
    assert(total == expected)
  }

  test("q03 pivot row sums equal q07 per-flag quantity sums") {
    val pivoted = Relational.q03PivotWide(spark, sf)
      .select($"l_returnflag", ($"F" + $"O").as("qty")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val grouped = Relational.q07GroupedSumMulti(spark, sf)
      .select($"l_returnflag", $"sum_qty").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(pivoted.keySet == grouped.keySet)
    pivoted.foreach { case (k, v) => assert(math.abs(v - grouped(k)) < 1e-6) }
  }

  test("q04 unpivot is the long form of q03 (round trip)") {
    val long = Relational.q04UnpivotLong(spark, sf)
    val back = long.groupBy($"l_returnflag")
      .pivot("l_linestatus", Seq("F", "O")).agg(first($"sum_qty"))
    val orig = Relational.q03PivotWide(spark, sf)
    assert(back.exceptAll(orig).isEmpty && orig.exceptAll(back).isEmpty)
  }

  test("q06 shares sum to 1 within each event_type") {
    val sums = Relational.q06WindowShare(spark, sf)
      .groupBy($"event_type").agg(sum($"share").as("s"))
      .select($"s").as[Double].collect()
    sums.foreach(s => assert(math.abs(s - 1.0) < 1e-3))
  }

  test("q09 dedup is idempotent and keys are unique") {
    val deduped = Relational.q09DedupFirst(spark, sf)
    val keys = deduped.select($"user_id", $"event_type")
    assert(keys.count() == keys.distinct().count())
  }

  test("q12 star join covers all 5 regions") {
    val rows = Relational.q12StarJoin(spark, sf).collect()
    assert(rows.length == 5)
    assert(rows.forall(_.getAs[Long]("counts") > 0))
  }

  test("q31/q50 grouping-set totals equal the ungrouped totals") {
    val liCount = spark.read.parquet(s"$sf/lineitem.parquet").count()
    for (q <- Seq(engine.Relational2.q31Rollup _, engine.Relational2.q50Cube _)) {
      val grand = q(spark, sf)
        .filter($"rf" === "(all)" && $"ls" === "(all)").collect()
      assert(grand.length == 1)
      assert(grand.head.getAs[Long]("counts") == liCount)
    }
  }

  test("q51 running count ends at the user's event count; ma3 within value range") {
    val events = engine.Tables.events(spark, sf)
    val perUser = events.groupBy($"user_id").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rows = engine.Relational2.q51MovingAvg(spark, sf).collect()
    val maxRunning = rows.groupBy(_.getAs[Long]("user_id"))
      .map { case (u, rs) => u -> rs.map(_.getAs[Long]("running_n")).max }
    assert(maxRunning == perUser)
    val (lo, hi) = events.agg(min($"value"), max($"value"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1))).head
    rows.foreach { r =>
      val ma = r.getDouble(3)
      assert(ma >= lo - 1e-6 && ma <= hi + 1e-6)
    }
  }

  test("q13 top-k is sorted descending and unique") {
    val prices = Relational.q13TopkOrders(spark, sf)
      .select($"o_totalprice").collect().map(_.getDouble(0))
    assert(prices.length == 10)
    assert(prices.sliding(2).forall(p => p(0) >= p(1)))
  }
}
