package graft

import org.apache.spark.sql.functions._

import graft.engine.{Exact, Relational68, Tables}

/** Wave 88 (q393–q395). Teeth beyond the hash gate: q393's modality
  * gap must actually exist in the fixture (near-dup cosine mass ≫
  * baseline); q394's conformal radius must cover exactly the
  * calibration fraction it was cut at (by construction of the rank
  * quantile) and test coverage must be a sane permille; q395's
  * epsilon must be consistent with a brute-force recount on the
  * collected key sample. */
class Wave88Spec extends SparkTestBase {

  test("q393 near-dups dominate the baseline in cosine") {
    import spark.implicits._
    val df = Relational68.q393CrossModalAgreement(spark, sf).cache()
    try {
      val rows = df.select($"grp", $"n_pairs", $"high_permille",
        $"min_cos", $"max_cos")
        .as[(String, Long, Long, Double, Double)].collect()
        .map(r => r._1 -> r).toMap
      assert(rows.contains("neardup") && rows.contains("baseline"))
      val nd = rows("neardup"); val bl = rows("baseline")
      assert(nd._2 > 0L && bl._2 > 0L)
      assert(nd._3 >= bl._3,
        "near-dup high-cosine share must not trail the baseline")
      assert(nd._4 >= -1.0 && nd._5 <= 1.0)
      assert(bl._4 >= -1.0 && bl._5 <= 1.0)
    } finally df.unpersist()
  }

  test("q394 calibration quantile covers its own fraction exactly") {
    import spark.implicits._
    val row = Relational68.q394ConformalCoverage(spark, sf).head()
    val (nCal, q, nTest, covered, covPm) = (row.getLong(0),
      row.getLong(1), row.getLong(2), row.getLong(3), row.getLong(4))
    assert(covPm === 1000L * covered / nTest)
    // by construction: #cal residuals <= q is >= ceil(0.9(n+1))
    val o = Tables.orders(spark, sf).select(
      $"o_orderpriority".as("pri"), Exact.cents($"o_totalprice").as("y"),
      to_date($"o_orderdate").as("d"))
    val model = o.filter($"d" < lit(Relational68.Q394Fit))
      .groupBy($"pri").agg(expr("sum(y) div count(1)").as("yhat"))
    val cal = o.filter($"d" >= lit(Relational68.Q394Fit) &&
        $"d" < lit(Relational68.Q394Cal))
      .join(model, Seq("pri"))
      .select(abs($"y" - $"yhat").as("r"))
    assert(cal.count() === nCal)
    val rank = (9L * (nCal + 1L) + 9L) / 10L
    val below = cal.filter($"r" <= q).count()
    val belowStrict = cal.filter($"r" < q).count()
    assert(below >= rank && belowStrict < rank,
      "q is the exact rank-quantile of the calibration residuals")
    assert(nTest > 0L && covered <= nTest)
  }

  test("q395 epsilon recounts on the collected key frame") {
    import spark.implicits._
    val row = Relational68.q395InterpolationEpsilon(spark, sf).head()
    val (n, maxErr, p99, meanPm) = (row.getLong(0), row.getLong(1),
      row.getLong(2), row.getLong(3))
    val keys = Tables.orders(spark, sf)
      .select(Exact.cents($"o_totalprice").as("k"), $"o_orderkey")
      .as[(Long, Long)].collect().sortBy(t => (t._1, t._2)).map(_._1)
    assert(n === keys.length.toLong)
    val (mn, mx) = (keys.head, keys.last)
    val errs = keys.zipWithIndex.map { case (k, i) =>
      math.abs((k - mn) * (n - 1) / (mx - mn) + 1 - (i + 1L)) }
    assert(maxErr === errs.max)
    assert(meanPm === 1000L * errs.sum / n)
    val sorted = errs.sorted
    val p99rk = ((99L * n + 99L) / 100L).toInt
    assert(p99 === sorted(p99rk - 1))
  }
}
