package graft

import org.apache.spark.sql.functions._

import graft.engine.{Relational60, Tables}

/** Wave 79 (q369–q371). Teeth beyond the hash gate: q369's L1 bound
  * (0 ≤ t ≤ 2000 permille) and group census, q370's bucket coverage
  * plus a brute-force recount of one bucket's argmax, and q371's
  * conservation law (Σ alloc == capacity EXACTLY) with max-min
  * optimality structure (capped tenants all sit within one cent of
  * the water level, no satisfied demand exceeds any capped
  * allocation). */
class Wave79Spec extends SparkTestBase {

  test("q369 t-closeness is bounded and groups census the join") {
    import spark.implicits._
    val df = Relational60.q369TCloseness(spark, sf).cache()
    try {
      assert(df.filter($"t_permille" < 0L || $"t_permille" > 2000L)
        .count() === 0L)
      val nOrders = Tables.orders(spark, sf).count()
      assert(df.agg(sum($"n_orders")).as[Long].head() === nOrders)
    } finally df.unpersist()
  }

  test("q370 buckets cover the calendar and one argmax recounts") {
    import spark.implicits._
    val df = Relational60.q370LtobDownsample(spark, sf)
      .orderBy($"bucket").cache()
    try {
      val rows = df.select($"bucket", $"sel_day", $"score")
        .as[(Long, Long, Long)].collect()
      assert(rows.nonEmpty && rows.forall(_._3 >= 0L))
      // selected day must fall inside its bucket's day range
      val daily = Tables.orders(spark, sf)
        .select(datediff(to_date($"o_orderdate"), lit("1995-01-01"))
          .cast("long").as("d"),
          expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)")
            .as("c"))
      val (mn, mx) = daily.agg(min($"d"), max($"d"))
        .as[(Long, Long)].head()
      val w = (mx - mn + 1) / Relational60.Q370Buckets + 1
      rows.foreach { case (b, d, _) =>
        assert((d - mn) / w === b, s"day $d escaped bucket $b")
      }
      // brute-force the argmax for the first bucket
      val series = daily.groupBy($"d").agg(sum($"c").as("y"))
        .as[(Long, Long)].collect().toMap
      def y(d: Long): Long = series.getOrElse(d, 0L)
      val b0 = rows.head
      val cand = ((mn + 1) to mx)
        .filter(d => (d - mn) / w == b0._1)
        .map(d => (d, math.abs(y(d - 1) - 2 * y(d) + y(d + 1))))
      val bestScore = cand.map(_._2).max
      val bestDay = cand.filter(_._2 == bestScore).map(_._1).min
      assert(b0._2 === bestDay && b0._3 === bestScore)
    } finally df.unpersist()
  }

  test("q371 allocation conserves capacity and is max-min fair") {
    import spark.implicits._
    val df = Relational60.q371FairShare(spark, sf).cache()
    try {
      val rows = df.select($"demand", $"alloc", $"fully_satisfied")
        .as[(Long, Long, Long)].collect()
      val cap = rows.map(_._1).sum / 2
      assert(rows.map(_._2).sum === cap, "allocation must exhaust capacity")
      rows.foreach { case (d, a, f) =>
        assert(a <= d, "no tenant is over-allocated")
        assert((f == 1L) === (a == d) || (f == 0L && a == d),
          "full flag consistent")
      }
      val capped = rows.filter(_._3 == 0L).map(_._2)
      assert(capped.nonEmpty, "capacity at 50% must cap someone")
      assert(capped.max - capped.min <= 1L,
        "capped tenants sit within one remainder cent of each other")
      val fullMax = rows.filter(_._3 == 1L).map(_._2)
        .foldLeft(0L)(math.max)
      assert(fullMax <= capped.max,
        "no satisfied demand exceeds a capped allocation")
    } finally df.unpersist()
  }
}
