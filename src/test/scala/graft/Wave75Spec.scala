package graft

import org.apache.spark.sql.functions._

import graft.engine.{Relational56, Tables}

/** Wave 75 (q358–q360): Theil–Sen/Mann–Kendall, median/MAD screen,
  * bounded min-plus SSSP. Teeth: the trend statistics match a local
  * O(days²) recompute, the medians/MADs match sorting the raw
  * multisets, and the distance histogram matches a local Bellman–Ford
  * run over the reconstructed weighted graph. */
class Wave75Spec extends SparkTestBase {

  private def densifiedSeries(): IndexedSeq[Long] = {
    import spark.implicits._
    val days = Tables.orders(spark, sf)
      .select(datediff(to_date($"o_orderdate"), lit("1995-01-01"))
        .cast("long"))
      .as[Long].collect()
    val counts = days.groupBy(identity)
      .map { case (k, v) => k -> v.size.toLong }
    (days.min to days.max).map(d => counts.getOrElse(d, 0L))
  }

  test("q358 matches a local pairwise recompute") {
    val row = Relational56.q358TheilSen(spark, sf).head()
    val y = densifiedSeries()
    val n = y.size
    val slopes = for {
      i <- 0 until n; j <- (i + 1) until n
    } yield {
      val dy = y(j) - y(i); val dx = (j - i).toLong
      Math.floorDiv(1000 * dy, dx)
    }
    val mk = (for { i <- 0 until n; j <- (i + 1) until n }
      yield (y(j) - y(i)).sign).sum
    val sorted = slopes.sorted
    val med = sorted((sorted.size + 1) / 2 - 1)
    assert(row.getAs[Long]("n_days") === n.toLong)
    assert(row.getAs[Long]("n_pairs") === slopes.size.toLong)
    assert(row.getAs[Long]("mk_s") === mk)
    assert(row.getAs[Long]("median_slope_permille") === med)
  }

  test("q359 medians and MADs match sorted-multiset recomputes") {
    import spark.implicits._
    val got = Relational56.q359MadOutliers(spark, sf).collect()
      .map(r => r.getAs[String]("cls") ->
        (r.getAs[Long]("n"), r.getAs[Long]("med"), r.getAs[Long]("mad"),
          r.getAs[Long]("n_outliers"), r.getAs[Long]("max_dev"))).toMap
    val rows = Tables.orders(spark, sf)
      .select($"o_orderpriority",
        ($"o_totalprice".cast("decimal(18,2)") * 100).cast("long"))
      .as[(String, Long)].collect()
    def lowerMedian(xs: Seq[Long]): Long = {
      val s = xs.sorted; s((s.size + 1) / 2 - 1)
    }
    val sim = rows.groupBy(_._1).map { case (cls, vs) =>
      val xs = vs.map(_._2).toSeq
      val med = lowerMedian(xs)
      val devs = xs.map(v => math.abs(v - med))
      val mad = lowerMedian(devs)
      cls -> ((xs.size.toLong, med, mad,
        devs.count(_ > 3 * mad).toLong, devs.max))
    }
    assert(got === sim)
    // fence consistency: outliers exist iff the worst deviation breaches
    // it, and a 50%-breakdown fence can never flag a majority
    for ((cls, (n, _, mad, out, maxDev)) <- got) {
      assert((out > 0L) === (maxDev > 3 * mad), s"fence of $cls")
      assert(out * 2 < n, s"MAD fence of $cls flags a minority")
    }
  }

  test("q360 histogram matches a local Bellman-Ford run") {
    import spark.implicits._
    val got = Relational56.q360SsspMinplus(spark, sf).collect()
      .map(r => r.getAs[Long]("band") ->
        (r.getAs[Long]("n_parts"), r.getAs[Long]("min_dist"),
          r.getAs[Long]("max_dist"))).toMap
    val li = Tables.lineitem(spark, sf)
      .select($"l_orderkey", $"l_partkey").distinct()
      .as[(Long, Long)].collect().groupBy(_._1)
    val cnt = scala.collection.mutable.Map[(Long, Long), Long]()
      .withDefaultValue(0L)
    for (ls <- li.values) {
      val ps = ls.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length)
        cnt((ps(i), ps(j))) += 1
    }
    val adj = scala.collection.mutable.Map[Long, List[(Long, Long)]]()
      .withDefaultValue(Nil)
    for (((u, v), c) <- cnt) {
      val w = 1 + 1000 / c
      adj(u) = (v, w) :: adj(u); adj(v) = (u, w) :: adj(v)
    }
    val seeds = Tables.part(spark, sf).filter($"p_size" === 50)
      .select($"p_partkey").as[Long].collect()
    var dist = seeds.map(_ -> 0L).toMap
    for (_ <- 1 to Relational56.Q360Rounds) {
      val next = scala.collection.mutable.Map[Long, Long]() ++ dist
      for ((u, d) <- dist; (v, w) <- adj(u))
        if (!next.contains(v) || next(v) > d + w) next(v) = d + w
      dist = next.toMap
    }
    val sim = dist.values.groupBy(_ / 500).map { case (b, ds) =>
      b -> ((ds.size.toLong, ds.min, ds.max))
    }
    assert(got === sim)
    // seeds stay at distance zero; relaxation reached beyond them
    assert(got(0L)._2 === 0L)
    assert(dist.size > seeds.length)
  }
}
