package graft

import org.apache.spark.sql.functions._

import graft.engine.{Relational61, Tables}

/** Wave 80 (q372–q374). Teeth beyond the hash gate: q372's census
  * totals Σ C(n_i, 2) and a Scala re-classification of the busiest
  * customer's pairs, q373's RANSAC invariants (the two defining
  * points are always inliers; exactly the argmax rows carry is_best)
  * plus a brute-force inlier recount for one candidate, and q374's
  * conservation (cold+hits+expired == accesses) with hit counts
  * monotone in TTL. */
class Wave80Spec extends SparkTestBase {

  private val allenLabels = Set("equals", "precedes", "meets",
    "preceded_by", "met_by", "starts", "started_by", "finished_by",
    "finishes", "contains", "during", "overlaps", "overlapped_by")

  test("q372 census totals C(n,2) and one customer re-classifies") {
    import spark.implicits._
    val df = Relational61.q372AllenCensus(spark, sf).cache()
    try {
      val labels = df.select($"relation").as[String].collect().toSet
      assert(labels.subsetOf(allenLabels))
      val total = df.agg(sum($"n_pairs")).as[Long].head()
      val perCust = Tables.orders(spark, sf)
        .join(Tables.lineitem(spark, sf).select($"l_orderkey").distinct(),
          $"o_orderkey" === $"l_orderkey")
        .groupBy($"o_custkey").agg(count(lit(1)).as("n"))
      val expected = perCust.agg(sum(expr("n * (n - 1) div 2")))
        .as[Long].head()
      assert(total === expected)
      // brute-force the busiest customer through the same ladder
      val busiest = perCust.orderBy($"n".desc, $"o_custkey")
        .limit(1).select($"o_custkey").as[Long].head()
      val ivs = Tables.orders(spark, sf)
        .filter($"o_custkey" === busiest)
        .join(Tables.lineitem(spark, sf)
          .groupBy($"l_orderkey")
          .agg(max(to_date($"l_shipdate")).as("endd")),
          $"o_orderkey" === $"l_orderkey")
        .select($"o_orderkey",
          datediff(to_date($"o_orderdate"), lit("1995-01-01"))
            .cast("long").as("s"),
          datediff($"endd", lit("1995-01-01")).cast("long").as("e"))
        .as[(Long, Long, Long)].collect().sortBy(_._1)
      def classify(a: (Long, Long, Long), b: (Long, Long, Long)): String = {
        val (as, ae, bs, be) = (a._2, a._3, b._2, b._3)
        if (as == bs && ae == be) "equals"
        else if (ae < bs) "precedes"
        else if (ae == bs) "meets"
        else if (as > be) "preceded_by"
        else if (as == be) "met_by"
        else if (as == bs && ae < be) "starts"
        else if (as == bs) "started_by"
        else if (as < bs && ae == be) "finished_by"
        else if (as > bs && ae == be) "finishes"
        else if (as < bs && ae > be) "contains"
        else if (as > bs && ae < be) "during"
        else if (as < bs) "overlaps"
        else "overlapped_by"
      }
      val brute = (for {
        i <- ivs.indices; j <- (i + 1) until ivs.length
      } yield classify(ivs(i), ivs(j)))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val sparkSide = Relational61.q372AllenCensus(spark, sf)
      // the census is global; re-derive just this customer's share
      val mine = Tables.orders(spark, sf)
        .filter($"o_custkey" === busiest).count()
      assert(mine * (mine - 1) / 2 >= brute.values.sum) // lineitem-less orders drop
      assert(brute.keySet.subsetOf(allenLabels))
      assert(sparkSide.count() === df.count())
    } finally df.unpersist()
  }

  test("q373 defining points are inliers and is_best marks the argmax") {
    import spark.implicits._
    val df = Relational61.q373Ransac(spark, sf).cache()
    try {
      val rows = df.select($"cand", $"d1", $"d2", $"dy", $"dx",
        $"inliers", $"is_best").as[(Long, Long, Long, Long, Long, Long, Long)]
        .collect()
      assert(rows.length === Relational61.Q373K.toInt)
      assert(rows.forall(_._6 >= 2L), "both defining points are inliers")
      assert(rows.forall(r => r._5 > 0L), "dx positive after normalization")
      val mi = rows.map(_._6).max
      rows.foreach(r => assert((r._7 == 1L) === (r._6 == mi)))
      // brute-force candidate 1's consensus
      val daily = Tables.orders(spark, sf)
        .select(datediff(to_date($"o_orderdate"), lit("1995-01-01"))
          .cast("long").as("d"),
          expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)")
            .as("c"))
        .groupBy($"d").agg(sum($"c").as("y"))
        .as[(Long, Long)].collect()
      val tol = daily.map(_._2).sum / daily.length / 10
      val c1 = rows.find(_._1 == 1L).get
      val (d1, d2, dy, dx) = (c1._2, c1._3, c1._4, c1._5)
      val y1 = daily.find(_._1 == d1).get._2
      val recount = daily.count { case (d, y) =>
        math.abs((y - y1) * dx - (d - d1) * dy) <= tol * dx
      }
      assert(recount.toLong === c1._6)
    } finally df.unpersist()
  }

  test("q374 conserves accesses and hits are monotone in TTL") {
    import spark.implicits._
    val df = Relational61.q374TtlCache(spark, sf).cache()
    try {
      assert(df.filter($"cold" + $"hits" + $"expired" =!= $"accesses")
        .count() === 0L)
      val perType = Tables.events(spark, sf)
        .groupBy($"event_type").agg(count(lit(1)).as("n"),
          countDistinct($"user_id").as("keys"))
        .as[(String, Long, Long)].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
      df.select($"event_type", $"accesses", $"cold")
        .as[(String, Long, Long)].collect().foreach { case (t, a, c) =>
          assert(a === perType(t)._1)
          assert(c === perType(t)._2,
            "cold misses = distinct (user,type) keys of the type")
        }
      val byType = df.select($"event_type", $"ttl_us", $"hits")
        .as[(String, Long, Long)].collect()
        .groupBy(_._1).values
      byType.foreach { g =>
        val hs = g.sortBy(_._2).map(_._3)
        assert(hs.zip(hs.tail).forall { case (a, b) => a <= b })
      }
    } finally df.unpersist()
  }
}
