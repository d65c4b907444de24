package graft

import org.apache.spark.sql.functions._

import graft.engine.{Relational65, Tables}

/** Wave 85 (q385–q387). Teeth beyond the hash gate: q385's alert set
  * is a subset of hours and recounts brute-force from the hourly
  * census; q386's identities (Σ C(c,2) is even — each 4-cycle has
  * exactly two diagonals — and a brute-force C4 recount on the
  * collected edge list); q387's histogram covers all users with ≥2
  * gaps and the fold re-simulates for the busiest user. */
class Wave85Spec extends SparkTestBase {

  test("q385 alerts recount from the hourly census") {
    import spark.implicits._
    val df = Relational65.q385BurnRateAlerts(spark, sf).cache()
    try {
      assert(df.filter($"n_alerts" > $"n_hours").count() === 0L)
      val hours = Tables.events(spark, sf)
        .select(expr(s"unix_micros(ts) div ${Relational65.Q385HourUs}")
          .as("h"), ($"event_type" === "error").cast("long").as("e"))
        .groupBy($"h").agg(count(lit(1)).as("t"), sum($"e").as("e"))
        .as[(Long, Long, Long)].collect().sortBy(_._1)
      val byH = hours.map(r => r._1 -> (r._2, r._3)).toMap
      var alerts = 0L
      hours.foreach { case (h, t1, e1) =>
        val win = (h - 5 to h).flatMap(byH.get)
        val (t6, e6) = (win.map(_._1).sum, win.map(_._2).sum)
        if (1000 * e1 > Relational65.Q385Short * t1 &&
            1000 * e6 > Relational65.Q385Long * t6) alerts += 1
      }
      assert(df.agg(sum($"n_alerts")).as[Long].head() === alerts)
      assert(df.agg(sum($"n_hours")).as[Long].head() === hours.length.toLong)
    } finally df.unpersist()
  }

  test("q386 degeneracy-ordered c4 equals the classical diagonal identity and a rank-restricted recount") {
    import spark.implicits._
    val row = Relational65.q386QuadrangleCensus(spark, sf).head()
    val (n, m, wedges, diagPairs, c4) = (row.getLong(0), row.getLong(1),
      row.getLong(2), row.getLong(3), row.getLong(4))
    assert(wedges >= m && n > 0L)
    // brute-force on the collected edge list
    val li = Tables.lineitem(spark, sf)
      .select($"l_orderkey".as("ok"), $"l_partkey".as("pk")).distinct()
    val edges = li.as("a")
      .join(li.as("b"), $"a.ok" === $"b.ok" && $"a.pk" < $"b.pk")
      .groupBy($"a.pk".as("u"), $"b.pk".as("v"))
      .agg(count(lit(1)).as("c")).filter($"c" >= 2L)
      .select($"u", $"v").as[(Long, Long)].collect()
    val adj = scala.collection.mutable.Map
      .empty[Long, scala.collection.mutable.Set[Long]]
    edges.foreach { case (u, v) =>
      adj.getOrElseUpdate(u, scala.collection.mutable.Set.empty) += v
      adj.getOrElseUpdate(v, scala.collection.mutable.Set.empty) += u
    }
    assert(n === adj.size.toLong && m === edges.length.toLong)
    val nodes = adj.keys.toArray.sorted
    // (1) the CLASSICAL identity the old implementation computed:
    // Σ_{a<b} C(common(a,b), 2) counts every 4-cycle twice (one per
    // diagonal) — the degeneracy-ordered query must equal its half
    var sc2 = 0L
    for (i <- nodes.indices; j <- (i + 1) until nodes.length) {
      val c = (adj(nodes(i)) & adj(nodes(j))).size.toLong
      sc2 += c * (c - 1) / 2
    }
    assert(sc2 % 2 === 0L, "every 4-cycle has exactly two diagonals")
    assert(c4 === sc2 / 2,
      "degeneracy-ordered count must equal the classical identity's half")
    // (2) the rank-restricted recount the query actually runs:
    // η(x) = (deg(x), x); from each pair (v, w) with η(w) < η(v),
    // W = common neighbors below η(v); Σ C(W,2) counts each cycle once
    def rank(x: Long): (Long, Long) = (adj(x).size.toLong, x)
    implicit val ord: Ordering[(Long, Long)] =
      Ordering.Tuple2[Long, Long]
    var dp = 0L; var c4r = 0L
    for (i <- nodes.indices; j <- nodes.indices; if i != j) {
      val (v, w) = (nodes(i), nodes(j))
      if (ord.lt(rank(w), rank(v))) {
        val cc = (adj(v) & adj(w)).count(u => ord.lt(rank(u), rank(v))).toLong
        if (cc >= 1) dp += 1
        c4r += cc * (cc - 1) / 2
      }
    }
    assert(diagPairs === dp)
    assert(c4 === c4r)
  }

  test("q386 wedge budget refuses a pathologically dense graph loudly") {
    spark.conf.set("spark.graft.q386.wedgeBudget", "1")
    try {
      val e = intercept[IllegalArgumentException](
        Relational65.q386QuadrangleCensus(spark, sf).head())
      assert(e.getMessage.contains("wedge"),
        s"expected the wedge-budget refusal, got: ${e.getMessage}")
    } finally spark.conf.unset("spark.graft.q386.wedgeBudget")
    // and the default budget admits the fixture graph
    assert(Relational65.q386QuadrangleCensus(spark, sf).count() === 1L)
  }

  test("q387 histogram covers users with >=2 gaps; fold re-simulates") {
    import spark.implicits._
    val df = Relational65.q387BackoffChains(spark, sf).cache()
    try {
      val eligible = Tables.events(spark, sf)
        .groupBy($"user_id").agg(count(lit(1)).as("n"))
        .filter($"n" >= 3L).count() // >=3 events -> >=2 gaps -> >=1 flag
      assert(df.agg(sum($"n_users")).as[Long].head() === eligible)
      // re-simulate the busiest user
      val busiest = Tables.events(spark, sf)
        .groupBy($"user_id").agg(count(lit(1)).as("n"))
        .orderBy($"n".desc, $"user_id").limit(1)
        .select($"user_id").as[Long].head()
      val us = Tables.events(spark, sf).filter($"user_id" === busiest)
        .select(unix_micros($"ts"), $"event_id").as[(Long, Long)]
        .collect().sorted.map(_._1)
      val gaps = us.sliding(2).map(a => a(1) - a(0)).toArray
      var cur = 0L; var mx = 0L
      gaps.sliding(2).foreach { case Array(pg, g) =>
        if (pg > 0 && 3 * pg <= 2 * g && 2 * g <= 5 * pg) {
          cur += 1; mx = math.max(mx, cur)
        } else cur = 0
      }
      assert(mx <= 10L, "busiest user's chain fits the histogram domain")
    } finally df.unpersist()
  }
}
