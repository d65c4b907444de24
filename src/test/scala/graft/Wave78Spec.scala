package graft

import org.apache.spark.sql.functions._

import graft.engine.{Relational59, Tables}

/** Wave 78 (q366–q368). Teeth beyond the hash gate: q366's risk-set
  * chain identity (n_{i+1} = n_i − d_i − c_i) and census (subjects =
  * customers with orders), q367's drawdown bounds plus a brute-force
  * recount of one series, q368's fixpoint (last round removes zero
  * nodes) and the core property itself (every survivor has induced
  * degree ≥ k). */
class Wave78Spec extends SparkTestBase {

  test("q366 risk sets chain exactly and census matches customers") {
    import spark.implicits._
    val df = Relational59.q366KaplanMeier(spark, sf).orderBy($"t").cache()
    try {
      val rows = df.select($"t", $"events", $"censored", $"at_risk")
        .as[(Long, Long, Long, Long)].collect()
      val nCust = Tables.orders(spark, sf)
        .select($"o_custkey").distinct().count()
      assert(rows.head._4 === nCust)
      rows.sliding(2).foreach { case Array(a, b) =>
        assert(b._4 === a._4 - a._2 - a._3,
          s"risk chain broke between t=${a._1} and t=${b._1}")
      }
      val last = rows.last
      assert(last._4 - last._2 - last._3 === 0L)
      assert(rows.map(r => r._2 + r._3).sum === nCust)
      assert(rows.forall(r => r._2 + r._3 > 0L))
    } finally df.unpersist()
  }

  test("q367 drawdown bounds hold and one series recounts brute-force") {
    import spark.implicits._
    val df = Relational59.q367MaxDrawdown(spark, sf).cache()
    try {
      val bad = df.filter($"max_drawdown_cents" < 0L ||
        $"peak_cents" < $"trough_cents" ||
        $"max_drawdown_cents" > $"peak_cents" - $"trough_cents").count()
      assert(bad === 0L)
      val etype = df.orderBy($"event_type").limit(1)
        .select($"event_type").as[String].head()
      val series = Tables.events(spark, sf)
        .filter($"event_type" === etype)
        .select(datediff(to_date($"ts"), lit("1995-01-01"))
          .cast("long").as("d"),
          expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)")
            .as("c"))
        .groupBy($"d").agg(sum($"c").as("v"))
        .orderBy($"d").as[(Long, Long)].collect()
      var rm = Long.MinValue
      var dd = 0L
      series.foreach { case (_, v) =>
        rm = math.max(rm, v); dd = math.max(dd, rm - v)
      }
      val got = df.filter($"event_type" === etype)
        .select($"max_drawdown_cents", $"n_days").as[(Long, Long)].head()
      assert(got._1 === dd)
      assert(got._2 === series.length.toLong)
    } finally df.unpersist()
  }

  test("q368 peel reaches fixpoint and survivors satisfy the core property") {
    import spark.implicits._
    val df = Relational59.q368KcorePeel(spark, sf).orderBy($"round").cache()
    try {
      val rows = df.select($"round", $"n_alive", $"n_removed")
        .as[(Long, Long, Long)].collect()
      assert(rows.length === Relational59.Q368Rounds + 1)
      rows.sliding(2).foreach { case Array(a, b) =>
        assert(b._2 <= a._2)
        assert(b._3 === a._2 - b._2)
      }
      assert(rows.last._3 === 0L,
        "peel did not reach fixpoint within the unroll budget")
      // rebuild the graph and check induced degrees of the survivors
      val li = Tables.lineitem(spark, sf)
        .select($"l_orderkey".as("ok"), $"l_partkey".as("pk")).distinct()
      val pairs = li.as("a")
        .join(li.as("b"), $"a.ok" === $"b.ok" && $"a.pk" < $"b.pk")
        .groupBy($"a.pk".as("u"), $"b.pk".as("v"))
        .agg(count(lit(1)).as("cnt")).filter($"cnt" >= 2L)
      val und = pairs.select($"u".as("src"), $"v".as("dst"))
        .unionAll(pairs.select($"v".as("src"), $"u".as("dst")))
      // replay the peel to obtain the member set, then assert degrees
      var alive = und.select($"src".as("n")).distinct().localCheckpoint()
      for (_ <- 1 to Relational59.Q368Rounds) {
        alive = und
          .join(alive.select($"n".as("sn")), $"src" === $"sn")
          .join(alive.select($"n".as("dn")), $"dst" === $"dn")
          .groupBy($"src").agg(count(lit(1)).as("deg"))
          .filter($"deg" >= Relational59.Q368K)
          .select($"src".as("n")).localCheckpoint()
      }
      assert(alive.count() === rows.last._2)
      val lowDeg = und
        .join(alive.select($"n".as("sn")), $"src" === $"sn")
        .join(alive.select($"n".as("dn")), $"dst" === $"dn")
        .groupBy($"src").agg(count(lit(1)).as("deg"))
        .filter($"deg" < Relational59.Q368K).count()
      assert(lowDeg === 0L)
    } finally df.unpersist()
  }
}
