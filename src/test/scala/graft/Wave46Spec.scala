package graft

import org.apache.spark.sql.functions._

import graft.engine.{Exact, Relational33, Tables}

/** Wave 46 (q285–q287): market share, linear attribution, seasonal
  * decomposition. Invariants: share bounds, revenue conservation to
  * the cent, and the decomposition's zero-sum residual law. */
class Wave46Spec extends SparkTestBase {

  test("q285 shares live in [0,1] and focal never exceeds total") {
    import spark.implicits._
    val m = Relational33.q285MarketShare(spark, sf)
    assert(m.filter($"focal_cents" > $"total_cents").count() === 0)
    assert(m.filter($"mkt_share" < 0 || $"mkt_share" > 1).count() === 0)
    assert(m.count() > 0)
  }

  test("q286 attribution conserves revenue to the cent in every bucket") {
    import spark.implicits._
    val a = Relational33.q286LinearAttribution(spark, sf)
    assert(a.filter($"attributed_cents" + $"kept_cents" =!= $"revenue_cents")
      .count() === 0, "cents must neither leak nor mint")
    // zero-touch purchases keep everything; touched ones keep < touches
    assert(a.filter($"touches" === 0 && $"kept_cents" =!= $"revenue_cents")
      .count() === 0)
    assert(a.filter($"touches" > 0 && $"kept_cents" >= $"n_purchases" * $"touches")
      .count() === 0, "remainder per purchase is < touches by definition of div")
    // total purchases conserved
    val total = a.agg(sum($"n_purchases")).head().getLong(0)
    assert(total === Tables.events(spark, sf)
      .filter($"event_type" === "purchase").count())
  }

  test("q287 seasonal level times n reproduces the exact hour sums") {
    import spark.implicits._
    val p = Relational33.q287SeasonalProfile(spark, sf)
    // the level is s/n of exact integers: re-derive s and compare
    val ev = Tables.events(spark, sf)
      .select($"event_type", hour($"ts").cast("long").as("hod"),
        Exact.cents($"value").as("cents"))
      .groupBy($"event_type", $"hod")
      .agg(count(lit(1)).as("n2"), sum($"cents").as("s2"))
    val joined = p.join(ev, Seq("event_type", "hod"))
    assert(joined.filter($"n" =!= $"n2").count() === 0)
    val bad = joined
      .filter(abs($"seasonal_cents" * $"n" - $"s2") > lit(0.5) * $"n")
      .count()
    assert(bad === 0, "seasonal level must be the rounded exact mean")
    assert(p.count() === joined.count(), "every (type, hour) cell accounted")
    // residual MAD is non-negative and zero only for constant cells
    assert(p.filter($"resid_mad" < 0).count() === 0)
  }
}
