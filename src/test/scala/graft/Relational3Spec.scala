package graft

import org.apache.spark.sql.functions._

import graft.engine.{Relational3, Tables}

class Relational3Spec extends SparkTestBase {
  import spark.implicits._

  test("q52 set algebra: |either| = |P| + |E| - |both|, purchase_only = |P| - |both|") {
    val counts = Relational3.q52SetOps(spark, sf).collect()
      .map(r => r.getAs[String]("op") -> r.getAs[Long]("n_users")).toMap
    val ev = Tables.events(spark, sf)
    def n(t: String) = ev.filter($"event_type" === t).select($"user_id").distinct().count()
    assert(counts("either") == n("purchase") + n("error") - counts("both"))
    assert(counts("purchase_only") == n("purchase") - counts("both"))
  }

  test("q53 outer join keeps every hour from both sides and zero-fills") {
    val joined = Relational3.q53OuterJoin(spark, sf)
    val pHours = Tables.events(spark, sf).filter($"event_type" === "purchase")
      .select(date_format($"ts", "yyyy-MM-dd HH").as("h")).distinct().count()
    val eHours = Tables.events(spark, sf).filter($"event_type" === "error")
      .select(date_format($"ts", "yyyy-MM-dd HH").as("h")).distinct().count()
    assert(joined.count() >= math.max(pHours, eHours))
    assert(joined.filter($"p_n" === 0 || $"e_n" === 0).count() > 0,
      "grain should be sparse enough that coalesce-to-0 actually fires")
    assert(joined.filter($"p_n".isNull || $"e_n".isNull).count() == 0)
  }

  test("q54 rank is row_number-compatible: rnk <= position, drnk <= rnk, quartile in 1..4") {
    val rows = Relational3.q54RankFamily(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getAs[Int]("drnk") <= r.getAs[Int]("rnk"))
      val q = r.getAs[Int]("quartile")
      assert(q >= 1 && q <= 4)
    }
  }

  test("q55 arg-max event really carries the group's max value") {
    val ev = Tables.events(spark, sf).select($"event_id", $"event_type", $"value")
    val got = Relational3.q55ArgMinMax(spark, sf)
      .join(ev, $"max_value_event" === $"event_id")
      .select($"max_value", $"value").collect()
    got.foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 0.005 + 1e-9))
  }

  test("q56 histogram counts total to the table size; buckets non-negative") {
    val h = Relational3.q56Histogram(spark, sf)
    assert(h.agg(sum($"counts")).as[Long].head() == Tables.events(spark, sf).count())
    assert(h.filter($"bucket" < 0).count() == 0)
  }

  test("q58 above-average orders are a strict subset, and every status appears") {
    val above = Relational3.q58CorrelatedSubq(spark, sf).collect()
      .map(r => r.getAs[String]("o_orderstatus") -> r.getAs[Long]("n_above")).toMap
    val total = Tables.orders(spark, sf).groupBy($"o_orderstatus")
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getAs[String]("o_orderstatus") -> r.getAs[Long]("n")).toMap
    assert(above.keySet == total.keySet)
    above.foreach { case (k, n) => assert(n > 0 && n < total(k)) }
  }

  test("q59 frame fan-out matches per-doc frame counts; offsets are stride-aligned") {
    val frames = graft.engine.Multimodal.q59FrameSample(spark, sf)
    val L = graft.engine.Multimodal.FrameLen
    val byDoc = frames.groupBy($"doc_id").agg(
      count(lit(1)).as("n"), max($"frame_idx").as("mx")).collect()
    byDoc.foreach(r => assert(r.getAs[Long]("mx") == r.getAs[Long]("n") - 1))
    assert(frames.filter($"byte_offset" =!= $"frame_idx" * L).count() == 0)
  }

  test("q60 percent_rank/cume_dist are in [0,1] and cume_dist is ≥ percent_rank") {
    Relational3.q60PercentRank(spark, sf).collect().foreach { r =>
      val pr = r.getAs[Double]("pr"); val cd = r.getAs[Double]("cd")
      assert(pr >= 0.0 && pr <= 1.0 && cd > 0.0 && cd <= 1.0 && cd >= pr)
    }
  }

  test("q64 gap fill produces a complete dense grid and preserves totals") {
    val filled = Relational3.q64GapFill(spark, sf)
    val types = Tables.events(spark, sf).select($"event_type").distinct().count()
    val hours = filled.select($"ws").distinct().count()
    assert(filled.count() == types * hours, "grid must be dense: |types| × |hours|")
    assert(filled.filter($"counts" === 0).count() > 0, "zero-fill must fire")
    assert(filled.agg(sum($"counts")).as[Long].head() ==
      Tables.events(spark, sf).count(), "gap fill must not lose or invent events")
  }

  test("q57 sample rate lands near 5% and is deterministic across runs") {
    val n = Tables.events(spark, sf).count()
    val s1 = Relational3.q57StratifiedSample(spark, sf)
      .agg(sum($"n_sampled")).as[Long].head()
    val s2 = Relational3.q57StratifiedSample(spark, sf)
      .agg(sum($"n_sampled")).as[Long].head()
    assert(s1 == s2)
    assert(s1 > n * 0.02 && s1 < n * 0.10)
  }
}
