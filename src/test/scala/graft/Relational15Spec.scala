package graft

import org.apache.spark.sql.functions._

import graft.engine.{Relational15, Tables}

class Relational15Spec extends SparkTestBase {
  import spark.implicits._

  test("q174 the disordered replay really drops late rows, without re-emission") {
    val out = graft.streaming.Streaming.q174WatermarkReplay(spark, sf)
      .collect()
    // append mode must emit each finalized window exactly once
    val keys = out.map(r => (r.getString(0), r.getString(1)))
    assert(keys.distinct.length == keys.length, "duplicate emissions")
    // and the watermark must have discarded data: emitted totals fall
    // short of the full batch aggregate over the same emitted windows
    val emitted = out.map(_.getAs[Long]("counts")).sum
    val full = Tables.events(spark, sf).count()
    assert(emitted < full, s"expected late drops, kept $emitted of $full")
  }

  test("q175 cogroup reconciliation equals the relational full-outer audit") {
    val got = Relational15.q175CogroupReconcile(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("n_keys"),
        r.getAs[Long]("n_events"), r.getAs[Long]("n_orders"))).toMap
    val ev = Tables.events(spark, sf).groupBy($"user_id")
      .agg(count(lit(1)).as("ne"))
    val ord = Tables.orders(spark, sf).groupBy($"o_custkey".as("user_id"))
      .agg(count(lit(1)).as("no"))
    val joined = ev.join(ord, Seq("user_id"), "full_outer")
      .na.fill(0L, Seq("ne", "no")).collect()
    val both = joined.filter(r => r.getAs[Long]("ne") > 0 && r.getAs[Long]("no") > 0)
    assert(got("both")._1 == both.length)
    assert(got.values.map(_._1).sum == joined.length)
    assert(got.values.map(_._2).sum == Tables.events(spark, sf).count())
    assert(got.values.map(_._3).sum == Tables.orders(spark, sf).count())
  }

  test("q176 islands partition each type's ids and lengths telescope") {
    val rows = Relational15.q176Islands(spark, sf).collect()
    val perType = Tables.events(spark, sf).groupBy($"event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val t = r.getString(0)
      assert(r.getAs[Long]("n_ids") == perType(t))
      assert(r.getAs[Long]("max_len") >= 1)
      assert(r.getAs[Long]("n_singletons") <= r.getAs[Long]("n_islands"))
      // 5 interleaved types ⇒ each type's id set must be broken up
      assert(r.getAs[Long]("n_islands") > 1)
    }
  }

  test("q177 twap stays inside each group's value envelope and time telescopes") {
    val rows = Relational15.q177Twap(spark, sf).collect()
    val env = Tables.events(spark, sf)
      .select($"event_type", date_format($"ts", "yyyy-MM-dd").as("day"),
        graft.engine.Exact.cents($"value").as("c"))
      .groupBy($"day", $"event_type")
      .agg(min($"c").as("lo"), max($"c").as("hi"), count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("lo"), r.getAs[Long]("hi"), r.getAs[Long]("n"))).toMap
    rows.foreach { r =>
      val (lo, hi, n) = env((r.getString(0), r.getString(1)))
      val twap = r.getAs[Double]("twap_cents")
      assert(twap >= lo - 1e-6 && twap <= hi + 1e-6)
      assert(r.getAs[Long]("n") == n)
      // held time telescopes to (midnight − first event), up to one ms
      // of flooring per interval
      assert(r.getAs[Long]("held_ms") <= 86400000L)
      assert(r.getAs[Long]("held_ms") > 0L)
    }
  }
}
