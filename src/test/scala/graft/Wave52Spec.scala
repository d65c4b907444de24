package graft

import org.apache.spark.sql.functions._

import graft.streaming.Streaming

/** Wave 52 (q300–q301): stream-stream LEFT SEMI and multi-source union
  * ingest. Invariants: the semi join is exactly the distinct left
  * projection of the inner interval join (no fan-out, no misses), and
  * the union aggregation's windows align to the 6-hour grid with the
  * append gate never emitting a window the watermark hasn't closed. */
class Wave52Spec extends SparkTestBase {

  test("q300 semi equals distinct-left of the q42 inner interval join") {
    import spark.implicits._
    val semi = Streaming.q300StreamSemiJoin(spark, sf)
      .select($"user_id", $"p_id").collect().toSeq
    assert(semi.nonEmpty)
    assert(semi.distinct.size === semi.size, "a purchase must emit at most once")
    val inner = Streaming.q42StreamStreamJoin(spark, sf)
      .select($"user_id", $"p_id").distinct().collect().toSeq
    assert(semi.toSet === inner.toSet,
      "semi = distinct left side of the inner interval join")
  }

  test("q301 windows sit on the 6h grid and the gate holds") {
    import spark.implicits._
    val out = Streaming.q301UnionIngest(spark, sf).cache()
    try {
      assert(out.count() > 0)
      val offGrid = out.filter(
        unix_timestamp($"ws", "yyyy-MM-dd HH:mm:ss") % (6 * 3600) =!= 0)
      assert(offGrid.count() === 0, "window starts must align to the 6h epoch grid")
      // Gate: no emitted window may end after (max event time - 1h).
      val mx = graft.engine.Tables.events(spark, sf)
        .filter($"event_type".isin("purchase", "error"))
        .agg(max($"ts")).head().getTimestamp(0).getTime // ms
      val late = out.filter(
        (unix_timestamp($"ws", "yyyy-MM-dd HH:mm:ss") + 6 * 3600) * 1000 >
          mx - 3600 * 1000)
      assert(late.count() === 0, "append mode must not emit an unclosed window")
      // Union completeness: emitted counts sum to all gated rows of BOTH types.
      val total = out.agg(sum($"counts")).head().getLong(0)
      val gated = graft.engine.Tables.events(spark, sf)
        .filter($"event_type".isin("purchase", "error"))
        .filter((floor(unix_timestamp($"ts") / (6 * 3600)) * (6 * 3600) +
          6 * 3600) * 1000 <= mx - 3600 * 1000)
        .count()
      assert(total === gated)
    } finally out.unpersist()
  }
}
