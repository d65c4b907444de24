package graft

import org.apache.spark.sql.functions._

import graft.engine.{Relational52, Tables}

/** Wave 71 (q346–q348): sequence support, reconciliation, streaks.
  * Teeth: support is USER-distinct (bounded by the user count), the
  * reconciliation histogram conserves the order universe, and a
  * brute-force streak check on one type. */
class Wave71Spec extends SparkTestBase {

  test("q346 support is distinct-user bounded and trigram-shaped") {
    import spark.implicits._
    val d = Relational52.q346SequenceSupport(spark, sf)
    val users = Tables.events(spark, sf).select($"user_id").distinct().count()
    assert(d.filter($"support" > users).count() === 0)
    assert(d.count() === 10)
    assert(d.filter(size(split($"seq", ">")) =!= 3).count() === 0)
  }

  test("q347 histogram conserves the order universe") {
    import spark.implicits._
    val d = Relational52.q347Reconciliation(spark, sf)
    val total = d.agg(sum($"n_orders")).head().getLong(0)
    assert(total === Tables.orders(spark, sf).count())
    // fixture header totals are synthetic — at minimum the histogram
    // must be non-degenerate (not everything in one bucket is fine,
    // but counts must be positive where present)
    assert(d.filter($"n_orders" <= 0).count() === 0)
  }

  test("q348 streak matches a brute-force scan for every type") {
    import spark.implicits._
    val got = Relational52.q348LongestStreak(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("longest_streak_days"), r.getAs[Long]("start_day")))
      .toMap
    val days = Tables.events(spark, sf)
      .select($"event_type", expr("unix_micros(ts) div 86400000000"),
        graft.engine.Exact.cents($"value"))
      .as[(String, Long, Long)].collect()
      .groupBy(_._1)
    for ((et, rows) <- days) {
      val series = rows.groupBy(_._2).toSeq
        .map { case (d, xs) => (d, xs.map(_._3).sum) }.sortBy(_._1)
      var bestLen = 0L; var bestStart = Long.MaxValue
      var curLen = 0L; var curStart = 0L
      var prev: Option[(Long, Long)] = None
      for ((d, r) <- series) {
        val cont = prev.exists { case (pd, pr) => pd == d - 1 && pr < r }
        if (cont) curLen += 1
        else { curLen = 1; curStart = d }
        if (curLen > bestLen ||
          (curLen == bestLen && curStart < bestStart && curLen > 0)) {
          if (curLen > bestLen) { bestLen = curLen; bestStart = curStart }
        }
        prev = Some((d, r))
      }
      assert(got(et)._1 === bestLen, s"streak length for $et")
      assert(got(et)._2 === bestStart, s"streak start for $et")
    }
  }
}
