package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions._

import graft.engine.{Relational74, Tables}

/** Wave 94 (q410–q412). Teeth beyond the hash gate: q410's
  * survivorship census is replayed cell-by-cell with an independent
  * md5; q411's pinball losses are recomputed from the collected
  * series (and the median predictor must win at q=500); q412's
  * trade-off rows are replayed failure-by-failure and must be
  * monotone (more checkpoints ⇒ less lost work). */
class Wave94Spec extends SparkTestBase {

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("q410 survivorship replays cell-by-cell") {
    import spark.implicits._
    val got = Relational74.q410GoldenRecord(spark, sf)
      .as[(String, Long, Long, Long, Long, Long, Long, Long)]
      .collect().map(r => r._1 -> r).toMap
    val names = Tables.customer(spark, sf)
      .select($"c_name".cast("string")).as[String].collect()
    for (f <- Relational74.Q410Fields) {
      var stale = 0L; var conflicted = 0L
      val from = Array(0L, 0L, 0L); var unresolved = 0L
      for (nm <- names) {
        val st = (0 to 2).map { r =>
          java.lang.Long.parseLong(
            md5hex(s"$nm#$r#$f").take(15), 16) % 5 == 0
        }
        stale += st.count(identity).toLong
        if (st.exists(identity)) conflicted += 1
        val chosen = (2 to 0 by -1).find(r => !st(r))
        chosen match {
          case Some(r) => from(r) += 1
          case None => unresolved += 1
        }
      }
      val row = got(f)
      assert(row._2 === names.length.toLong)
      assert(row._3 === stale)
      assert(row._4 === conflicted)
      assert((row._5, row._6, row._7) === ((from(2), from(1), from(0))))
      assert(row._8 === unresolved)
      assert(row._5 + row._6 + row._7 + row._8 === row._2)
    }
  }

  test("q411 pinball losses replay from the collected series") {
    import spark.implicits._
    val daily = Tables.orders(spark, sf)
      .select(datediff(to_date($"o_orderdate"), lit("1995-01-01"))
        .cast("long").as("d"))
      .groupBy($"d").agg(count(lit(1)).as("y"))
      .as[(Long, Long)].collect().toMap
    val (mn, mx) = (daily.keys.min, daily.keys.max)
    def y(d: Long) = daily.getOrElse(d, 0L)
    val scored = (mn + 7) to mx
    def pinball(q: Long, yv: Long, p: Long): Long =
      if (yv >= p) q * (yv - p) else (1000L - q) * (p - yv)
    val expect = (for {
      pred <- Seq("naive", "rolling_median")
      q <- Relational74.Q411Quantiles
    } yield {
      val losses = scored.map { d =>
        val p = if (pred == "naive") y(d - 1)
        else (1L to 7L).map(k => y(d - k)).sorted.apply(3)
        pinball(q, y(d), p)
      }
      (pred, q, scored.length.toLong, losses.sum,
        losses.sum / scored.length)
    }).sortBy(t => (t._1, t._2))
    val got = Relational74.q411PinballEval(spark, sf)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got === expect)
    // the median predictor wins the median-quantile loss on this series
    val loss = got.map(r => (r._1, r._2) -> r._4).toMap
    assert(loss(("rolling_median", 500L)) <= loss(("naive", 500L)))
  }

  test("q412 trade-off replays and is monotone in the interval") {
    import spark.implicits._
    val rows = Relational74.q412CheckpointTradeoff(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    val evs = Tables.events(spark, sf)
      .select(expr("unix_micros(ts) div 1000000").as("s"),
        $"event_type".cast("string"))
      .as[(Long, String)].collect()
    val t0 = evs.map(_._1).min
    val t1 = evs.map(_._1).max
    val fails = evs.filter(_._2 == "error").map(_._1)
    val expect = Relational74.Q412Intervals.map { i =>
      val ncp = (t1 - t0) / i + 1
      val lost = fails.map(s => (s - t0) % i).sum
      (i, fails.length.toLong, ncp, ncp * Relational74.Q412Cost,
        lost, ncp * Relational74.Q412Cost + lost)
    }
    assert(rows === expect)
    // longer intervals: fewer checkpoints, more lost work
    assert(rows.map(_._3) === rows.map(_._3).sorted.reverse)
    assert(rows.map(_._5) === rows.map(_._5).sorted)
  }
}
