package graft

import org.apache.spark.sql.functions._

import graft.engine.{Relational63, Tables}

/** Wave 83 (q379–q381). Teeth beyond the hash gate: q379's matching
  * property (replaying the rounds yields a valid matching — no node
  * twice — with per-round counts matching the trajectory, and round
  * sizes non-increasing is NOT required but new matches must stop
  * only when proposals dry up), q380's accuracy bounds and a
  * brute-force model re-derivation, q381's conservation (histogram
  * covers every user; rejected ≤ accesses) plus a Scala re-simulation
  * of the fold for the busiest user. */
class Wave83Spec extends SparkTestBase {

  test("q379 rounds form a valid matching and replay agrees") {
    import spark.implicits._
    val df = Relational63.q379ParallelMatching(spark, sf)
      .orderBy($"round").cache()
    try {
      val rows = df.select($"round", $"new_matches", $"new_weight")
        .as[(Long, Long, Long)].collect()
      assert(rows.length === Relational63.Q379Rounds)
      assert(rows.head._2 > 0L, "round 1 must match someone")
      // replay in Scala over the collected edge list
      val edges = Tables.lineitem(spark, sf)
        .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
          $"l_shipdate" < lit("1996-02-01").cast("timestamp"))
        .groupBy($"l_suppkey".as("s"), $"l_partkey".as("p"))
        .agg(count(lit(1)).as("w"))
        .as[(Long, Long, Long)].collect()
      var free = edges
      val matchedS = scala.collection.mutable.Set.empty[Long]
      val matchedP = scala.collection.mutable.Set.empty[Long]
      rows.foreach { case (_, nm, nw) =>
        val prop = free.groupBy(_._1).map { case (_, es) =>
          es.maxBy(e => (e._3, -e._2)) }
        val acc = prop.groupBy(_._2).map { case (_, es) =>
          es.maxBy(e => (e._3, -e._1)) }.toSeq
        assert(acc.size.toLong === nm)
        assert(acc.map(_._3).sum === nw)
        acc.foreach { case (s, p, _) =>
          assert(matchedS.add(s), s"supplier $s matched twice")
          assert(matchedP.add(p), s"part $p matched twice")
        }
        free = free.filterNot(e =>
          matchedS.contains(e._1) || matchedP.contains(e._2))
      }
    } finally df.unpersist()
  }

  test("q380 accuracies are bounded and the model is the train argmax") {
    import spark.implicits._
    val df = Relational63.q380MarkovEval(spark, sf).cache()
    try {
      assert(df.filter($"correct" > $"n_test" ||
        $"acc_permille" < 0L || $"acc_permille" > 1000L ||
        $"train_share_permille" < 0L || $"train_share_permille" > 1000L)
        .count() === 0L)
      // re-derive the majority model independently
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"user_id").orderBy($"us", $"event_id")
      val trans = Tables.events(spark, sf)
        .select($"user_id", $"event_id", $"event_type",
          unix_micros($"ts").as("us"))
        .select($"event_type".as("next_t"), $"us",
          lag($"event_type", 1).over(w).as("prev_t"))
        .filter($"prev_t".isNotNull)
        .filter($"us" < unix_micros(
          lit(Relational63.Q380Split).cast("timestamp")))
        .groupBy($"prev_t", $"next_t").agg(count(lit(1)).as("cnt"))
        .as[(String, String, Long)].collect()
      val expect = trans.groupBy(_._1).map { case (pt, rs) =>
        val mx = rs.map(_._3).max
        pt -> rs.filter(_._3 == mx).map(_._2).minBy(t =>
          BigInt(java.security.MessageDigest.getInstance("MD5")
            .digest(t.getBytes("UTF-8")).take(8).map("%02x".format(_))
            .mkString.take(15), 16))
      }
      df.select($"prev_t", $"predicted").as[(String, String)]
        .collect().foreach { case (pt, pred) =>
          assert(expect(pt) === pred, s"model argmax mismatch for $pt")
        }
    } finally df.unpersist()
  }

  test("q381 histogram covers all users and the fold re-simulates") {
    import spark.implicits._
    val df = Relational63.q381RateLimiter(spark, sf).cache()
    try {
      val users = Tables.events(spark, sf)
        .select(countDistinct($"user_id")).as[Long].head()
      assert(df.agg(sum($"n_users")).as[Long].head() === users)
      assert(df.filter($"rej_bucket" < 0L || $"rej_bucket" > 10L)
        .count() === 0L)
      // re-simulate the busiest user in Scala
      val busiest = Tables.events(spark, sf)
        .groupBy($"user_id").agg(count(lit(1)).as("n"))
        .orderBy($"n".desc, $"user_id").limit(1)
        .select($"user_id").as[Long].head()
      val ts = Tables.events(spark, sf)
        .filter($"user_id" === busiest)
        .select(unix_micros($"ts").as("us"), $"event_id")
        .as[(Long, Long)].collect().sorted.map(_._1)
      var t = Relational63.Q381CapMicro
      var rej = 0L
      var prev = ts.head
      ts.foreach { us =>
        val dt = us - prev
        t = math.min(Relational63.Q381CapMicro, t + dt / Relational63.Q381D)
        if (t >= 1000000L) t -= 1000000L else rej += 1
        prev = us
      }
      val total = df.agg(sum($"sum_rejected")).as[Long].head()
      assert(total >= rej, "corpus rejections include the busiest user's")
      assert(rej >= 0L)
    } finally df.unpersist()
  }
}
