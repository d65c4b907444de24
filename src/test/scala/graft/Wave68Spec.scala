package graft

import org.apache.spark.sql.functions._

import graft.engine.{Exact, Relational49, Tables}

/** Wave 68 (q339–q340): change-point split and greedy set cover, both
  * brute-force replicated from collected data. */
class Wave68Spec extends SparkTestBase {

  test("q339 split maximizes the mean-shift statistic (brute force)") {
    import spark.implicits._
    val out = Relational49.q339ChangePoint(spark, sf).collect()
    val cells = Tables.events(spark, sf)
      .select($"event_type", expr("unix_micros(ts) div 86400000000"),
        Exact.cents($"value"))
      .as[(String, Long, Long)].collect()
    for (row <- out) {
      val et = row.getAs[String]("event_type")
      val days = cells.filter(_._1 == et).groupBy(_._2).toSeq
        .map { case (d, xs) => (d, xs.length.toLong, xs.map(_._3).sum) }
        .sortBy(_._1)
      val nt = days.map(_._2).sum
      val st = days.map(_._3).sum
      var n1 = 0L; var s1 = 0L
      var best = (-1L, -1L) // (metric, -day) max
      var bestDay = -1L
      for ((d, n, s) <- days) {
        n1 += n; s1 += s
        val metric = math.abs(s1 * (nt - n1) - (st - s1) * n1)
        if (metric > best._1) { best = (metric, -d); bestDay = d }
      }
      assert(row.getAs[Long]("split_day") === bestDay, s"split for $et")
      assert(row.getAs[Long]("metric") === best._1)
    }
  }

  test("q340 greedy picks replicate the set-cover simulation") {
    import spark.implicits._
    val out = Relational49.q340GreedyCover(spark, sf).orderBy($"step").collect()
    assert(out.length > 2, "the shard structure must need several picks")
    // gains never increase (submodularity of the greedy trajectory)
    val gains = out.map(_.getAs[Long]("gain")).toSeq
    assert(gains === gains.sortBy(-_))
    // brute-force simulate
    val pairs = Tables.documents(spark, sf)
      .select($"doc_id", concat($"source", lit("/"), $"lang").as("shard"),
        graft.functions.TextFunctions.tokens($"text").as("tk"))
      .select($"doc_id", $"shard", explode(expr(
        "CASE WHEN size(tk) >= 3 THEN transform(sequence(1, size(tk) - 2)," +
          " i -> concat_ws(' ', tk[i-1], tk[i], tk[i+1]))" +
          " ELSE array() END")).as("t"))
      .select($"doc_id", $"shard", $"t")
      .as[(Long, String, String)].collect()
    val u = pairs.filter(_._1 % 10 == 0).map(_._3).toSet
    val sets = pairs.filter(p => u(p._3)).groupBy(_._2)
      .view.mapValues(_.map(_._3).toSet).toMap
    var covered = Set.empty[String]
    for (row <- out) {
      val best = sets.keys.toSeq.sorted
        .maxBy(s => (sets(s) -- covered).size)
      // maxBy keeps the FIRST max in sorted order == shard-asc tiebreak
      assert(row.getAs[String]("shard") === best)
      assert(row.getAs[Long]("gain") === (sets(best) -- covered).size.toLong)
      covered ++= sets(best)
      assert(row.getAs[Long]("cum_covered") === covered.size.toLong)
    }
  }
}
