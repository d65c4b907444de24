package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.engine.{Dedup, Relational8, Tables}

/** Tenth query wave: count-min frequency bounds, LATERAL top-k,
  * recursive-CTE k-hop reach, native session windows, exact-integer
  * regression, inverted-index postings, BM25 weighting. */
class Relational8Spec extends SparkTestBase {
  import spark.implicits._

  test("q117 CMS sandwich: estimate over-counts only, within eps*N") {
    val rows = Relational8.q117CmsBounds(spark, sf).collect()
    val nUsers = Tables.events(spark, sf).select($"user_id").distinct().count()
    assert(rows.length == math.min(20L, nUsers))
    assert(rows.forall(_.getAs[Boolean]("within_bound")),
      "count-min estimates must sit in [exact, exact + eps*N]")
    // the shortlist is the true top-20: recompute independently
    val expected = Tables.events(spark, sf)
      .groupBy($"user_id").agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"user_id").limit(20)
      .select($"user_id").as[Long].collect()
    assert(rows.map(_.getAs[Long]("user_id")).toSeq == expected.toSeq)
  }

  test("q118 LATERAL top-3 equals the window-function formulation") {
    val lateral = Relational8.q118LateralTopk(spark, sf)
      .select($"n_name", $"c_name", $"c_acctbal").collect().toSet
    val w = Window.partitionBy($"n_nationkey")
      .orderBy($"c_acctbal_d".desc, $"c_custkey")
    val windowed = Tables.customer(spark, sf)
      .join(Tables.nation(spark, sf), $"c_nationkey" === $"n_nationkey")
      .withColumn("c_acctbal_d", $"c_acctbal".cast("decimal(18,2)"))
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= 3)
      .select($"n_name", $"c_name",
        graft.engine.Exact.decToDouble($"c_acctbal_d", 2).as("c_acctbal"))
      .collect().toSet
    assert(lateral == windowed, "decorrelated LATERAL must match window top-k")
  }

  test("q119 reach: direct neighbors are mutual and bounded by cluster size") {
    val reach = Dedup.q119KhopReach(spark, sf).collect()
      .map(r => r.getAs[Long]("doc") -> r.getAs[Long]("n_reach3")).toMap
    val pairs = Dedup.q21MinhashLsh(spark, sf)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect()
    // every doc in a candidate pair is a seed and reaches its partner
    pairs.foreach { case (a, b) =>
      assert(reach.contains(a) && reach.contains(b))
      assert(reach(a) >= 1 && reach(b) >= 1)
    }
    // 3-hop reach never exceeds the doc's connected component
    val comp = Dedup.q67DedupClusters(spark, sf).collect()
      .map(r => r.getAs[Long]("doc") -> r.getAs[Long]("canonical")).toMap
    val compSize = comp.groupBy(_._2).view.mapValues(_.size).toMap
    reach.foreach { case (doc, n) =>
      assert(n <= compSize(comp(doc)) - 1,
        s"doc $doc reaches $n but component holds ${compSize(comp(doc))}")
    }
  }

  test("q121 moments match a driver-side exact recomputation") {
    val got = Relational8.q121LinearTrend(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Double]("slope"), r.getAs[Double]("intercept"),
         r.getAs[Double]("r2"))).toMap
    val hourly = Tables.events(spark, sf)
      .groupBy($"event_type", expr("unix_micros(ts) div 3600000000").as("h"))
      .agg(count(lit(1)).as("y"))
      .as[(String, Long, Long)].collect()
      .groupBy(_._1)
    hourly.foreach { case (tpe, rows) =>
      val h0 = rows.map(_._2).min
      val xs = rows.map(r => r._2 - h0)
      val ys = rows.map(_._3)
      val n = rows.length.toLong
      val (sx, sy) = (xs.sum, ys.sum)
      val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum
      val sxx = xs.map(x => x * x).sum
      val syy = ys.map(y => y * y).sum
      val num = (n * sxy - sx * sy).toDouble
      val dx = (n * sxx - sx * sx).toDouble
      val dy = (n * syy - sy * sy).toDouble
      def r6(v: Double) = BigDecimal(v)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val (slope, intercept, r2) = got(tpe)
      assert(slope == r6(num / dx))
      assert(intercept == r6((sy * sxx - sx * sxy).toDouble / dx))
      assert(r2 == r6(num * num / (dx * dy)))
      assert(r2 >= 0.0 && r2 <= 1.0 + 1e-9)
    }
  }

  test("q122 postings: head length = min(df, 20), sorted, distinct, present") {
    val rows = Relational8.q122InvertedIndex(spark, sf).collect()
    assert(rows.nonEmpty)
    val docIds = Tables.documents(spark, sf)
      .select($"doc_id").as[Long].collect().toSet
    rows.foreach { r =>
      val df = r.getAs[Long]("df")
      val ids = r.getAs[String]("postings_head").split(",").map(_.toLong)
      assert(ids.length == math.min(df, Relational8.PostingHead.toLong))
      assert(ids.sameElements(ids.sorted), "postings must be doc_id-sorted")
      assert(ids.distinct.length == ids.length, "postings must be distinct")
      assert(ids.forall(docIds.contains), "postings point at real docs")
    }
    // the head is the true prefix: the smallest doc containing the token
    // leads its list
    val first = rows.head
    val tok = first.getAs[String]("token")
    val minDoc = Tables.documents(spark, sf)
      .select($"doc_id", explode(graft.functions.TextFunctions.tokens($"text")).as("t"))
      .filter($"t" === tok).agg(min($"doc_id")).as[Long].head()
    assert(first.getAs[String]("postings_head").split(",").head.toLong == minDoc)
  }

  test("q123 BM25: dense ranks, positive weights, saturation beats raw tf") {
    val rows = Relational8.q123Bm25(spark, sf).collect()
    val byDoc = rows.groupBy(_.getAs[Long]("doc_id"))
    byDoc.foreach { case (_, rs) =>
      val ranks = rs.map(_.getAs[Int]("rank")).sorted
      assert(ranks.sameElements(1 to ranks.length), "ranks are dense from 1")
      rs.foreach(r => assert(r.getAs[Double]("bm25") > 0.0))
      // within a doc, ordering by bm25 desc then token is what rank says
      val sorted = rs.sortBy(r => (-r.getAs[Double]("bm25"), r.getAs[String]("token")))
      assert(sorted.map(_.getAs[Int]("rank")).sameElements(ranks))
    }
  }

  test("q133 correlation matrix: 10 cells, each in [-1, 1], replayed exactly") {
    val rows = Relational8.q133CrossCorrelation(spark, sf).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      val c = r.getAs[Double]("corr")
      assert(!c.isNaN && c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9, s"corr $c")
    }
    // replay one cell exactly on the driver
    val hourly = Tables.events(spark, sf)
      .groupBy(expr("unix_micros(ts) div 3600000000").as("h"), $"event_type")
      .count().as[(Long, String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(t => t._2 -> t._3).toMap).toMap
    val hs = hourly.keys.toSeq
    def series(t: String) = hs.map(h => hourly(h).getOrElse(t, 0L))
    val (xa, xb) = (series("click"), series("error"))
    val n = hs.length.toLong
    val (sx, sy) = (xa.sum, xb.sum)
    val sxy = xa.zip(xb).map { case (x, y) => x * y }.sum
    val (sxx, syy) = (xa.map(x => x * x).sum, xb.map(y => y * y).sum)
    val expect = BigDecimal((n * sxy - sx * sy).toDouble /
        math.sqrt((n * sxx - sx * sx).toDouble * ((n * syy - sy * sy).toDouble)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = rows.find(r => r.getAs[String]("type_a") == "click" &&
      r.getAs[String]("type_b") == "error").get.getAs[Double]("corr")
    assert(got == expect, s"click-error corr $got != replay $expect")
  }

  test("q134 funnel is monotone and matches a driver-side sequence scan") {
    val r = Relational8.q134OrderedFunnel(spark, sf).head()
    val (nu, v, c, p) = (r.getAs[Long]("n_users"), r.getAs[Long]("n_viewed"),
      r.getAs[Long]("n_clicked_after"), r.getAs[Long]("n_purchased_after"))
    assert(nu >= v && v >= c && c >= p && p >= 0, s"funnel not monotone: $nu $v $c $p")
    // exact replay: per user ordered events, greedy first-match sequence
    val byUser = Tables.events(spark, sf)
      .select($"user_id", $"event_type", unix_micros($"ts").as("us"))
      .as[(Long, String, Long)].collect().groupBy(_._1)
    var (ev2, ec2, ep2) = (0L, 0L, 0L)
    byUser.values.foreach { es =>
      val t1 = es.filter(_._2 == "view").map(_._3).minOption
      val t2 = t1.flatMap(t => es.filter(e => e._2 == "click" && e._3 > t).map(_._3).minOption)
      val t3 = t2.flatMap(t => es.filter(e => e._2 == "purchase" && e._3 > t).map(_._3).minOption)
      if (t1.isDefined) ev2 += 1
      if (t2.isDefined) ec2 += 1
      if (t3.isDefined) ep2 += 1
    }
    assert((v, c, p) == ((ev2, ec2, ep2)), "funnel counts must match the replay")
    assert(nu == byUser.size)
  }

  test("q120 native session_window matches q39's session contract") {
    val native = graft.streaming.Sessionize
      .q120SessionWindowNative(spark, sf)
      .select($"user_id", $"session_idx", $"n_events", $"start_ts")
      .collect().toSeq.map(_.toSeq).toSet
    val batch = graft.streaming.Sessionize.q39Sessionize(spark, sf)
      .select($"user_id", $"session_idx", $"n_events", $"start_ts")
      .collect().toSeq.map(_.toSeq).toSet
    assert(native == batch,
      "session_window must produce q39's exact sessions")
  }

  test("q120 boundary: a gap of exactly 30 minutes merges (diff > gap splits)") {
    import java.sql.Timestamp
    val base = 1600000000000000L // epoch micros
    val gapUs = 30L * 60 * 1000000
    val df = Seq(
      (1L, base), (1L, base + gapUs),          // touching -> one session
      (2L, base), (2L, base + gapUs + 1))      // 1us beyond -> two sessions
      .toDF("user_id", "us")
      .select($"user_id", timestamp_micros($"us").as("ts"))
    val sess = df.groupBy($"user_id", session_window($"ts", "30 minutes"))
      .count().groupBy($"user_id").count().as[(Long, Long)].collect().toMap
    assert(sess(1L) == 1, "exact-gap events share a session")
    assert(sess(2L) == 2, "gap+1us splits the session")
  }
}
