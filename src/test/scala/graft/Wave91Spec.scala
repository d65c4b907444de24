package graft

import org.apache.spark.sql.functions._

import graft.engine.{Relational71, Tables}
import graft.functions.TextFunctions

/** Wave 91 (q401–q403). Teeth beyond the hash gate: q401's three band
  * configurations are provably NESTED (an 8-component band match
  * implies its two 4-component halves match), so candidates and hits
  * must be monotone across configs; q402's power iteration is
  * replayed edge-by-edge in Scala; q403's threshold-algorithm depth
  * is recomputed brute-force and its defining stop property is
  * asserted on the collected score lists. */
class Wave91Spec extends SparkTestBase {

  test("q401 band configs are nested: candidates/hits/recall monotone") {
    import spark.implicits._
    val rows = Relational71.q401LshBandFrontier(spark, sf)
      .select($"cfg", $"candidates", $"hits", $"truth_pairs",
        $"recall_permille", $"precision_permille")
      .as[(String, Long, Long, Long, Long, Long)]
      .collect().map(r => r._1 -> r).toMap
    val Seq(b02, b04, b08) = Seq("b02", "b04", "b08").map(rows(_))
    // one truth frame shared by all configs
    assert(b02._4 === b04._4 && b04._4 === b08._4 && b02._4 > 0L)
    // nesting: a b02 band (8 components) matching implies both b04
    // halves match, which implies all four b08 quarters match
    assert(b02._2 <= b04._2 && b04._2 <= b08._2)
    assert(b02._3 <= b04._3 && b04._3 <= b08._3)
    assert(b02._5 <= b04._5 && b04._5 <= b08._5)
    rows.values.foreach { r =>
      assert(r._5 >= 0L && r._5 <= 1000L && r._6 >= 0L && r._6 <= 1000L)
      assert(r._3 <= r._2 && r._3 <= r._4)
    }
  }

  test("q402 replays the integer power iteration in Scala") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
      .select(TextFunctions.tokens($"text").as("t"))
      .as[Seq[String]].collect()
    val und = docs.flatMap(t => t.sliding(2).collect {
      case Seq(u, v) if u != v => Seq((u, v), (v, u))
    }.flatten)
    val edges = und.groupBy(identity).map { case ((u, v), xs) =>
      (u, v, xs.size.toLong) }.toSeq
    val outw = edges.groupBy(_._1).map { case (u, es) =>
      u -> es.map(_._3).sum }
    var r = outw.map { case (u, _) => u -> 1000000L }
    for (_ <- 1 to Relational71.Q402Iters) {
      val inmass = edges.groupBy(_._2).map { case (v, es) =>
        v -> es.map(e => r(e._1) * e._3 / outw(e._1)).sum }
      r = inmass.map { case (v, m) => v -> (150000L + 850L * m / 1000L) }
    }
    val expect = r.toSeq.sortBy { case (w, s) => (-s, w) }
      .take(Relational71.Q402TopK)
    val got = Relational71.q402TextrankKeywords(spark, sf)
      .as[(String, Long)].collect().toSeq
    assert(got === expect)
  }

  test("q403 TA depth matches a brute-force replay and its stop property") {
    import spark.implicits._
    val row = Relational71.q403TaDepth(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long, Long)].head()
    val (n, k, tk, dSeen, dStop, dTa, permille) = row
    assert(k === Relational71.Q403K.toLong)
    assert(dTa <= math.max(dSeen, dStop))
    assert(permille === 1000L * dTa / n)
    // brute-force replay on the collected score lists
    val cust = Tables.customer(spark, sf)
      .select($"c_custkey".cast("long"),
        (graft.engine.Exact.cents($"c_acctbal") + 100000L))
      .as[(Long, Long)].collect().toMap
    val s2m = Tables.orders(spark, sf)
      .groupBy($"o_custkey".cast("long").as("ck"))
      .agg(max(graft.engine.Exact.cents($"o_totalprice")).as("s2"))
      .as[(Long, Long)].collect().toMap
    val obj = s2m.keys.toSeq.filter(cust.contains)
      .map(ck => (ck, cust(ck), s2m(ck)))
    assert(obj.size.toLong === n)
    val r1 = obj.sortBy { case (ck, s1, _) => (-s1, ck) }
      .zipWithIndex.map { case ((ck, _, _), i) => ck -> (i + 1L) }.toMap
    val r2 = obj.sortBy { case (ck, _, s2) => (-s2, ck) }
      .zipWithIndex.map { case ((ck, _, _), i) => ck -> (i + 1L) }.toMap
    val s1At = r1.map { case (ck, d) => d -> obj.find(_._1 == ck).get._2 }
    val s2At = r2.map { case (ck, d) => d -> obj.find(_._1 == ck).get._3 }
    val t = (1L to n).map(d => d -> (s1At(d) + s2At(d))).toMap
    val totals = obj.map { case (ck, a, b) => (ck, a + b) }
    val tkExp = totals.sortBy { case (ck, tot) => (-tot, ck) }
      .take(10).map(_._2).min
    assert(tk === tkExp)
    val qo = obj.map { case (ck, a, b) =>
      val dobj = math.min(r1(ck), r2(ck))
      val dt = (1L to n).find(d => t(d) <= a + b).get
      (ck, math.max(dobj, dt))
    }
    val dTaExp = qo.sortBy { case (ck, q) => (q, ck) }.take(10).map(_._2).max
    assert(dTa === dTaExp)
    // TA stop property: at depth d_ta at least k objects are both
    // seen and threshold-cleared; at d_ta - 1 fewer than k are
    assert(qo.count(_._2 <= dTa) >= 10)
    assert(qo.count(_._2 <= dTa - 1) < 10)
  }
}
