package graft

import org.apache.spark.sql.functions._

import graft.engine.{Relational53, Tables}

/** Wave 72 (q349–q351): Benford audit, inclusion-dependency discovery,
  * degree assortativity. Teeth: the Benford shares form a permille
  * distribution over exactly the nine digits, the IND verdicts agree
  * with direct anti-join recomputation on known-true and known-false
  * pairs, and assortativity's moment identities hold against a
  * brute-force edge-list recompute. */
class Wave72Spec extends SparkTestBase {

  test("q349 digits partition the order universe on the permille grid") {
    import spark.implicits._
    val d = Relational53.q349Benford(spark, sf)
    assert(d.count() === 9)
    assert(d.select($"digit").as[Int].collect().sorted.toSeq === (1 to 9))
    val total = d.agg(sum($"n_orders")).head().getLong(0)
    assert(total === Tables.orders(spark, sf).count())
    // permille shares sum to 1000 within integer-floor slack (≤ 8)
    val permille = d.agg(sum($"obs_permille")).head().getLong(0)
    assert(permille <= 1000L && permille >= 992L)
    // expected weights are the Benford constants, invariant to data
    val exp = d.orderBy($"digit").select($"exp_permille")
      .as[Long].collect().toSeq
    assert(exp === Seq(301L, 176L, 125L, 97L, 79L, 67L, 58L, 51L, 46L))
  }

  test("q350 verdicts match direct anti-join recomputation") {
    import spark.implicits._
    val d = Relational53.q350InclusionDeps(spark, sf).collect()
      .map(r => r.getAs[String]("pair") ->
        (r.getAs[Long]("n_distinct"), r.getAs[Long]("n_orphan"),
          r.getAs[Long]("is_fk_candidate"))).toMap
    assert(d.size === 10)
    // known-true FK: every lineitem orderkey has a header
    val li = Tables.lineitem(spark, sf).select($"l_orderkey").distinct()
    val o = Tables.orders(spark, sf).select($"o_orderkey")
    val orphans = li.join(o, $"l_orderkey" === $"o_orderkey", "left_anti")
      .count()
    val (nd, no, fk) = d("l_orderkey->o_orderkey")
    assert(nd === li.count()); assert(no === orphans)
    assert(fk === (if (orphans == 0) 1L else 0L))
    assert(fk === 1L) // the fixture really is referentially intact here
    // the verdict column is consistent with the orphan count everywhere
    for ((p, (_, orph, cand)) <- d)
      assert(cand === (if (orph == 0L) 1L else 0L), s"verdict of $p")
    // the reverse direction is a DIFFERENT question; both being FK
    // would force |orders| == |lineitem orderkeys| — check consistency
    val (ndRev, noRev, _) = d("o_orderkey->l_orderkey")
    assert(ndRev - noRev === nd - no) // intersection is symmetric
  }

  test("q351 moments match a brute-force recompute and r is in [-1, 1]") {
    import spark.implicits._
    val row = Relational53.q351Assortativity(spark, sf).head()
    // brute-force: materialize the tiny sf edge list locally
    val li = Tables.lineitem(spark, sf)
      .select($"l_orderkey", $"l_partkey").distinct()
      .as[(Long, Long)].collect().groupBy(_._1)
    val edges = li.values.flatMap { ls =>
      val ps = ls.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length)
        yield (ps(i), ps(j))
    }.toSet
    val deg = edges.toSeq.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val dir = edges.toSeq.flatMap(e => Seq(e, e.swap))
    val n = dir.size.toLong
    val sx = dir.map(e => deg(e._1)).sum
    val sxy = dir.map(e => deg(e._1) * deg(e._2)).sum
    val sxx = dir.map(e => deg(e._1) * deg(e._1)).sum
    assert(row.getAs[Long]("n") === n)
    assert(row.getAs[Long]("sx") === sx)
    assert(row.getAs[Long]("sxy") === sxy)
    assert(row.getAs[Long]("sxx") === sxx)
    val r = row.getAs[Double]("assortativity")
    assert(r >= -1.0 && r <= 1.0)
    // Cauchy-Schwarz in integer form: |num| <= den (symmetric marginals)
    assert(math.abs(row.getAs[Long]("r_num")) <= row.getAs[Long]("r_den"))
  }
}
