package graft

import org.apache.spark.sql.functions._

import graft.engine.{Relational55, Tables}

/** Wave 74 (q355–q357): hierarchy rollup, D'Hondt allocation, RRF
  * fusion. Teeth: subtree sums obey the parent-accumulation identity
  * against a local tree walk, the D'Hondt seats sum to exactly S and
  * match a sequential highest-averages simulation, and the fused
  * top-k agrees with a local recompute of both rankings. */
class Wave74Spec extends SparkTestBase {

  test("q355 matches a local ancestor walk and the root covers everyone") {
    import spark.implicits._
    val got = Relational55.q355TreeRollup(spark, sf).collect()
      .map(r => r.getAs[Long]("node") ->
        (r.getAs[Long]("subtree_size"), r.getAs[Long]("subtree_cents"),
          r.getAs[Long]("height"))).toMap
    val cust = Tables.customer(spark, sf)
      .select($"c_custkey",
        ($"c_acctbal".cast("decimal(18,2)") * 100).cast("long"))
      .as[(Long, Long)].collect()
    // local walk: every customer contributes to each proper ancestor
    val acc = scala.collection.mutable.Map[Long, (Long, Long, Long)]()
    for ((k, bal) <- cust) {
      var node = k / Relational55.Q355Radix
      var j = 1L
      var continue = true
      while (continue) {
        val (s, b, h) = acc.getOrElse(node, (0L, 0L, 0L))
        acc(node) = (s + 1, b + bal, math.max(h, j))
        if (node == 0L) continue = false
        else { node /= Relational55.Q355Radix; j += 1 }
      }
    }
    assert(got === acc.toMap)
    // root subtree covers the entire population
    assert(got(0L)._1 === cust.length.toLong)
    assert(got(0L)._2 === cust.map(_._2).sum)
    // parent accumulation: a node's subtree strictly contains a child's
    for ((n, (s, _, _)) <- got if n > 0L) {
      val parent = n / Relational55.Q355Radix
      assert(got(parent)._1 >= s, s"parent of $n")
    }
  }

  test("q356 seats sum to S and match a sequential simulation") {
    import spark.implicits._
    val rows = Relational55.q356Dhondt(spark, sf).collect()
      .map(r => r.getAs[String]("n_name") ->
        (r.getAs[Long]("votes"), r.getAs[Long]("seats"))).toMap
    assert(rows.values.map(_._2).sum === Relational55.Q356Seats)
    // sequential D'Hondt: repeatedly award the highest quotient
    val votes = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf), $"o_custkey" === $"c_custkey")
      .join(Tables.nation(spark, sf), $"c_nationkey" === $"n_nationkey")
      .groupBy($"n_name", $"n_nationkey")
      .agg(count(lit(1)).as("v"))
      .as[(String, Long, Long)].collect()
    val seats = scala.collection.mutable.Map[String, Long]()
      .withDefaultValue(0L)
    for (_ <- 1L to Relational55.Q356Seats) {
      val win = votes.map { case (nm, nk, v) =>
        (nm, nk, v.toDouble / (seats(nm) + 1).toDouble)
      }.maxBy { case (_, nk, q) => (q, -nk) }
      seats(win._1) += 1
    }
    for ((nm, (_, s)) <- rows)
      assert(seats(nm) === s, s"seats of $nm")
  }

  test("q357 fused top-k matches a local recompute of both rankings") {
    import spark.implicits._
    val got = Relational55.q357RrfFusion(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("rank_len"),
        r.getAs[Long]("rank_vocab"), r.getAs[Long]("rrf_micro")))
    assert(got.length === Relational55.Q357Top)
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", $"n_chars",
        size(array_distinct(split($"text", " "))).cast("long"))
      .as[(Long, Long, Long)].collect()
    def ranks(key: ((Long, Long, Long)) => Long): Map[Long, Long] =
      docs.sortBy(d => (-key(d), d._1)).zipWithIndex
        .map { case (d, i) => d._1 -> (i + 1L) }.toMap
    val rl = ranks(_._2); val rv = ranks(_._3)
    val k = Relational55.Q357K
    val fused = docs.map(_._1).map { id =>
      (id, rl(id), rv(id), 1000000L / (k + rl(id)) + 1000000L / (k + rv(id)))
    }.sortBy(t => (-t._4, t._1)).take(Relational55.Q357Top)
    assert(got.toSeq === fused.toSeq)
    // fused order is monotone in the micro scores
    assert(got.map(_._4).toSeq === got.map(_._4).sortBy(-_).toSeq)
  }
}
