package graft

import org.apache.spark.sql.functions._

import graft.engine.{Relational54, Tables}

/** Wave 73 (q352–q354): autocorrelation, FIFO container packing,
  * candidate-key discovery. Teeth: the ACF moments match a local
  * recompute of the densified daily series (including the zero-order
  * days the grid must synthesize), the packing audit matches a
  * sequential per-supplier simulation, and the key verdicts agree
  * with direct distinct counts on known-true, near-miss, and
  * known-false candidates. */
class Wave73Spec extends SparkTestBase {

  test("q352 moments match a local densified-series recompute") {
    import spark.implicits._
    val rows = Relational54.q352Acf(spark, sf).collect()
      .map(r => r.getAs[Long]("lag") ->
        (r.getAs[Long]("n_pairs"), r.getAs[Long]("num"),
          r.getAs[Long]("den"), r.getAs[Double]("acf"))).toMap
    assert(rows.keySet === Set(1L, 7L, 14L, 28L))
    val days = Tables.orders(spark, sf)
      .select(datediff(to_date($"o_orderdate"), lit("1995-01-01"))
        .cast("long").as("d"))
      .as[Long].collect()
    val counts = days.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val (mn, mx) = (days.min, days.max)
    val y = (mn to mx).map(d => counts.getOrElse(d, 0L))
    val n = y.size.toLong
    val s = y.sum
    val z = y.map(v => n * v - s)
    val den = z.map(v => v * v).sum
    for (lag <- Seq(1, 7, 14, 28)) {
      val pairs = z.indices.dropRight(lag).map(i => z(i) * z(i + lag))
      val (np, num, d, acf) = rows(lag.toLong)
      assert(np === n - lag, s"pairs at lag $lag")
      assert(num === pairs.sum, s"num at lag $lag")
      assert(d === den)
      assert(acf === num.toDouble / den.toDouble)
      assert(math.abs(num) <= den) // Cauchy-Schwarz on the truncated sum
    }
  }

  test("q353 matches a sequential per-supplier packing simulation") {
    import spark.implicits._
    val got = Relational54.q353FifoContainers(spark, sf).collect()
      .map(r => r.getAs[Long]("s_suppkey") ->
        (r.getAs[Long]("n_lines"), r.getAs[Long]("total_centi"),
          r.getAs[Long]("n_containers"), r.getAs[Long]("n_split"),
          r.getAs[Long]("max_span"))).toMap
    val li = Tables.lineitem(spark, sf)
      .select($"l_suppkey",
        datediff(to_date($"l_shipdate"), lit("1995-01-01")).cast("long"),
        expr("""CAST(conv(substr(md5(concat_ws('|', l_orderkey,
          |  l_linenumber, l_partkey,
          |  CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT))),
          |  1, 15), 16, 10) AS BIGINT)""".stripMargin),
        ($"l_quantity".cast("decimal(18,2)") * 100).cast("long"))
      .as[(Long, Long, Long, Long)].collect()
    // the FIFO tie is unique per supplier at this SF (determinism contract)
    assert(li.map(t => (t._1, t._3)).distinct.length === li.length)
    val cap = Relational54.Q353Capacity
    val sim = li.groupBy(_._1).map { case (sup, ls) =>
      var end = 0L; var split = 0L; var span = 0L
      for ((_, _, _, q) <- ls.sortBy(t => (t._2, t._3))) {
        val start = end; end += q
        val lot0 = start / cap; val lot1 = (end - 1) / cap
        if (lot0 != lot1) split += 1
        span = math.max(span, lot1 - lot0 + 1)
      }
      sup -> ((ls.length.toLong, end, (end - 1) / cap + 1, split, span))
    }
    assert(got.keySet === sim.keySet)
    for ((sup, exp) <- sim) assert(got(sup) === exp, s"supplier $sup")
    // splits are real at this capacity — the audit isn't vacuous
    assert(got.values.map(_._4).sum > 0L)
  }

  test("q354 verdicts agree with direct distinct counts") {
    import spark.implicits._
    val d = Relational54.q354PkDiscovery(spark, sf).collect()
      .map(r => r.getAs[String]("candidate") ->
        (r.getAs[Long]("n_rows"), r.getAs[Long]("n_distinct"),
          r.getAs[Long]("is_key"))).toMap
    assert(d.size === 12)
    // known-true keys
    for (k <- Seq("orders(o_orderkey)", "events(user_id,ts)",
        "customer(c_custkey)", "customer(c_name)", "part(p_partkey)",
        "documents(doc_id)", "embeddings(vec_id)", "events(event_id)"))
      assert(d(k)._3 === 1L, s"$k should be a key")
    // known-false: an order has multiple lines; p_name repeats; and this
    // fixture's l_linenumber repeats WITHIN an order — the discovery
    // finding that forced q353's hashed FIFO tie-break
    assert(d("lineitem(l_orderkey)")._3 === 0L)
    assert(d("lineitem(l_orderkey,l_linenumber)")._3 === 0L)
    assert(d("part(p_name)")._3 === 0L)
    // spot-check one candidate against a direct recompute
    val p = Tables.part(spark, sf)
    assert(d("part(p_name)")._1 === p.count())
    assert(d("part(p_name)")._2 ===
      p.select($"p_name").distinct().count())
    // verdicts are consistent with the counts everywhere
    for ((k, (nr, ndv, key)) <- d)
      assert(key === (if (nr == ndv) 1L else 0L), s"verdict of $k")
  }
}
