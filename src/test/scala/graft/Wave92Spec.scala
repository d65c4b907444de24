package graft

import org.apache.spark.sql.functions._

import graft.engine.{Relational72, Tables}

/** Wave 92 (q404–q406). Teeth beyond the hash gate: q404's advisor
  * numbers are recomputed brute-force for one column and the bit
  * width is checked against ⌈log₂ ndv⌉; q405's repair is verified
  * minimal (changes = rows − majority mass) and to restore the FD
  * exactly (every chosen value is the true nation name); q406's
  * closed form is replayed against an actual run-by-run size-tiered
  * merge simulation. */
class Wave92Spec extends SparkTestBase {

  test("q404 advisor stats match a brute-force recount of p_brand") {
    import spark.implicits._
    val rows = Relational72.q404EncodingAdvisor(spark, sf)
      .as[(String, Long, Long, Long, Long, Long, String, Long)]
      .collect().map(r => r._1 -> r).toMap
    assert(rows.keySet === Relational72.Q404Cols
      .map { case (t, c) => s"$t.$c" }.toSet)
    val brands = Tables.part(spark, sf)
      .select($"p_brand".cast("string")).as[String].collect()
    val r = rows("part.p_brand")
    assert(r._2 === brands.length.toLong)
    assert(r._3 === brands.distinct.length.toLong)
    assert(r._5 === brands.map(_.length.toLong).sum)
    val ndv = brands.distinct.length
    val bits = (0 to 40).find(b => (1L << b) >= ndv).get.toLong
    assert(r._4 === bits)
    val dictBytes = brands.distinct.map(_.length.toLong).sum +
      (brands.length.toLong * bits + 7L) / 8L
    assert(r._6 === dictBytes)
    assert(r._7 === (if (dictBytes < r._5) "dict" else "plain"))
    rows.values.foreach { x =>
      assert(x._8 === 1000L * x._6 / x._5)
    }
  }

  test("q405 repair restores the FD minimally") {
    import spark.implicits._
    val plan = Relational72.q405FdRepair(spark, sf)
      .as[(Long, Long, Long, String, Long)].collect()
    val natNames = Tables.nation(spark, sf)
      .select($"n_nationkey".cast("long"), $"n_name".cast("string"))
      .as[(Long, String)].collect().toMap
    val custs = Tables.customer(spark, sf)
      .select($"c_custkey".cast("long"), $"c_nationkey".cast("long"))
      .as[(Long, Long)].collect()
    assert(plan.map(_._2).sum === custs.length.toLong)
    plan.foreach { case (nk, nRows, nVariants, majority, nChanged) =>
      // the corruption never outvotes the clean cells, so the repair
      // restores the true nation name everywhere
      assert(majority === natNames(nk))
      val corrupt = custs.count { case (ck, cnk) =>
        cnk == nk && ck % Relational72.Q405Residue == 3L }
      assert(nChanged === corrupt.toLong)
      val distinctCorrupt = custs.collect { case (ck, cnk)
        if cnk == nk && ck % Relational72.Q405Residue == 3L => ck % 5L }
        .distinct.size
      assert(nVariants === 1L + distinctCorrupt)
      assert(nChanged < nRows - nChanged) // majority strictly wins
    }
  }

  test("q406 closed form matches a run-by-run merge simulation") {
    import spark.implicits._
    val got = Relational72.q406LsmWa(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    val daily = Tables.orders(spark, sf)
      .groupBy(datediff(to_date($"o_orderdate"), lit("1995-01-01"))
        .cast("long").as("d"))
      .agg(count(lit(1)).as("b"))
      .orderBy($"d").as[(Long, Long)].collect().map(_._2)
    // simulate: runs per level; each flush appends to L0; 4 runs at
    // level l merge (bytes = their sum) into one run at level l+1
    val runs = Array.fill(Relational72.Q406Levels + 2)(
      scala.collection.mutable.Buffer.empty[Long])
    val written = Array.fill(Relational72.Q406Levels + 2)(0L)
    val merges = Array.fill(Relational72.Q406Levels + 2)(0L)
    for (b <- daily) {
      runs(0) += b
      written(0) += b
      merges(0) += 1
      var l = 0
      while (runs(l).size == Relational72.Q406Fanout.toInt) {
        val m = runs(l).sum
        runs(l).clear()
        runs(l + 1) += m
        written(l + 1) += m
        merges(l + 1) += 1
        l += 1
      }
    }
    for (l <- 0 to Relational72.Q406Levels) {
      if (written(l) > 0L) {
        val row = got(l.toLong)
        assert(row._2 === merges(l), s"merges at level $l")
        assert(row._3 === written(l), s"bytes at level $l")
      } else assert(!got.contains(l.toLong))
    }
    val tot = got(99L)
    assert(tot._3 === written.sum)
    assert(tot._2 === merges.sum)
  }
}
