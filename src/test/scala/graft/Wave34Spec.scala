package graft

import org.apache.spark.sql.functions._

import graft.engine.{Relational26, Tables}

/** Wave 34 (q247–q250): privacy lattice auditing, PassJoin edit-distance
  * similarity join, Hilbert-curve layout, streaming EWMA state. The
  * value-level properties the DuckDB hash gate can't express: lattice
  * monotonicity, blocking completeness vs brute force, curve bijectivity
  * and unit-step adjacency, stream-equals-batch state evolution. */
class Wave34Spec extends SparkTestBase {

  test("q247 generalization monotonicity: coarser levels never increase " +
    "classes or k-violations") {
    val rows = Relational26.q247KAnonymity(spark, sf)
      .orderBy(col("level")).collect()
    assert(rows.length === 4)
    rows.sliding(2).foreach { case Array(fine, coarse) =>
      assert(coarse.getLong(1) <= fine.getLong(1),
        s"n_classes must shrink walking up the lattice: $fine -> $coarse")
      assert(coarse.getLong(2) <= fine.getLong(2),
        s"k=2 violating mass must shrink walking up the lattice: $fine -> $coarse")
    }
    // within a level the k-thresholds nest: rows in classes < 2 are also < 5 < 10
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(3) && r.getLong(3) <= r.getLong(4))
    }
  }

  test("q248 signature blocking is result-invisible vs brute force") {
    import spark.implicits._
    val blocked = Relational26.q248EdJoin(spark, sf)
      .select($"name_a", $"name_b", $"dist")
    val names = Tables.part(spark, sf).select($"p_name").distinct()
    val brute = names.as("a").crossJoin(broadcast(names.as("b")))
      .filter($"a.p_name" < $"b.p_name")
      .select($"a.p_name".as("name_a"), $"b.p_name".as("name_b"),
        levenshtein($"a.p_name", $"b.p_name").cast("long").as("dist"))
      .filter($"dist" <= Relational26.EdTau)
    assert(blocked.exceptAll(brute).isEmpty && brute.exceptAll(blocked).isEmpty,
      "PassJoin candidates must verify to exactly the brute-force pair set")
    assert(blocked.filter($"dist" < 1 || $"dist" > Relational26.EdTau).count() === 0)
  }

  test("hilbert index is a bijection on the full grid with unit-step adjacency") {
    import spark.implicits._
    val side = Relational26.HSide
    val grid = spark.range(side.toLong * side)
      .select((col("id") / side).cast("long").as("x"),
        (col("id") % side).cast("long").as("y"))
    val hd = Relational26.withHilbert(grid, Seq("x", "y")).select($"x", $"y", $"hd")
    // bijection: every d in [0, side^2) appears exactly once
    assert(hd.select($"hd").distinct().count() === side.toLong * side)
    assert(hd.agg(min($"hd"), max($"hd")).as[(Long, Long)].head() ===
      ((0L, side.toLong * side - 1)))
    // adjacency: consecutive curve positions are Manhattan-distance-1
    // neighbors — the locality property z-order lacks (and the reason
    // q249's hilbert chunks prune tighter than zorder's)
    val nxt = hd.select(($"hd" + 1).as("hd"), $"x".as("x2"), $"y".as("y2"))
    val jumps = hd.join(nxt, "hd")
      .filter(abs($"x" - $"x2") + abs($"y" - $"y2") =!= 1)
      .count()
    assert(jumps === 0, "every consecutive pair on the curve must be adjacent")
  }

  test("q249 rows_qual is layout-invariant and hilbert reads no more than arrival") {
    import spark.implicits._
    val rows = Relational26.q249HilbertLayout(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("rows_qual")).toSet.size === 1,
      "the predicate's qualifying mass cannot depend on physical layout")
    val byLayout = rows.map(r => r.getString(0) -> r.getAs[Long]("rows_read")).toMap
    assert(byLayout("hilbert") <= byLayout("arrival"),
      s"hilbert clustering must not read more than arrival order: $byLayout")
  }

  test("q250 streaming EWMA equals the batch fold per user") {
    import spark.implicits._
    val streamed = graft.streaming.Streaming.q250StreamEwma(spark, sf)
      .as[(Long, Long, Long)].collect()
      .map { case (u, n, s) => u -> ((n, s)) }.toMap
    val batch = Tables.events(spark, sf)
      .select($"user_id", $"ts", $"event_id",
        graft.engine.Exact.cents($"value").as("units"))
      .as[(Long, java.sql.Timestamp, Long, Long)]
      .collect().groupBy(_._1).map { case (u, evs) =>
        val units = evs.sortBy(e => (e._2.getTime, e._2.getNanos, e._3)).map(_._4)
        u -> (units.length.toLong, units.reduce((acc, v) => (v + 3 * acc) / 4))
      }
    assert(streamed === batch,
      "state carried across micro-batches must reproduce the batch fold exactly")
  }
}
