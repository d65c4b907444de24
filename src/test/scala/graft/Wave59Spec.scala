package graft

import org.apache.spark.sql.functions._

import graft.engine.{Relational41, Tables}

/** Wave 59 (q318–q320): chunk dedup, rendezvous rebalancing, Lloyd
  * iterations. Teeth: the rebalancing numbers must reproduce the
  * consistent-hashing theory (modulo ≈ 15/16 moved, rendezvous ≈
  * 1/17), and Lloyd's inertia must not increase after the center
  * update. */
class Wave59Spec extends SparkTestBase {

  test("q318 savings are sane and unique mass never exceeds stored mass") {
    import spark.implicits._
    val d = Relational41.q318ChunkDedup(spark, sf)
    assert(d.count() > 0)
    assert(d.filter($"unique_bytes" > $"n_bytes" ||
      $"n_unique_chunks" > $"n_chunks").count() === 0)
    assert(d.filter($"savings_permille" < 0 || $"savings_permille" > 1000)
      .count() === 0)
    // The synthetic corpus repeats phrases — SOME source must dedup.
    assert(d.agg(max($"savings_permille")).head().getLong(0) > 0)
  }

  test("q319 reproduces the consistent-hashing movement theory") {
    import spark.implicits._
    val rows = Relational41.q319Rebalance(spark, sf).collect()
      .map(r => r.getAs[String]("scheme") -> r.getAs[Long]("moved_permille"))
      .toMap
    // modulo: ~15/16 = 937 permille move; rendezvous: ~1/17 = 59.
    assert(rows("modulo") > 800, s"modulo moved ${rows("modulo")}")
    assert(rows("rendezvous") < 150, s"rendezvous moved ${rows("rendezvous")}")
    assert(rows("rendezvous") * 5 < rows("modulo"))
  }

  test("q320 inertia does not increase after the Lloyd center update") {
    import spark.implicits._
    val d = Relational41.q320KMeansLloyd(spark, sf).cache()
    try {
      val i1 = d.agg(sum($"inertia1")).head().getLong(0)
      val i2 = d.agg(sum($"inertia2")).head().getLong(0)
      assert(i1 > 0 && i2 > 0)
      assert(i2 <= i1, s"Lloyd must not increase inertia: $i1 -> $i2")
      val n = Tables.embeddings(spark, sf).count()
      assert(d.agg(sum($"n_iter1")).head().getLong(0) === n)
      assert(d.agg(sum($"n_iter2")).head().getLong(0) === n)
    } finally d.unpersist()
  }
}
