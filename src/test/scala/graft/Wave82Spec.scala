package graft

import org.apache.spark.sql.functions._

import graft.engine.{Relational62, Tables}
import graft.functions.TextFunctions

/** Wave 82 (q376–q378). Teeth beyond the hash gate: q376's decades
  * tile the vocabulary exactly (Σ n_tokens = vocab; decade d holds
  * min(2^d, remaining) tokens) and min_rf ≤ max_rf with rf ≥ rank;
  * q377's four batches reconstruct the full events census and each
  * batch is non-empty (the throttle actually split); q378's hits@k
  * are monotone in k and bounded by the slot count, and slot counting
  * matches an independent recount. */
class Wave82Spec extends SparkTestBase {

  test("q376 decades tile the vocabulary with exact occupancy") {
    import spark.implicits._
    val df = Relational62.q376ZipfDecades(spark, sf).orderBy($"decade").cache()
    try {
      val vocab = Tables.documents(spark, sf)
        .select(explode(TextFunctions.tokens($"text")).as("t"))
        .filter($"t" =!= "").distinct().count()
      val rows = df.select($"decade", $"n_tokens", $"min_rf", $"max_rf")
        .as[(Long, Long, Long, Long)].collect()
      assert(rows.map(_._2).sum === vocab)
      var remaining = vocab
      rows.foreach { case (d, n, mn, mx) =>
        val cap = 1L << d
        assert(n === math.min(cap, remaining),
          s"decade $d occupancy $n != min($cap, $remaining)")
        remaining -= n
        assert(mn <= mx && mn >= (1L << d),
          "r*f at least the decade's smallest rank (f >= 1)")
      }
      assert(remaining === 0L)
    } finally df.unpersist()
  }

  test("q377 batches are non-empty and reconstruct the events census") {
    import spark.implicits._
    val df = graft.streaming.Streaming
      .q377ThrottledBackfill(spark, sf).cache()
    try {
      val rows = df.select($"batch_id", $"n_rows", $"n_users")
        .as[(Long, Long, Long)].collect().sortBy(_._1)
      assert(rows.length === 4)
      assert(rows.map(_._1).toSeq === Seq(0L, 1L, 2L, 3L))
      assert(rows.forall(_._2 > 0L), "throttle produced an empty batch")
      assert(rows.map(_._2).sum === Tables.events(spark, sf).count())
      val users = Tables.events(spark, sf)
        .select(countDistinct($"user_id")).as[Long].head()
      assert(rows.forall(_._3 <= users))
    } finally df.unpersist()
  }

  test("q378 hits@k are monotone and slots recount") {
    import spark.implicits._
    val df = Relational62.q378CoorderRecsEval(spark, sf).orderBy($"k").cache()
    try {
      val rows = df.select($"k", $"hits", $"slots", $"hit_permille")
        .as[(Long, Long, Long, Long)].collect()
      assert(rows.map(_._1).toSeq === (1 to Relational62.Q378K).map(_.toLong))
      val hs = rows.map(_._2)
      assert(hs.zip(hs.tail).forall { case (a, b) => a <= b },
        "hits@k must be monotone in k")
      assert(rows.forall(r => r._2 <= r._3))
      assert(rows.forall(r => r._4 === 1000L * r._2 / r._3))
      // independent slot recount: (order, part) slots of test orders
      // with >= 2 distinct parts
      val op = Tables.lineitem(spark, sf)
        .join(Tables.orders(spark, sf), $"l_orderkey" === $"o_orderkey")
        .filter(to_date($"o_orderdate") >= lit(Relational62.Q378Split))
        .select($"l_orderkey".as("ok"), $"l_partkey".as("pk")).distinct()
      val slots = op.groupBy($"ok").agg(count(lit(1)).as("sz"))
        .filter($"sz" >= 2).agg(sum($"sz")).as[Long].head()
      assert(rows.head._3 === slots)
    } finally df.unpersist()
  }
}
