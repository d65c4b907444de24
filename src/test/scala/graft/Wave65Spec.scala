package graft

import org.apache.spark.sql.functions._

import graft.streaming.Streaming

/** Wave 65 (q334): chained three-way stream-stream interval join.
  * Consistency teeth: its (purchase, error) legs are exactly a subset
  * of q42's dedicated pair join, the missing ones being purchases with
  * no qualifying signup; day deltas respect the 30-day window. */
class Wave65Spec extends SparkTestBase {

  test("q334 triples are q42 pairs filtered by the signup leg") {
    import spark.implicits._
    val triples = Streaming.q334ThreeWayStreamJoin(spark, sf).cache()
    try {
      assert(triples.count() > 0)
      assert(triples.filter($"signup_to_purchase_days" < 0 ||
        $"signup_to_purchase_days" > 30).count() === 0)
      val tPairs = triples.select($"p_id", $"e_id").distinct()
        .as[(Long, Long)].collect().toSet
      val q42Pairs = Streaming.q42StreamStreamJoin(spark, sf)
        .select($"p_id", $"e_id").as[(Long, Long)].collect().toSet
      assert(tPairs.subsetOf(q42Pairs),
        "every purchase->error leg must be a q42 interval match")
    } finally triples.unpersist()
  }
}
