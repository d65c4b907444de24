package graft

import org.apache.spark.sql.functions._

import graft.engine.{Relational21, Tables}

class Relational21Spec extends SparkTestBase {
  import spark.implicits._

  test("q202 quarantine reconciles: clean + quarantined = corpus; both modes agree") {
    val r = Relational21.q202CorruptRecords(spark, sf).collect().head
    val total = Tables.events(spark, sf).count()
    assert(r.getAs[Long]("n_clean") + r.getAs[Long]("n_quarantined") == total)
    assert(r.getAs[Long]("n_quarantined") > 0, "fixture must inject corruption")
    assert(r.getAs[Long]("n_replayable") == r.getAs[Long]("n_quarantined"),
      "every quarantined row must carry its raw line")
    assert(r.getAs[Long]("n_dropmalformed") == r.getAs[Long]("n_clean"),
      "DROPMALFORMED must drop exactly the quarantine set")
  }

  test("q203 all codecs agree with the source aggregate") {
    val rows = Relational21.q203CodecRoundtrip(spark, sf).collect()
    assert(rows.map(_.getAs[String]("codec")).toSet ==
      Relational21.Codecs.toSet)
    assert(rows.map(r => (r.getAs[Long]("n"), r.getAs[Long]("cents"))).distinct.length == 1,
      "codec choice must not change a single bit of the data")
  }

  test("q207 dynamic-gap sessions conserve events and cover every user") {
    val rows = graft.streaming.Sessionize.q207DynamicGap(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("n_events")).sum ==
      Tables.events(spark, sf).count())
    assert(rows.map(_.getAs[Long]("n_users")).sum ==
      Tables.events(spark, sf).select($"user_id").distinct().count())
    // the variable gap must actually change the carve vs the fixed 30 min
    val fixed = graft.streaming.Sessionize.q39Sessionize(spark, sf)
      .select($"user_id", $"session_idx").distinct().count()
    val dyn = rows.map(r =>
      r.getAs[Long]("n_sessions") * r.getAs[Long]("n_users")).sum
    assert(dyn != fixed, "per-type gaps should produce a different session count")
  }

  test("q208 as-of enrichment covers every purchase exactly once") {
    val rows = graft.streaming.Streaming.q208StreamAsofEnrich(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("n")).sum ==
      Tables.events(spark, sf).filter($"event_type" === "purchase").count(),
      "interval containment must match each purchase to exactly one dim version")
    assert(rows.map(_.getAs[Long]("tier")).toSet.subsetOf(Set(0L, 1L, 2L)))
  }

  test("q209 CDC partitions keys into live + tombstoned; deletes really bite") {
    val r = Relational21.q209CdcDeletes(spark, sf).collect().head
    val nKeys = Tables.events(spark, sf)
      .select(($"user_id" % 100).as("k")).distinct().count()
    assert(r.getAs[Long]("n_live") + r.getAs[Long]("n_tombstoned") == nKeys)
    assert(r.getAs[Long]("n_tombstoned") > 0, "fixture must end some keys deleted")
    assert(r.getAs[Long]("n_resurrected") > 0,
      "fixture must exercise delete-then-upsert resurrection")
  }

  test("q204 null-safe join identity holds and plans as an equi join") {
    val r = Relational21.q204NullSafeJoin(spark, sf).collect().head
    assert(r.getAs[Boolean]("identity_holds"))
    assert(r.getAs[Long]("n_left_null") > 0 && r.getAs[Long]("n_right_null") > 0,
      "fixture must exercise null keys on both sides")
    // <=> must stay hash-joinable — a fallback to BNLJ would be the
    // scale regression this family of specs guards against
    val left = Tables.events(spark, sf).select(($"user_id" % 50).as("k"))
    val right = Tables.events(spark, sf).select(($"user_id" % 50).as("rk")).distinct()
    val p = left.join(right, $"k" <=> $"rk").queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"))
  }
}
