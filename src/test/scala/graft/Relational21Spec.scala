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
