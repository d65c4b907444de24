package graft

import org.apache.spark.sql.functions._

import graft.engine.{Relational18, Tables}

class Relational18Spec extends SparkTestBase {
  import spark.implicits._

  test("q190 mapGroups sessions agree with the relational q39 contract") {
    val rows = Relational18.q190MapGroupsSessions(spark, sf).collect()
    val users = Tables.events(spark, sf).select($"user_id").distinct().count()
    assert(rows.map(_.getAs[Long]("n_users")).sum == users)
    assert(rows.map(_.getAs[Long]("n_events")).sum
      == Tables.events(spark, sf).count())
    // cross-check against the declarative sessionizer's session counts
    val q39 = graft.streaming.Sessionize.q39Sessionize(spark, sf)
      .groupBy($"user_id").agg(max($"session_idx").as("n_sessions"))
      .groupBy($"n_sessions").agg(count(lit(1)).as("n_users"))
      .collect().map(r => r.getAs[Long]("n_sessions") -> r.getAs[Long]("n_users"))
      .toMap
    rows.foreach { r =>
      assert(q39(r.getAs[Long]("n_sessions")) == r.getAs[Long]("n_users"),
        "typed and relational sessionizers must agree")
    }
  }

  test("q191 the range layout tiles time with the requested file count") {
    val r = Relational18.q191RangeLayout(spark, sf).collect().head
    assert(r.getAs[Long]("n_files") == Relational18.RangeFiles)
    assert(r.getAs[Long]("n_rows") == Tables.events(spark, sf).count())
    assert(r.getAs[Boolean]("no_overlap"), "file extents must be disjoint")
    assert(r.getAs[Boolean]("file_count_ok"))
  }

  test("q194 the disordered join drops pairs the batch join would keep") {
    val out = graft.streaming.Streaming.q194StreamJoinDisorder(spark, sf)
      .collect()
    val keys = out.map(r => (r.getLong(0), r.getAs[Long]("p_id"),
      r.getAs[Long]("e_id")))
    assert(keys.distinct.length == keys.length, "append must emit once")
    // the full unconstrained interval join is a strict superset
    val full = Tables.events(spark, sf).as("a")
      .join(Tables.events(spark, sf).as("b"),
        expr("a.user_id = b.user_id AND a.event_type = 'purchase'" +
          " AND b.event_type = 'error' AND b.ts >= a.ts" +
          " AND b.ts <= a.ts + interval 12 hours"))
      .select($"a.user_id", $"a.event_id", $"b.event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(keys.forall(full), "every emitted pair must be a true match")
    assert(keys.length < full.size, "state eviction must have dropped pairs")
  }
}
