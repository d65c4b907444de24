package graft

import org.apache.spark.sql.functions._

import graft.engine.{Relational29, Tables}

/** Wave 37 (q258–q260): hysteresis alerting, GDPR cascade, deletion
  * vectors. Invariants: debounce dominance, cascade closure, and the
  * merge-on-read/copy-on-write equivalence. */
class Wave37Spec extends SparkTestBase {

  test("q258 debouncing never alerts more than the high-event count, " +
    "and the stream equals the batch H-run model") {
    import spark.implicits._
    val res = graft.streaming.Streaming.q258StreamAlerts(spark, sf)
    assert(res.filter($"n_alerts" > $"n_high").count() === 0,
      "an alert requires a high event")
    assert(res.agg(sum($"n_alerts")).head.getLong(0) > 0)
    // batch recomputation of the flip-flop per user (driver-side fold
    // over the tiny fixture) must equal the streamed state
    val batch = Tables.events(spark, sf)
      .select($"user_id", $"ts", $"event_id",
        graft.engine.Exact.cents($"value").as("units"))
      .as[(Long, java.sql.Timestamp, Long, Long)]
      .collect().groupBy(_._1).map { case (u, evs) =>
        var (armed, alerts, high) = (true, 0L, 0L)
        evs.sortBy(e => (e._2.getTime, e._2.getNanos, e._3)).foreach { e =>
          if (e._4 >= graft.streaming.Streaming.AlertHighCents) {
            high += 1; if (armed) { alerts += 1; armed = false }
          } else if (e._4 <= graft.streaming.Streaming.AlertLowCents)
            armed = true
        }
        u -> ((alerts, high))
      }
    val streamed = res.as[(Long, Long, Long, Long)].collect()
      .map { case (u, _, a, h) => u -> ((a, h)) }.toMap
    assert(streamed === batch)
  }

  test("q259 cascade closes the FK graph: zero orphans, child deletions " +
    "at least as numerous as parents'") {
    val rows = Relational29.q259GdprCascade(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    rows.values.foreach { case (before, del, after, orphans) =>
      assert(orphans === 0L, "cascade must leave no dangling references")
      assert(before === del + after)
    }
    assert(rows("2_orders")._2 >= rows("1_customer")._2,
      "each deleted customer cascades to all their orders")
  }

  test("q260 DV read path reconstructs exactly the direct-filter rows " +
    "and undercuts rewrite cost") {
    val r = Relational29.q260DeletionVectors(spark, sf).head()
    assert(r.getAs[Long]("dv_checksum") === r.getAs[Long]("direct_checksum"),
      "anti-joining the (file, pos) delete list must equal the predicate scan")
    assert(r.getAs[Long]("dv_total_bytes") <
      r.getAs[Long]("rewrite_total_bytes"),
      "one bit per row must beat rewriting ~89% of every touched file")
    assert(r.getAs[Long]("n_deleted") > 0)
  }
}
