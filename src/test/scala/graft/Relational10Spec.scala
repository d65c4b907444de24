package graft

import org.apache.spark.sql.functions._

import graft.engine.{Relational10, Tables}

class Relational10Spec extends SparkTestBase {
  import spark.implicits._

  test("q147 band join equals the naive cartesian theta join") {
    val banded = Relational10.q147BandJoin(spark, sf).collect()
      .map(r => (r.getAs[Long]("nation"), r.getAs[Long]("n_pairs"),
        r.getAs[Long]("n_sup"), r.getAs[Long]("n_cust"))).toSeq
    val cust = Tables.customer(spark, sf)
      .select($"c_nationkey", $"c_custkey",
        graft.engine.Exact.cents($"c_acctbal").as("cc"))
    val supp = Tables.supplier(spark, sf)
      .select($"s_suppkey", graft.engine.Exact.cents($"s_acctbal").as("sc"))
    val naive = cust.crossJoin(supp)
      .filter(abs($"cc" - $"sc") <= Relational10.BandCents)
      .groupBy($"c_nationkey".as("nation"))
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct($"s_suppkey").as("n_sup"),
        countDistinct($"c_custkey").as("n_cust"))
      .orderBy($"nation").collect()
      .map(r => (r.getAs[Long]("nation"), r.getAs[Long]("n_pairs"),
        r.getAs[Long]("n_sup"), r.getAs[Long]("n_cust"))).toSeq
    assert(banded == naive,
      "bucket replication must lose and duplicate nothing vs the cartesian")
    assert(banded.nonEmpty, "fixture must produce in-band pairs")
  }

  test("q148 merge covers every user once with a consistent action arm") {
    val rows = Relational10.q148MergeUpsert(spark, sf).collect()
    val users = rows.map(_.getAs[Long]("user_id"))
    assert(users.distinct.length == users.length,
      "MERGE emits exactly one row per key")
    assert(users.toSet == Tables.events(spark, sf)
      .select($"user_id").distinct().as[Long].collect().toSet,
      "every user in the log appears in the merged state")
    rows.foreach { r =>
      val action = r.getAs[String]("action")
      val hasCents = !r.isNullAt(r.fieldIndex("cents"))
      assert(Set("keep", "insert", "update", "delete", "noop_delete")(action))
      assert(hasCents == (action == "keep" || action == "insert" ||
        action == "update"),
        s"cents must be NULL exactly on the delete arms: $r")
    }
    val actions = rows.map(_.getAs[String]("action")).toSet
    assert(actions("update"), "fixture must exercise the update arm")
  }

  test("q149 sliding distinct matches a per-hour direct recount") {
    val got = Relational10.q149SlidingDistinct(spark, sf).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("th")) ->
        r.getAs[Long]("n_users")).toMap
    val pres = Tables.events(spark, sf)
      .select($"event_type", $"user_id",
        expr("unix_micros(ts) div 3600000000").as("h"))
      .distinct().collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("user_id"),
        r.getAs[Long]("h")))
    val hmax = pres.map(_._3).max
    // direct model: for each emitted (type, hour), recount the distinct
    // users with presence in (hour-23, hour]
    got.foreach { case ((t, th), n) =>
      assert(th <= hmax)
      val expect = pres.collect {
        case (`t`, u, h) if h <= th && h > th - 24 => u
      }.distinct.length
      assert(n == expect, s"($t, $th): got $n expected $expect")
    }
    // completeness: every presence hour emits a row for its own hour
    pres.foreach { case (t, _, h) =>
      assert(got.contains((t, h)), s"missing window row for ($t, $h)")
    }
  }
}
