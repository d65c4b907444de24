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

  test("q150 kmv set ops: estimates are partitioning-independent and sane") {
    val r1 = Relational10.q150KmvSetOps(spark, sf).collect().head
    // the min-k sketch is order/partitioning-independent, so the whole
    // row must be identical under a different shuffle width
    val wide = spark.sessionState.conf.numShufflePartitions
    spark.conf.set("spark.sql.shuffle.partitions", 7)
    val r2 = try Relational10.q150KmvSetOps(spark, sf).collect().head
    finally spark.conf.set("spark.sql.shuffle.partitions", wide)
    assert(r1.toSeq == r2.toSeq, "KMV row must not depend on partitioning")
    val Seq(estU, exU) =
      Seq("est_union", "exact_union").map(c => r1.getAs[Long](c))
    val Seq(estI, exI) =
      Seq("est_inter", "exact_inter").map(c => r1.getAs[Long](c))
    // k=32 ⇒ relative error ~1/√32 ≈ 0.18; assert a generous 2.5σ
    assert(math.abs(estU - exU).toDouble / exU < 0.45,
      s"union estimate $estU too far from $exU")
    assert(estI >= 0 && (exI == 0 || math.abs(estI - exI).toDouble / exI < 1.0),
      s"intersection estimate $estI unreasonable vs $exI")
  }

  test("q150 kmv minima aggregate keeps the k smallest distinct values") {
    val df = spark.range(1000).toDF("v")
      .select((($"v" * 7919) % 1000).as("hv")) // permutation with dups=0
      .agg(graft.functions.KmvAggregate.kmvMinima($"hv", 5).as("s"))
    val s = df.collect().head.getSeq[Long](0)
    assert(s == Seq(0L, 1L, 2L, 3L, 4L),
      s"min-5 of a 0..999 permutation must be 0..4, got $s")
  }

  test("q151 interpolation: observed hours exact, gaps strictly between neighbors") {
    val rows = Relational10.q151Interpolate(spark, sf).collect()
      .sortBy(_.getAs[Long]("h"))
    assert(rows.nonEmpty)
    val hs = rows.map(_.getAs[Long]("h"))
    assert(hs.zip(hs.tail).forall { case (a, b) => b == a + 1 },
      "the grid must be dense")
    assert(rows.head.getAs[Boolean]("observed") &&
      rows.last.getAs[Boolean]("observed"),
      "bounds come from observed hours")
    // every interpolated value lies within [prev observed, next observed]
    var prev = rows.head.getAs[Double]("val")
    val obsIdx = rows.zipWithIndex.filter(_._1.getAs[Boolean]("observed"))
      .map(_._2)
    obsIdx.zip(obsIdx.tail).foreach { case (i, j) =>
      val lo = math.min(rows(i).getAs[Double]("val"), rows(j).getAs[Double]("val"))
      val hi = math.max(rows(i).getAs[Double]("val"), rows(j).getAs[Double]("val"))
      ((i + 1) until j).foreach { g =>
        val v = rows(g).getAs[Double]("val")
        assert(v >= lo - 1e-9 && v <= hi + 1e-9,
          s"gap value $v at ${rows(g)} escapes [$lo, $hi]")
      }
    }
    assert(prev >= 0) // silence unused warning paranoia
  }

  test("q152 chi-square matches a driver-side recompute over the dense grid") {
    val r = Relational10.q152ChiSquare(spark, sf).collect().head
    val obs = Tables.documents(spark, sf)
      .groupBy($"source", $"lang").agg(count(lit(1)).as("o")).collect()
      .map(x => (x.getAs[String]("source"), x.getAs[String]("lang")) ->
        x.getAs[Long]("o")).toMap
    val sources = obs.keys.map(_._1).toSeq.distinct.sorted
    val langs = obs.keys.map(_._2).toSeq.distinct.sorted
    val n = obs.values.sum.toDouble
    val chi2 = (for { s <- sources; l <- langs } yield {
      val o = obs.getOrElse((s, l), 0L).toDouble
      val e = obs.collect { case ((`s`, _), v) => v }.sum.toDouble *
        obs.collect { case ((_, `l`), v) => v }.sum.toDouble / n
      (o - e) * (o - e) / e
    }).sum
    assert(math.abs(r.getAs[Double]("chi2") - chi2) < 1e-4,
      s"engine chi2 ${r.getAs[Double]("chi2")} vs model $chi2")
    assert(r.getAs[Long]("dof") ==
      (sources.length - 1).toLong * (langs.length - 1))
  }

  test("q153 constraint audit: counts recompute directly; both outcomes present") {
    val rows = Relational10.q153ConstraintAudit(spark, sf).collect()
      .map(r => r.getAs[String]("constraint") -> r).toMap
    assert(rows.size == 8)
    val negBal = Tables.customer(spark, sf)
      .filter($"c_acctbal" < 0).count()
    assert(rows("dom_customer_acctbal_nonneg").getAs[Long]("violations")
      == negBal)
    assert(negBal > 0 &&
      !rows("dom_customer_acctbal_nonneg").getAs[Boolean]("ok"),
      "fixture must exercise the failing arm")
    val li = Tables.lineitem(spark, sf)
    assert(rows("pk_lineitem_orderkey_linenumber").getAs[Long]("violations")
      == li.count() - li.select($"l_orderkey", $"l_linenumber")
        .distinct().count())
    assert(rows("fk_orders_custkey").getAs[Boolean]("ok"),
      "orders→customer FK holds on the fixture")
    assert(rows("fk_orders_custkey").isNullAt(
      rows("fk_orders_custkey").fieldIndex("checked")),
      "FK rows report no per-row checked count")
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
