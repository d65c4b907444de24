package graft

import org.apache.spark.sql.functions._

import graft.engine.{Relational7, Tables, TextQueries}

/** Ninth query wave: SCD2 interval builds, char entropy, schema-drift
  * union, value windows, winsorized stats, HLL sketch merge, history
  * fingerprints, bucketed co-located joins. */
class Relational7Spec extends SparkTestBase {
  import spark.implicits._

  test("q109 SCD2 conservation: versions = events, currents = users, intervals chain") {
    val rows = Relational7.q109Scd2Intervals(spark, sf).collect()
    val nEvents = Tables.events(spark, sf).count()
    val nUsers = Tables.events(spark, sf).select($"user_id").distinct().count()
    assert(rows.map(_.getAs[Long]("n_versions")).sum == nEvents,
      "every event opens exactly one version")
    assert(rows.map(_.getAs[Long]("n_current")).sum == nUsers,
      "exactly one open version per user")
    rows.foreach { r =>
      assert(r.getAs[Long]("sum_dur_us") >= 0, "validity intervals are forward")
      assert(r.getAs[Long]("n_versions") >= r.getAs[Long]("n_current"))
    }
  }

  test("q109 interval durations tile each user's lifespan exactly") {
    // sum of closed-interval durations over ALL types = sum over users of
    // (last ts - first ts): the intervals partition each user's history
    // with no gaps or overlaps.
    val total = Relational7.q109Scd2Intervals(spark, sf)
      .agg(sum($"sum_dur_us")).as[Long].head()
    val lifespan = Tables.events(spark, sf)
      .groupBy($"user_id")
      .agg((max(unix_micros($"ts")) - min(unix_micros($"ts"))).as("span"))
      .agg(sum($"span")).as[Long].head()
    assert(total == lifespan, s"intervals must tile lifespans: $total != $lifespan")
  }

  test("q110 entropy bounds: 0 <= H <= log2(alphabet), degenerate text scores 0") {
    val rows = TextQueries.q110CharEntropy(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val h = r.getAs[Double]("entropy")
      val n = r.getAs[Long]("n_chars")
      assert(h >= 0.0 && h <= math.log(n.toDouble) / math.log(2.0) + 1e-9,
        s"entropy $h out of [0, log2($n)]")
    }
    // formula check on a synthetic degenerate and a uniform doc
    val probe = Seq((1L, "aaaaaaaa"), (2L, "abababab"), (3L, "abcdabcd"))
      .toDF("doc_id", "text")
    probe.createOrReplaceTempView("q110_probe")
    val ent = probe
      .select($"doc_id", explode(expr(
        "transform(sequence(1, length(text)), i -> substring(text, i, 1))")).as("ch"))
      .groupBy($"doc_id", $"ch").agg(count(lit(1)).as("c"))
      .groupBy($"doc_id")
      .agg((log2(sum($"c")) - sum($"c" * log2($"c")) / sum($"c")).as("h"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("h")).toMap
    assert(math.abs(ent(1L) - 0.0) < 1e-12, "single-char text has zero entropy")
    assert(math.abs(ent(2L) - 1.0) < 1e-12, "two-symbol uniform text has 1 bit")
    assert(math.abs(ent(3L) - 2.0) < 1e-12, "four-symbol uniform text has 2 bits")
  }

  test("q111 union-by-name conservation: slices partition the table, nulls confined to legacy") {
    val rows = Relational7.q111SchemaDriftUnion(spark, sf).collect()
    val nEvents = Tables.events(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_rows")).sum == nEvents,
      "the two schema versions partition the corpus")
    val cutoff = lit(graft.engine.Relational5.DriftCutoff).cast("timestamp")
    val nCurrent = Tables.events(spark, sf).filter($"ts" >= cutoff).count()
    assert(rows.map(_.getAs[Long]("n_with_value")).sum == nCurrent,
      "only current-schema rows carry the measure")
  }

  test("q112 value windows agree with a window-free per-user reduction") {
    val got = Relational7.q112ValueWindows(spark, sf).collect()
    val expected = Tables.events(spark, sf)
      .select($"user_id", struct($"ts", $"event_id", $"event_type", $"value").as("e"))
      .groupBy($"user_id")
      .agg(sort_array(collect_list($"e")).as("es"))
      .collect().map { r =>
        val es = r.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("es")
        val highs = es.filter(_.getAs[Double]("value") > 100)
        (r.getAs[Long]("user_id"),
          (es.size.toLong, es.head.getAs[String]("event_type"),
            es.last.getAs[String]("event_type"),
            if (es.size >= 3) Some(es(2).getAs[Double]("value")) else None,
            highs.lastOption.map(_.getAs[Double]("value"))))
      }.toMap
    assert(got.nonEmpty)
    got.foreach { r =>
      val (n, ft, lt, tv, lh) = expected(r.getAs[Long]("user_id"))
      assert(r.getAs[Long]("n_events") == n)
      assert(r.getAs[String]("first_type") == ft)
      assert(r.getAs[String]("last_type") == lt)
      assert(Option(r.getAs[java.lang.Double]("third_value")).map(_.toDouble) == tv)
      assert(Option(r.getAs[java.lang.Double]("last_high")).map(_.toDouble) == lh)
    }
  }

  test("q113 winsorize laws: clipped mean within [p05, p95], bounds ordered") {
    val rows = Relational7.q113Winsorize(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val p05 = r.getAs[Double]("p05"); val p95 = r.getAs[Double]("p95")
      val m = r.getAs[Double]("clipped_mean")
      assert(p05 <= p95, s"p05 $p05 > p95 $p95")
      assert(m >= p05 - 1e-6 && m <= p95 + 1e-6,
        s"clipped mean $m escapes [$p05, $p95]")
    }
  }

  test("q113 clipping is idempotent and bounded by the raw mean spread") {
    // winsorized mean never exceeds the raw max or undercuts the raw min
    val raw = Tables.events(spark, sf).groupBy($"event_type")
      .agg(min($"value").as("lo"), max($"value").as("hi"))
      .collect().map(r => r.getAs[String]("event_type") ->
        (r.getAs[Double]("lo"), r.getAs[Double]("hi"))).toMap
    Relational7.q113Winsorize(spark, sf).collect().foreach { r =>
      val (lo, hi) = raw(r.getAs[String]("event_type"))
      val m = r.getAs[Double]("clipped_mean")
      assert(m >= lo && m <= hi)
    }
  }

  test("q114 HLL merged estimate is within the declared bound (self-check column)") {
    val rows = Relational7.q114HllMergeBounds(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("within_bound"),
        s"${r.getAs[String]("event_type")} sketch drifted past ${Relational7.HllRelErr}")
    }
  }

  test("q114 sketch merge is rescan-free equivalent: union of daily sketches = direct sketch") {
    // merging per-day partials must estimate the same cardinality as one
    // sketch over the whole table — the incremental-maintenance law.
    val direct = Tables.events(spark, sf)
      .groupBy($"event_type")
      .agg(hll_sketch_estimate(hll_sketch_agg($"user_id")).as("est"))
      .collect().map(r => r.getAs[String]("event_type") -> r.getAs[Long]("est")).toMap
    val daily = Tables.events(spark, sf)
      .groupBy($"event_type", to_date($"ts").as("d"))
      .agg(hll_sketch_agg($"user_id").as("sk"))
      .groupBy($"event_type")
      .agg(hll_sketch_estimate(hll_union_agg($"sk")).as("est"))
      .collect().map(r => r.getAs[String]("event_type") -> r.getAs[Long]("est")).toMap
    assert(daily == direct, "sketch union must equal the single-pass sketch")
  }

  test("q115 history fingerprints: event conservation and md5 matches a direct path build") {
    val rows = Relational7.q115HistoryPack(spark, sf).collect()
    val nEvents = Tables.events(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_events")).sum == nEvents)
    // spot-check one user's hash against an independently ordered build
    val uid = rows.head.getAs[Long]("user_id")
    val path = Tables.events(spark, sf)
      .filter($"user_id" === uid)
      .orderBy($"ts", $"event_id")
      .select($"event_type").as[String].collect().mkString("|")
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(path.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(rows.head.getAs[String]("path_md5") == md)
  }

  test("q116 bucketed join result equals the plain shuffled join") {
    val bucketed = Relational7.q116BucketedJoin(spark, sf).collect()
    val li = Tables.lineitem(spark, sf).select($"l_orderkey", $"l_quantity")
    val o = Tables.orders(spark, sf).select($"o_orderkey", $"o_orderpriority")
    val plain = li.join(o, $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n_items"),
        graft.engine.Exact.sumExact($"l_quantity", 2).as("sum_qty"))
      .orderBy($"o_orderpriority")
      .collect()
    assert(bucketed.toSeq.map(_.toSeq) == plain.toSeq.map(_.toSeq))
    assert(spark.catalog.tableExists("graft_q116_li") == false,
      "scratch tables must be dropped")
  }
}
