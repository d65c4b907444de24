package graft

import org.apache.spark.sql.functions._

import graft.engine.{Dedup, Relational6, Tables, TextQueries}
import graft.functions.TextFunctions

/** Eighth query wave: mixture weights, Markov transitions, prefix-filter
  * similarity join, heavy hitters, split leakage, budget sampling,
  * retention, append-mode windows, Tukey outliers. */
class Relational6Spec extends SparkTestBase {
  import spark.implicits._

  test("q102 prefix filtering is result-invisible: equals the brute-force join") {
    // brute force: all pairs sharing >= 1 shingle, exact threshold —
    // the same formulation the DuckDB oracle uses, here in Spark so the
    // blocking lemma (J >= 1/2 pairs MUST share a rarest-first prefix
    // element) is asserted independently of the oracle engine.
    val sh = Tables.documents(spark, sf)
      .select($"doc_id", explode(TextFunctions.tokens($"text")).as("t"))
    val grams = Tables.documents(spark, sf)
      .select($"doc_id", TextFunctions.tokens($"text").as("toks"))
      .select($"doc_id", graft.functions.Generators.wordShingles($"toks", 3))
      .select($"doc_id", $"shingle").distinct()
    val sz = grams.groupBy($"doc_id").agg(count(lit(1)).as("n"))
    val brute = grams.as("a")
      .join(grams.as("b"), $"a.shingle" === $"b.shingle" && $"a.doc_id" < $"b.doc_id")
      .groupBy($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"))
      .agg(count(lit(1)).as("n_common"))
      .join(sz.select($"doc_id".as("doc_a"), $"n".as("sz_a")), "doc_a")
      .join(sz.select($"doc_id".as("doc_b"), $"n".as("sz_b")), "doc_b")
      .filter($"n_common" * 3 >= $"sz_a" + $"sz_b")
      .select($"doc_a", $"doc_b", $"n_common")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val pruned = Dedup.q102PrefixSimJoin(spark, sf)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
        r.getAs[Long]("n_common")).toMap
    assert(pruned == brute, "prefix-filtered join must lose/add no pairs")
    assert(brute.nonEmpty, "fixture must exercise the join")
  }

  test("q102 jaccard threshold law: every reported pair has jaccard >= 0.5") {
    Dedup.q102PrefixSimJoin(spark, sf).collect().foreach { r =>
      val j = r.getAs[Double]("jaccard")
      assert(j >= 0.5 && j <= 1.0)
      assert(r.getAs[Long]("n_union") >= r.getAs[Long]("n_common"))
    }
  }

  test("q100 integer-weight normalization: shares sum to ~1, weight law holds") {
    val rows = Relational6.q100MixtureWeights(spark, sf).collect()
    val mix = rows.map(_.getAs[Double]("mix_share")).sum
    assert(math.abs(mix - 1.0) < 1e-4, s"mix shares sum to $mix")
    rows.foreach { r =>
      val w = r.getAs[Long]("weight"); val t = r.getAs[Long]("n_tokens")
      assert(w * w <= t && (w + 1) * (w + 1) > t, "weight = isqrt(tokens)")
    }
  }

  test("q101 transition matrix: rows normalize to 1, mass = events minus chain starts") {
    val rows = Relational6.q101Transitions(spark, sf).collect()
    rows.groupBy(_.getAs[String]("prev_type")).foreach { case (_, rs) =>
      assert(math.abs(rs.map(_.getAs[Double]("prob")).sum - 1.0) < 1e-4)
    }
    val nUsers = Tables.events(spark, sf).select($"user_id").distinct().count()
    val nEvents = Tables.events(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n")).sum == nEvents - nUsers,
      "every event transitions except each user's first")
  }

  test("q103 skew stats: top user is the arg-max with smallest-id tie-break") {
    val got = Relational6.q103HeavyHitters(spark, sf).collect()
    val byType = Tables.events(spark, sf)
      .groupBy($"event_type", $"user_id").agg(count(lit(1)).as("n"))
      .collect().groupBy(_.getString(0))
    got.foreach { r =>
      val ks = byType(r.getAs[String]("event_type"))
        .map(x => (x.getLong(1), x.getLong(2)))
      val maxN = ks.map(_._2).max
      assert(r.getAs[Long]("top_n") == maxN)
      assert(r.getAs[Long]("top_user") == ks.filter(_._2 == maxN).map(_._1).min)
      assert(r.getAs[Double]("skew") >= 1.0, "max/mean ratio is >= 1")
    }
  }

  test("q104 leakage cells partition the q21 pair list") {
    val cells = Dedup.q104SplitLeakage(spark, sf).collect()
    val total = cells.map(_.getAs[Long]("n_pairs")).sum
    assert(total == Dedup.q21MinhashLsh(spark, sf).count())
    cells.foreach { r =>
      val diag = r.getAs[String]("split_a") == r.getAs[String]("split_b")
      assert(r.getAs[Long]("n_leaks") == (if (diag) 0L else r.getAs[Long]("n_pairs")))
    }
  }

  test("q105 budget sampler: keep set is a deterministic subset; rate-1 keeps all") {
    val rows = TextQueries.q105BudgetSample(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("kept_docs") <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("kept_tokens") <= r.getAs[Long]("n_tokens"))
      if (r.getAs[Double]("rate") >= 1.0) {
        assert(r.getAs[Long]("kept_docs") == r.getAs[Long]("n_docs"),
          "rate >= 1 must keep every doc (threshold would overflow 13 hex digits)")
      }
    }
    // decision is per-row reproducible: two runs agree exactly
    val again = TextQueries.q105BudgetSample(spark, sf).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("q106 retention: week 0 is 1.0 for every cohort, cells never exceed cohort") {
    val rows = Relational6.q106Retention(spark, sf).collect()
    val week0 = rows.filter(_.getAs[Int]("week_offset") == 0)
    assert(week0.nonEmpty)
    week0.foreach { r =>
      assert(r.getAs[Long]("active_users") == r.getAs[Long]("cohort_users"),
        "a user is active in their own first week by construction")
    }
    rows.foreach(r =>
      assert(r.getAs[Long]("active_users") <= r.getAs[Long]("cohort_users")))
  }

  test("q107 append mode emits exactly the watermark-passed subset of q27") {
    val complete = graft.streaming.Streaming.q27StreamWindow(spark, sf)
      .collect().map(r => (r.getAs[String]("ws"), r.getAs[String]("event_type")))
      .toSet
    val append = graft.streaming.Streaming.q107AppendWindow(spark, sf)
      .collect().map(r => (r.getAs[String]("ws"), r.getAs[String]("event_type")))
      .toSet
    assert(append.subsetOf(complete))
    assert(append.size < complete.size,
      "the tail windows (watermark not passed at drain) are withheld")
    // the withheld set is exactly the windows within delay of max event time
    val wmCut = Tables.events(spark, sf)
      .select((floor(unix_micros(max($"ts")) / 1000) - 3600000L).as("wm_ms"))
      .head().getLong(0)
    val withheld = complete -- append
    withheld.foreach { case (ws, _) =>
      val endMs = java.time.LocalDateTime.parse(ws.replace(" ", "T"))
        .toInstant(java.time.ZoneOffset.UTC).toEpochMilli + 3600000L
      assert(endMs > wmCut, s"window $ws should have been emitted")
    }
  }

  test("q108 fences: quartiles sit on the k/4 grid and flags match a direct filter") {
    val rows = Relational6.q108OutlierAudit(spark, sf).collect()
    val cents = Tables.events(spark, sf)
      .select($"event_type", ($"value".cast("decimal(18,2)") * 100).cast("long").as("c"))
      .collect().groupBy(_.getString(0))
    rows.foreach { r =>
      val q1 = r.getAs[Double]("q1_cents"); val q3 = r.getAs[Double]("q3_cents")
      assert(q1 * 4 == math.rint(q1 * 4) && q3 * 4 == math.rint(q3 * 4),
        "interpolated quartiles are exact quarter-integers")
      val cs = cents(r.getAs[String]("event_type")).map(_.getLong(1))
      val iqr = q3 - q1
      assert(r.getAs[Long]("n_low") == cs.count(_ < q1 - 1.5 * iqr))
      assert(r.getAs[Long]("n_high") == cs.count(_ > q3 + 1.5 * iqr))
      assert(r.getAs[Long]("n") == cs.length)
    }
  }
}
