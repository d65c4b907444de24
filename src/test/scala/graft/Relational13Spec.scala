package graft

import org.apache.spark.sql.functions._

import graft.engine.{Relational13, Tables}

class Relational13Spec extends SparkTestBase {
  import spark.implicits._

  test("q164 both models credit the same purchases (same n and cents totals)") {
    val rows = Relational13.q164Attribution(spark, sf).collect()
    val byModel = rows.groupBy(_.getString(0))
    assert(byModel.keySet == Set("first", "last"))
    // a purchase has a first touch iff it has a last touch, so the two
    // models distribute the identical credit pool across touch types
    val totals = byModel.view.mapValues(rs =>
      (rs.map(_.getAs[Long]("n_purchases")).sum,
        rs.map(_.getAs[Long]("cents")).sum)).toMap
    assert(totals("first") == totals("last"))
    // and never credit the purchase type itself
    assert(rows.forall(_.getString(1) != "purchase"))
  }

  test("q165 pmi matches a hand-computed value and counts are consistent") {
    val rows = Relational13.q165Pmi(spark, sf).collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      val (nab, na, nb) = (r.getAs[Long]("n_ab"), r.getAs[Long]("n_a"),
        r.getAs[Long]("n_b"))
      assert(nab <= math.min(na, nb))
      assert(!r.getAs[Double]("pmi").isNaN)
    }
    // recompute the head row's PMI from its own counts
    val toks = Tables.documents(spark, sf)
      .select(graft.functions.TextFunctions.tokens($"text").as("t"))
      .as[Seq[String]].collect()
    val nUni = toks.map(_.length.toLong).sum
    val nBi = toks.map(s => math.max(0, s.length - 1).toLong).sum
    val h = rows.head
    val expected = math.log(
      (h.getAs[Long]("n_ab").toDouble / nBi)
        / ((h.getAs[Long]("n_a").toDouble / nUni)
          * (h.getAs[Long]("n_b").toDouble / nUni)))
    assert(math.abs(h.getAs[Double]("pmi") - expected) < 1e-6)
  }

  test("q166 deciles are balanced, exhaustive, and rates stay in [0,1]") {
    val rows = Relational13.q166Calibration(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("decile")).toSeq == (0L until 10L))
    val n = Tables.embeddings(spark, sf).count() - 1
    assert(rows.map(_.getAs[Long]("n")).sum == n)
    val sizes = rows.map(_.getAs[Long]("n"))
    assert(sizes.max - sizes.min <= 1, "deciles differ by at most one row")
    rows.foreach { r =>
      val mr = r.getAs[Double]("match_rate")
      assert(mr >= 0.0 && mr <= 1.0)
      assert(r.getAs[Double]("mean_cos") >= -1.000001
        && r.getAs[Double]("mean_cos") <= 1.000001)
    }
  }

  test("q167 clustering turns partial chunks into pruned/full ones") {
    val rows = Relational13.q167ZoneMap(spark, sf).collect()
    val by = rows.map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val total = Tables.lineitem(spark, sf).count()
    // both layouts account for every row
    Seq("arrival", "clustered").foreach { l =>
      val s = rows.filter(_.getString(0) == l).map(_.getAs[Long]("n_rows")).sum
      assert(s == total, s"$l layout must cover all $total rows, got $s")
    }
    // the arrival layout cannot skip anything (every chunk spans the range)
    assert(!by.contains(("arrival", "pruned")) && !by.contains(("arrival", "full")))
    // the clustered layout prunes most rows for a 1-of-7-years predicate
    val pruned = by.get(("clustered", "pruned")).map(_.getAs[Long]("n_rows")).getOrElse(0L)
    assert(pruned > total / 2, s"clustered layout should prune >half, got $pruned/$total")
  }

  test("q168 buckets partition the log and lateness is jitter-bounded") {
    val rows = Relational13.q168OooAudit(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("n")).sum == Tables.events(spark, sf).count())
    // some disorder must exist under the jitter, but bucket maxima honor
    // the decade ladder
    assert(rows.length > 1, "jitter must produce non-zero lateness")
    rows.foreach { r =>
      val (b, m) = (r.getAs[Long]("bucket"), r.getAs[Long]("max_late_min"))
      val hi = Seq(1L, 10L, 100L, 1000L, 10000L, Long.MaxValue)(b.toInt)
      assert(m < hi)
    }
  }
}
