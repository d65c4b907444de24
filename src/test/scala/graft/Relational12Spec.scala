package graft

import org.apache.spark.sql.functions._

import graft.engine.{Relational12, Tables}

class Relational12Spec extends SparkTestBase {
  import spark.implicits._

  test("q159 splits partition the log and the embargo band is non-empty") {
    val rows = Relational12.q159PurgedSplit(spark, sf).collect()
    val bySplit = rows.map(r => r.getString(0) -> r).toMap
    val total = Tables.events(spark, sf).count()
    val parts = Seq("a_train", "b_embargo", "c_test").map(bySplit(_))
    assert(parts.map(_.getAs[Long]("n")).sum == total)
    // contiguous, ordered id ranges: train < embargo < test
    assert(parts.sliding(2).forall { case Seq(lo, hi) =>
      lo.getAs[Long]("max_id") < hi.getAs[Long]("min_id") })
    assert(bySplit("b_embargo").getAs[Long]("n") > 0)
    // leak audit counts users on both non-embargo sides
    val leak = bySplit("d_leak_users").getAs[Long]("n")
    assert(leak >= 0 && leak <= bySplit("a_train").getAs[Long]("n_users"))
  }

  test("q160 deciles cover [0,1] with monotone non-overlapping ranges") {
    val rows = Relational12.q160GroupNorm(spark, sf).collect()
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("bucket"))
      // per-type totals match the log and extremes hit 0 and 1
      assert(sorted.head.getAs[Double]("min_norm") == 0.0)
      assert(sorted.last.getAs[Double]("max_norm") == 1.0)
      sorted.foreach { r =>
        assert(r.getAs[Double]("min_norm") <= r.getAs[Double]("max_norm"))
      }
      sorted.sliding(2).foreach {
        case Array(lo, hi) =>
          assert(lo.getAs[Double]("max_norm") <= hi.getAs[Double]("min_norm"))
        case _ =>
      }
    }
    val n = rows.map(_.getAs[Long]("n")).sum
    assert(n == Tables.events(spark, sf).count())
  }

  test("q161 head alternates sources round-robin by descending length rank") {
    val rows = Relational12.q161Curriculum(spark, sf).collect()
    assert(rows.length == Relational12.CurriculumHead)
    val nSrc = Tables.documents(spark, sf).select($"source").distinct().count().toInt
    // positions are 0..23 and the source cycles with period |sources|
    // (the trailing round may be partial when |sources| ∤ head size)
    assert(rows.map(_.getAs[Long]("position")).toSeq == (0L until 24L))
    val cycle = rows.map(_.getString(1)).grouped(nSrc).toSeq
    assert(cycle.forall(g => g.distinct.length == g.length))
    cycle.sliding(2).foreach {
      case Seq(full, next) => assert(next.toSeq == full.take(next.length).toSeq,
        "each round visits sources in the same order")
      case _ =>
    }
  }

  test("q162 rates are in (0,1] and expected tokens never exceed actual") {
    val rows = Relational12.q162MixtureReweight(spark, sf).collect()
    val shares = rows.map(_.getAs[Double]("share"))
    assert(math.abs(shares.sum - 1.0) < 1e-4)
    rows.foreach { r =>
      val rate = r.getAs[Double]("rate")
      assert(rate > 0.0 && rate <= 1.0)
      assert(r.getAs[Double]("expected_tokens")
        <= r.getAs[Long]("tokens").toDouble + 1e-6)
    }
  }

  test("q163 ewma lies within each day's hourly mean envelope") {
    val ew = Relational12.q163Ewma(spark, sf).collect()
    val hourly = Tables.events(spark, sf)
      .select(date_format($"ts", "yyyy-MM-dd").as("day"),
        date_format($"ts", "HH").as("hour"),
        graft.engine.Exact.cents($"value").as("c"))
      .groupBy($"day", $"hour")
      .agg((sum($"c") / count(lit(1))).as("m"))
      .collect().groupBy(_.getString(0))
    ew.foreach { r =>
      val ms = hourly(r.getString(0)).map(_.getAs[Double]("m"))
      val v = r.getAs[Double]("ewma")
      assert(v >= ms.min - 1e-6 && v <= ms.max + 1e-6)
      assert(r.getAs[Long]("n_hours") == ms.length)
    }
  }
}
