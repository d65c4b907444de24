package graft

import org.apache.spark.sql.functions._

import graft.engine.{Relational14, Tables}

class Relational14Spec extends SparkTestBase {
  import spark.implicits._

  test("q169 ratios are sane and boilerplate exists in the templated corpus") {
    val rows = Relational14.q169Boilerplate(spark, sf).collect()
    val nDocs = rows.map(_.getAs[Long]("n_docs")).sum
    assert(nDocs == Tables.documents(spark, sf).count())
    rows.foreach { r =>
      val ratio = r.getAs[Double]("avg_boiler_ratio")
      assert(ratio >= 0.0 && ratio <= 1.0)
      assert((r.getAs[Long]("boiler_shingles") > 0) == (ratio > 0.0))
    }
  }

  test("q170 segments cover all users and scores stay in 1..5") {
    val rows = Relational14.q170Rfm(spark, sf).collect()
    val users = Tables.events(spark, sf)
      .select($"user_id").distinct().count()
    assert(rows.map(_.getAs[Long]("n_users")).sum == users)
    rows.foreach { r =>
      Seq("r", "f", "m").foreach { c =>
        val s = r.getAs[Long](c)
        assert(s >= 1 && s <= 5, s"$c score $s out of range")
      }
    }
    // quintile scores each cover ~n/5 users per dimension
    val byR = rows.groupBy(_.getAs[Long]("r")).view
      .mapValues(_.map(_.getAs[Long]("n_users")).sum)
    assert(byR.values.max - byR.values.min <= 1)
  }

  test("q171 paths are 3-step type chains with descending counts") {
    val rows = Relational14.q171Paths(spark, sf).collect()
    assert(rows.length == 10)
    val types = Tables.events(spark, sf)
      .select($"event_type").distinct().as[String].collect().toSet
    rows.foreach { r =>
      val steps = r.getString(0).split(">")
      assert(steps.length == 3 && steps.forall(types))
    }
    val ns = rows.map(_.getAs[Long]("n"))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b })
  }

  test("q172 buckets partition purchases and prior spend grows with activity") {
    val rows = Relational14.q172PitFeatures(spark, sf).collect()
    val purchases = Tables.events(spark, sf)
      .filter($"event_type" === "purchase").count()
    assert(rows.map(_.getAs[Long]("n_purchases")).sum == purchases)
    // cold-start purchases have zero prior spend by definition
    rows.filter(_.getString(0) == "a_cold")
      .foreach(r => assert(r.getAs[Long]("prior_cents") == 0L))
    // per-purchase prior spend is monotone over the activity ladder
    val perP = rows.sortBy(_.getString(0)).map(r =>
      r.getAs[Long]("prior_cents").toDouble / r.getAs[Long]("n_purchases"))
    perP.zip(perP.tail).foreach { case (lo, hi) => assert(lo <= hi) }
  }

  test("q173 moments match direct computation per type") {
    val rows = Relational14.q173Moments(spark, sf).collect()
    val data = Tables.events(spark, sf)
      .select($"event_type",
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) div 100"))
      .as[(String, Long)].collect().groupBy(_._1)
    rows.foreach { r =>
      val xs = data(r.getString(0)).map(_._2.toDouble)
      val n = xs.length.toDouble
      val mean = xs.sum / n
      val m2 = xs.map(x => (x - mean) * (x - mean)).sum / n
      val m3 = xs.map(x => math.pow(x - mean, 3)).sum / n
      val m4 = xs.map(x => math.pow(x - mean, 4)).sum / n
      assert(r.getAs[Long]("n") == xs.length)
      assert(math.abs(r.getAs[Double]("skewness") - m3 / (m2 * math.sqrt(m2))) < 1e-3)
      assert(math.abs(r.getAs[Double]("excess_kurtosis") - (m4 / (m2 * m2) - 3.0)) < 1e-3)
    }
  }
}
