package graft

import org.apache.spark.sql.functions._

import graft.engine.{Relational17, Tables}

class Relational17Spec extends SparkTestBase {
  import spark.implicits._

  test("q182 indices average to 1 under the count weighting, rows cover all events") {
    val rows = Relational17.q182Seasonality(spark, sf).collect()
    assert(rows.map(_.getAs[Number]("n").longValue).sum
      == Tables.events(spark, sf).count())
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      // Σ n·day_mean = Σ n·type_mean·index ⇒ count-weighted index mean ≈ 1
      val n = rs.map(_.getAs[Number]("n").doubleValue)
      val idx = rs.map(_.getAs[Double]("seasonal_index"))
      val wavg = n.zip(idx).map { case (a, b) => a * b }.sum / n.sum
      assert(math.abs(wavg - 1.0) < 1e-3)
      assert(rs.map(_.getAs[Number]("dow").intValue).distinct.length == rs.length)
    }
  }

  test("q183 per-label counts cover the query slice and accuracy is the ratio") {
    val rows = Relational17.q183KnnEval(spark, sf).collect()
    val nq = Tables.embeddings(spark, sf).filter($"vec_id" % 25 === 0).count()
    assert(rows.map(_.getAs[Long]("n_queries")).sum == nq)
    rows.foreach { r =>
      val (q, c) = (r.getAs[Long]("n_queries"), r.getAs[Long]("n_correct"))
      assert(c <= q)
      assert(math.abs(r.getAs[Double]("accuracy") - c.toDouble / q) < 1e-6)
    }
  }

  test("q184 every anchor fills its negative quota from other sources") {
    val rows = Relational17.q184NegativeSampling(spark, sf).collect()
    val docs = Tables.documents(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_anchors")).sum == docs,
      "every doc must anchor at least one pair (3 probes, 20 sources)")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_pairs")
        <= r.getAs[Long]("n_anchors") * Relational17.NegPerAnchor)
      assert(r.getAs[Double]("fill_rate") > 0.5)
    }
  }

  test("q185 psi is non-negative and symmetric halves give zero drift on a copy") {
    val rows = Relational17.q185Psi(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getAs[Double]("psi") >= 0.0, "PSI is a divergence")
      assert(r.getAs[Long]("n_first") + r.getAs[Long]("n_second") > 0)
    }
    val total = rows.map(r =>
      r.getAs[Long]("n_first") + r.getAs[Long]("n_second")).sum
    assert(total == Tables.events(spark, sf).count())
  }
}
