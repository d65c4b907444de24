package graft

import org.apache.spark.sql.functions._

import graft.engine.{Relational37, Tables}
import graft.functions.TextFunctions

/** Wave 54 (q304–q307): corpus-curation audits. Invariants: the growth
  * curve ends exactly at the corpus totals and never decreases, kappa
  * stats stay in their algebraic ranges, Gini lands in [0, 1000), and
  * coverage depths are ordered. */
class Wave54Spec extends SparkTestBase {

  test("q304 curve is monotone and ends at the corpus totals") {
    import spark.implicits._
    val curve = Relational37.q304VocabGrowth(spark, sf)
      .orderBy($"bucket")
      .as[(Long, Long, Long)].collect()
    assert(curve.length === 16)
    assert(curve.sliding(2).forall { case Array(a, b) =>
      b._2 >= a._2 && b._3 >= a._3 })
    val tok = Tables.documents(spark, sf)
      .select(explode(TextFunctions.tokens($"text")).as("t"))
      .filter($"t" =!= "")
    assert(curve.last._2 === tok.count())
    assert(curve.last._3 === tok.distinct().count())
  }

  test("q305 kappa stats respect their algebraic ranges") {
    val row = Relational37.q305KappaStats(spark, sf).head()
    val n = row.getAs[Long]("n")
    val o = row.getAs[Long]("observed")
    val c = row.getAs[Long]("chance_mass")
    assert(n === Tables.documents(spark, sf).count())
    assert(o >= 0 && o <= n)
    assert(c > 0 && c <= n * n)
    val kappa = (n.toDouble * o - c) / (n.toDouble * n - c)
    assert(kappa >= -1.0 && kappa <= 1.0)
  }

  test("q306 Gini lands in [0, 1000) per source") {
    import spark.implicits._
    val g = Relational37.q306GiniConcentration(spark, sf)
    assert(g.count() > 0)
    assert(g.filter($"gini_permille" < 0 || $"gini_permille" >= 1000)
      .count() === 0)
  }

  test("q307 coverage depths are ordered and bounded") {
    import spark.implicits._
    val d = Relational37.q307CoverageDepth(spark, sf)
    assert(d.count() > 0)
    assert(d.filter($"n50" < 1 || $"n50" > $"n90" || $"n90" > $"n_docs")
      .count() === 0)
    // Majority coverage can never need more than half the docs + 1
    // when ranked descending… but it CAN with a flat distribution; the
    // sound bound is n50 <= ceil(n_docs/2) only under uniformity, so
    // assert the definitional one instead: the n50-th cumulative share
    // really crosses 50% — re-derived independently for one source.
    val src = d.orderBy($"source").head().getAs[String]("source")
    val wcs = Tables.documents(spark, sf).filter($"source" === src)
      .select(TextFunctions.tokenCount($"text").cast("long"))
      .as[Long].collect().sorted(Ordering[Long].reverse)
    val tot = wcs.sum
    val n50 = wcs.scanLeft(0L)(_ + _).drop(1).indexWhere(_ * 2 >= tot) + 1
    assert(d.filter($"source" === src).head().getAs[Long]("n50") === n50.toLong)
  }
}
