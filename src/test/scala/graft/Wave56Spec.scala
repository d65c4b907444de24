package graft

import org.apache.spark.sql.functions._

import graft.engine.{Relational38, Tables}
import graft.functions.TextFunctions

/** Wave 56 (q310–q312): repeated-span coverage, deterministic
  * bootstrap, Hamilton apportionment. Invariants: interval-union
  * coverage is re-derived brute-force for the most-flagged doc,
  * resample masses hover around corpus size with exact multiplicity
  * accounting, and apportioned seats land EXACTLY on the budget. */
class Wave56Spec extends SparkTestBase {

  test("q310 covered mass matches a brute-force interval union on one doc") {
    import spark.implicits._
    val out = Relational38.q310SpanCoverage(spark, sf)
    assert(out.agg(sum($"n_covered")).head().getLong(0) > 0,
      "fixture must contain cross-doc 5-gram boilerplate")
    assert(out.filter($"n_covered" > $"n_tokens").count() === 0)
    // Brute force: recompute the union length for every doc of one source.
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", $"source", TextFunctions.tokens($"text").as("tk"))
      .as[(Long, String, Array[String])].collect()
    val gramOf = (tk: Array[String]) =>
      if (tk.length < 5) Array.empty[(String, Int)]
      else Array.tabulate(tk.length - 4)(i => (tk.slice(i, i + 5).mkString(" "), i + 1))
    val nd = docs.flatMap { case (id, _, tk) => gramOf(tk).map(_._1).distinct.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.size).toMap
    val src = out.orderBy($"n_covered".desc).head().getAs[String]("source")
    val wantCovered = docs.filter(_._2 == src).map { case (_, _, tk) =>
      val marks = gramOf(tk).filter(g => nd(g._1) >= 3).map(_._2).sorted
      var pm = 0; var cov = 0
      for (s <- marks) {
        val add = math.max(0, (s + 4) - math.max(pm, s - 1))
        cov += add; pm = math.max(pm, s + 4)
      }
      cov.toLong
    }.sum
    val got = out.filter($"source" === src).head().getAs[Long]("n_covered")
    assert(got === wantCovered)
  }

  test("q311 multiplicities account exactly and resample mass is near n") {
    import spark.implicits._
    val out = Relational38.q311Bootstrap(spark, sf).cache()
    try {
      assert(out.count() > 0)
      assert(out.groupBy($"source").agg(countDistinct($"b").as("nb"))
        .filter($"nb" =!= 16).count() === 0)
      // Exact check for one (source, b): recompute multiplicities.
      val row = out.orderBy($"source", $"b").head()
      val (src, b) = (row.getAs[String]("source"), row.getAs[Int]("b"))
      val docs = Tables.documents(spark, sf).filter($"source" === src)
        .select($"doc_id").as[Long].collect()
      val md = java.security.MessageDigest.getInstance("MD5")
      def mult(id: Long): Long = {
        val h = md.digest(s"$id:$b".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.charAt(0)
        if (h < '4') 0L else if (h >= 'c') 2L else 1L
      }
      assert(row.getAs[Long]("sum_w") === docs.map(mult).sum)
    } finally out.unpersist()
  }

  test("q312 seats sum exactly to the budget and dominate floors") {
    import spark.implicits._
    val out = Relational38.q312Apportionment(spark, sf)
    assert(out.agg(sum($"seats")).head().getLong(0) === 10000L)
    assert(out.filter($"seats" < $"base" || $"extra" > 1).count() === 0)
    // Proportionality sandwich: base <= exact share < base + 1.
    val tot = out.agg(sum($"n_tokens")).head().getLong(0)
    val bad = out.filter(
      $"base" * tot > $"n_tokens" * 10000L ||
        ($"base" + 1) * tot <= $"n_tokens" * 10000L)
    assert(bad.count() === 0)
  }
}
