package graft

import org.apache.spark.sql.functions._

import graft.engine.{Relational36, Relational40, Tables}

/** Wave 58 (q315–q317): nearest as-of, pairwise KS matrix, quantile
  * normalization. Cross-query consistency is the teeth: the matrix's
  * (BUILDING, MACHINERY) cell must equal q298's dedicated statistic,
  * and the nearest matches are re-derived brute-force. */
class Wave58Spec extends SparkTestBase {

  test("q315 nearest matches equal brute force and respect the tolerance") {
    import spark.implicits._
    val out = Relational40.q315NearestAsof(spark, sf).collect()
    assert(out.nonEmpty)
    assert(out.forall(r => math.abs(r.getAs[Long]("delta_s")) <= 3600))
    val ev = Tables.events(spark, sf)
      .filter($"event_type".isin("purchase", "error"))
      .select($"user_id", unix_micros($"ts"), $"event_id", $"event_type")
      .as[(Long, Long, Long, String)].collect()
    val byUser = ev.groupBy(_._1)
    val want = byUser.toSeq.flatMap { case (_, evs) =>
      val sorted = evs.sortBy(e => (e._2, e._3))
      sorted.zipWithIndex.filter(_._1._4 == "error").flatMap { case (e, i) =>
        val back = sorted.take(i).filter(_._4 == "purchase").lastOption
          .filter(p => e._2 - p._2 <= 3600000000L)
        val fwd = sorted.drop(i + 1).filter(_._4 == "purchase").headOption
          .filter(p => p._2 - e._2 <= 3600000000L)
        (back, fwd) match {
          case (Some(b), Some(f)) =>
            if (e._2 - b._2 <= f._2 - e._2) Some((e._3, b._3)) else Some((e._3, f._3))
          case (Some(b), None) => Some((e._3, b._3))
          case (None, Some(f)) => Some((e._3, f._3))
          case _ => None
        }
      }
    }.toMap
    val got = out.map(r =>
      r.getAs[Long]("error_id") -> r.getAs[Long]("purchase_id")).toMap
    assert(got === want)
  }

  test("q316 matrix cell (BUILDING, MACHINERY) equals q298's statistic") {
    import spark.implicits._
    val matrix = Relational40.q316KsMatrix(spark, sf).cache()
    try {
      assert(matrix.count() === 10)
      val cell = matrix
        .filter($"seg_a" === "BUILDING" && $"seg_b" === "MACHINERY").head()
      val q298 = Relational36.q298KsDrift(spark, sf).head()
      assert(cell.getAs[Long]("ks_num") === q298.getAs[Long]("ks_num"))
      assert(cell.getAs[Long]("n_a") === q298.getAs[Long]("n_a"))
      assert(cell.getAs[Long]("n_b") === q298.getAs[Long]("n_b"))
    } finally matrix.unpersist()
  }

  test("q317 deciles are monotone and the pooled column is shared") {
    import spark.implicits._
    val t = Relational40.q317QuantileNorm(spark, sf).cache()
    try {
      // monotone within each source
      val badMono = t.as("a").join(t.as("b"),
          col("a.source") === col("b.source") &&
            col("a.decile") + 1 === col("b.decile"))
        .filter(col("a.src_val") > col("b.src_val") ||
          col("a.pooled_val") > col("b.pooled_val"))
      assert(badMono.count() === 0)
      // the pooled mapping is identical for every source
      assert(t.select($"decile", $"pooled_val").distinct().count() === 9)
      // brute-force the pooled median (decile 5)
      val wcs = Tables.documents(spark, sf)
        .select(graft.functions.TextFunctions.tokenCount($"text").cast("long"))
        .as[Long].collect().sorted
      val n = wcs.length
      val med = wcs.zipWithIndex
        .collectFirst { case (v, i) if (i + 1) * 10 >= n * 5 => v }.get
      assert(t.filter($"decile" === 5).head().getAs[Long]("pooled_val") === med)
    } finally t.unpersist()
  }
}
