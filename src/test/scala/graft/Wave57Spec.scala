package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.engine.{DistRank, Relational39, Tables}

/** Wave 57 (q313–q314): grouped order statistics on the grouped
  * two-level prefix-sum primitive. The primitive is property-tested
  * against the per-group global window it replaces; the statistics are
  * re-derived brute-force from collected data. */
class Wave57Spec extends SparkTestBase {

  test("withGroupedRunningSums equals per-group global-window running sums") {
    import spark.implicits._
    val df = Seq(
        ("a", 5L, 1L, 10L), ("a", 1L, 2L, 20L), ("b", 3L, 3L, 30L),
        ("a", 3L, 4L, 40L), ("b", 9L, 5L, 50L), ("b", 2L, 6L, 60L),
        ("c", 7L, 7L, 70L), ("b", 3L, 8L, 80L))
      .toDF("g", "k", "tie", "v")
    val got = DistRank.withGroupedRunningSums(df, Seq("g"), "k", "tie",
        Seq("v" -> "cum_v"), nBuckets = 3)
      .select($"g", $"k", $"tie", $"cum_v")
      .orderBy($"g", $"k", $"tie").collect()
    val w = Window.partitionBy($"g").orderBy($"k", $"tie")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = df.withColumn("cum_v", sum($"v").over(w))
      .select($"g", $"k", $"tie", $"cum_v")
      .orderBy($"g", $"k", $"tie").collect()
    assert(got.toSeq === want.toSeq)
  }

  test("q313 weighted quantiles match brute force per lang") {
    import spark.implicits._
    val out = Relational39.q313WeightedQuantiles(spark, sf)
      .orderBy($"lang").collect()
    val docs = Tables.documents(spark, sf)
      .select($"lang",
        graft.functions.TextFunctions.tokenCount($"text").cast("long"))
      .as[(String, Long)].collect()
    for (row <- out) {
      val lang = row.getAs[String]("lang")
      val wcs = docs.filter(_._1 == lang).map(_._2).sorted
      val tot = wcs.sum
      var cum = 0L
      var med = -1L; var p90 = -1L
      for (v <- wcs) {
        cum += v
        if (med < 0 && cum * 2 >= tot) med = v
        if (p90 < 0 && cum * 10 >= tot * 9) p90 = v
      }
      assert(row.getAs[Long]("med_len") === med, s"median for $lang")
      assert(row.getAs[Long]("p90_len") === p90, s"p90 for $lang")
      assert(row.getAs[Long]("n_tokens") === tot)
    }
  }

  test("q314 trimmed mean matches brute force per segment") {
    import spark.implicits._
    val out = Relational39.q314TrimmedMean(spark, sf).orderBy($"seg").collect()
    val vals = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf), $"o_custkey" === $"c_custkey")
      .select($"c_mktsegment", graft.engine.Exact.cents($"o_totalprice"))
      .as[(String, Long)].collect()
    for (row <- out) {
      val seg = row.getAs[String]("seg")
      val vs = vals.filter(_._1 == seg).map(_._2).sorted
      val n = vs.length
      val lo = n / 20
      val kept = vs.slice(lo, n - lo)
      assert(row.getAs[Long]("n_kept") === kept.length.toLong)
      assert(row.getAs[Long]("trimmed_cents") === kept.sum)
    }
  }
}
