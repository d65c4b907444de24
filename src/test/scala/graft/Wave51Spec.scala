package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.engine.{DistRank, Relational36, Tables}

/** Wave 51 (q297–q299): exact rank statistics. The hash gate proves
  * Spark == DuckDB; these prove both equal the DEFINITIONS — AUC by
  * brute-force pair counting, KS and Spearman midranks by independent
  * reconstruction — and that the shared prefix-sum primitive matches
  * the global-window form it replaces. */
class Wave51Spec extends SparkTestBase {

  test("withRunningSums equals the global-window running sums it replaces") {
    import spark.implicits._
    val df = Seq((5L, 1L, 10L), (1L, 2L, 20L), (3L, 3L, 30L), (3L, 4L, 40L),
        (9L, 5L, 50L), (2L, 6L, 60L), (7L, 7L, 70L), (3L, 8L, 80L))
      .toDF("k", "tie", "v")
    val got = DistRank.withRunningSums(df, "k", "tie",
        Seq("v" -> "cum_v", "tie" -> "cum_t"), nBuckets = 3)
      .select($"k", $"tie", $"cum_v", $"cum_t")
      .orderBy($"k", $"tie").collect()
    val w = Window.orderBy($"k", $"tie")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = df
      .withColumn("cum_v", sum($"v").over(w))
      .withColumn("cum_t", sum($"tie").over(w))
      .select($"k", $"tie", $"cum_v", $"cum_t")
      .orderBy($"k", $"tie").collect()
    assert(got.toSeq === want.toSeq)
  }

  test("q297 AUC equals brute-force pair counting") {
    import spark.implicits._
    val row = Relational36.q297QualityAuc(spark, sf).head()
    val docs = Tables.documents(spark, sf).select(
        expr("(1000 * length(regexp_replace(text, '[^a-zA-Z]', ''))) " +
          "div greatest(length(text), 1)").as("score"),
        ($"lang" === "en").as("pos"))
      .as[(Long, Boolean)].collect()
    val pos = docs.filter(_._2).map(_._1)
    val neg = docs.filterNot(_._2).map(_._1)
    // auc_num2 = 2·(wins) + (ties) over all pos×neg pairs
    var num2 = 0L
    for (p <- pos; n <- neg) {
      if (p > n) num2 += 2L else if (p == n) num2 += 1L
    }
    assert(row.getAs[Long]("n_pos") === pos.length.toLong)
    assert(row.getAs[Long]("n_neg") === neg.length.toLong)
    assert(row.getAs[Long]("auc_num2") === num2)
    val p = row.getAs[Long]("auc_permille")
    assert(p >= 0L && p <= 1000L)
  }

  test("q298 KS numerator equals brute-force CDF max") {
    import spark.implicits._
    val row = Relational36.q298KsDrift(spark, sf).head()
    val cust = Tables.customer(spark, sf)
      .filter($"c_mktsegment".isin("BUILDING", "MACHINERY"))
      .select($"c_custkey", $"c_mktsegment")
    val vals = Tables.orders(spark, sf)
      .join(cust, $"o_custkey" === $"c_custkey")
      .select(graft.engine.Exact.cents($"o_totalprice"),
        ($"c_mktsegment" === "BUILDING").as("isA"))
      .as[(Long, Boolean)].collect()
    val a = vals.filter(_._2).map(_._1).sorted
    val b = vals.filterNot(_._2).map(_._1).sorted
    val grid = (a ++ b).distinct.sorted
    val ksNum = grid.map { v =>
      val ca = a.count(_ <= v).toLong
      val cb = b.count(_ <= v).toLong
      math.abs(ca * b.length - cb * a.length)
    }.max
    assert(row.getAs[Long]("n_a") === a.length.toLong)
    assert(row.getAs[Long]("n_b") === b.length.toLong)
    assert(row.getAs[Long]("ks_num") === ksNum)
  }

  test("q299 Spearman stats equal brute-force midranks") {
    import spark.implicits._
    val row = Relational36.q299SpearmanStats(spark, sf).head()
    val xy = Tables.orders(spark, sf).select(
        graft.engine.Exact.cents($"o_totalprice"),
        datediff(to_date($"o_orderdate"), to_date(lit("1995-01-01")))
          .cast("long"))
      .as[(Long, Long)].collect()
    def midrank2(vs: Array[Long]): Map[Long, Long] = {
      val sorted = vs.sorted
      vs.distinct.map { v =>
        val below = sorted.count(_ < v).toLong
        val at = sorted.count(_ == v).toLong
        v -> (2 * below + at + 1)
      }.toMap
    }
    val rx = midrank2(xy.map(_._1))
    val ry = midrank2(xy.map(_._2))
    val sumD2 = xy.map { case (x, y) =>
      val d = rx(x) - ry(y); d * d
    }.sum
    def tieMass(vs: Array[Long]): Long =
      vs.groupBy(identity).values.map { g =>
        val t = g.length.toLong; t * t * t - t
      }.sum
    assert(row.getAs[Long]("n") === xy.length.toLong)
    assert(row.getAs[Long]("sum_d2") === sumD2)
    assert(row.getAs[Long]("tie_x") === tieMass(xy.map(_._1)))
    assert(row.getAs[Long]("tie_y") === tieMass(xy.map(_._2)))
  }
}
