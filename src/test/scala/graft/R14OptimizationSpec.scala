package graft

import org.apache.spark.sql.functions._

import graft.engine.{Relational27, Tables}

/** Round-14 optimization pins: the rewritten operators must stay
  * bit-equal to naive references, and the fan-out spread helper must be
  * a no-op exactly when the input already has cluster parallelism. */
class R14OptimizationSpec extends SparkTestBase {

  test("q251 bucketed change-count equals a brute-force global-sort " +
    "lag reference on every ordering × column") {
    import spark.implicits._
    val got = Relational27.q251RleRuns(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // Brute force: materialize the projected frame, sort it globally by
    // each composite key (+ the same md5 tie), and count adjacent
    // changes per column on the driver — exact, no bucketing anywhere.
    val day = "datediff(to_date(l_shipdate), DATE '1995-01-01')"
    val base = Tables.lineitem(spark, sf)
      .select($"l_orderkey", $"l_linenumber", $"l_returnflag",
        $"l_linestatus", expr(day).cast("long").as("ship_day"), $"l_partkey")
      .withColumn("__t", expr(
        """CAST(conv(substr(md5(concat_ws('|', l_orderkey, l_linenumber,
          |  l_returnflag, l_linestatus, ship_day, l_partkey)), 1, 15),
          |  16, 10) AS BIGINT)""".stripMargin))
    for ((label, keyExpr) <- Relational27.orders) {
      val rows = base.withColumn("__k", expr(keyExpr).cast("long"))
        .select($"__k", $"__t", $"l_returnflag", $"l_linestatus",
          $"ship_day", $"l_partkey")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
          r.getString(3), r.getLong(4), r.getLong(5)))
        .sortBy(t => (t._1, t._2))
      def runs[A](f: ((Long, Long, String, String, Long, Long)) => A): Long =
        if (rows.isEmpty) 1L
        else 1L + rows.sliding(2).count {
          case Array(a, b) => f(a) != f(b)
          case _ => false
        }
      assert(got((label, "l_returnflag")) === runs(_._3), s"$label returnflag")
      assert(got((label, "l_linestatus")) === runs(_._4), s"$label linestatus")
      assert(got((label, "ship_day")) === runs(_._5), s"$label ship_day")
      assert(got((label, "l_partkey")) === runs(_._6), s"$label partkey")
    }
  }

  test("spreadForFanout raises a one-split scan to cluster parallelism " +
    "and is a no-op on an already-parallel frame") {
    val p = spark.sparkContext.defaultParallelism
    val oneSplit = Tables.documents(spark, sf)
    assume(oneSplit.rdd.getNumPartitions < p,
      "fixture is expected to arrive as fewer splits than cores")
    val spread = Tables.spreadForFanout(oneSplit)
    assert(spread.rdd.getNumPartitions >= p,
      "a narrow scan must be spread to at least cluster parallelism")
    assert(spread.count() === oneSplit.count(), "spread must not drop rows")
    val wide = oneSplit.repartition(p * 2)
    // no-op: the SAME plan object comes back, not merely an equal one
    assert(Tables.spreadForFanout(wide) eq wide,
      "an already-parallel frame must pass through untouched")
  }
}
