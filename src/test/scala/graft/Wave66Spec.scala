package graft

import org.apache.spark.sql.functions._

import graft.engine.{Exact, Relational47, Tables}

/** Wave 66 (q335–q336): winsorized trend and U-shaped attribution.
  * Teeth: the clip bounds really are the p05/p95 order statistics
  * (brute-forced), and attribution conserves every cent — credited
  * mass plus untouched keeps equals total purchase revenue EXACTLY. */
class Wave66Spec extends SparkTestBase {

  test("q335 winsor bounds equal brute-force order statistics") {
    import spark.implicits._
    val out = Relational47.q335WinsorTrend(spark, sf).collect()
    val vals = Tables.events(spark, sf)
      .select($"event_type", Exact.cents($"value"))
      .as[(String, Long)].collect()
    for (row <- out) {
      val et = row.getAs[String]("event_type")
      val vs = vals.filter(_._1 == et).map(_._2).sorted
      val n = vs.length
      def q(k: Int, of: Int) = {
        var cum = 0L
        vs.find { v => cum += 1; cum * of >= n.toLong * k }.get
      }
      assert(row.getAs[Long]("p05_cents") === q(1, 20), s"p05 for $et")
      assert(row.getAs[Long]("p95_cents") === q(19, 20), s"p95 for $et")
      assert(row.getAs[Long]("slope_den") > 0)
    }
  }

  test("q336 attribution conserves every cent") {
    import spark.implicits._
    val out = Relational47.q336UShapeAttribution(spark, sf)
    val credited = out.agg(sum($"credited_cents")).head().getLong(0)
    val revenue = Tables.events(spark, sf)
      .filter($"event_type" === "purchase")
      .agg(sum(Exact.cents($"value"))).head().getLong(0)
    assert(credited === revenue,
      "first + middle + last + untouched_keep must equal total revenue")
    import scala.jdk.CollectionConverters._
    val classes = out.select($"cls").collect().map(_.getString(0)).toSet
    assert(classes.contains("first") && classes.contains("last"))
  }
}
