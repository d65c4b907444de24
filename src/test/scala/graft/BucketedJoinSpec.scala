package graft

import java.nio.file.Files

import graft.engine.{Bucketing, Tables}

class BucketedJoinSpec extends SparkTestBase {
  import spark.implicits._

  test("bucketed fact-fact join plans without a shuffle on either side") {
    val wh = Files.createTempDirectory("graft-bucketed-").toString
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // Force a sort-merge join so the Exchange-elimination is observable
      // (broadcast would trivially avoid the shuffle at this tiny SF).
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      Bucketing.writeBucketed(Tables.lineitem(spark, sf)
        .select($"l_orderkey", $"l_quantity"), "li_b", s"$wh/li", "l_orderkey", 8)
      Bucketing.writeBucketed(Tables.orders(spark, sf)
        .select($"o_orderkey", $"o_totalprice"), "o_b", s"$wh/o", "o_orderkey", 8)

      val joined = Bucketing.bucketedJoin(spark, "li_b", "o_b", "l_orderkey", "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ, got:\n$plan")
      assert(!plan.contains("Exchange"), s"bucketed join should not shuffle:\n$plan")

      // and it is still correct
      val expected = Tables.lineitem(spark, sf).count()
      assert(joined.count() == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS o_b")
      // external tables: DROP TABLE removes only the catalog entry —
      // the scratch dir is the caller's to reclaim
      graft.engine.TempIo.deleteRecursively(wh)
    }
  }
}
