package graft

import org.apache.spark.sql.types.{DecimalType, LongType}

import graft.engine.Similarity

/** Pins `spark.graft.q246.widen` — the production posture for corpora
  * whose covariance numerators genuinely outgrow BIGINT (the ×100
  * carve's 200 k vectors already do; the gated contract refuses them
  * loudly). Widen emits the SAME exact integers as DECIMAL(38,0) —
  * identical values on any corpus both paths admit, schema-only
  * difference — and the gated default stays byte-identical. */
class Q246WidenSpec extends SparkTestBase {
  import spark.implicits._

  test("widen emits the gated values exactly, as DECIMAL(38,0)") {
    val gated = Similarity.q246Covariance(spark, sf)
    assert(gated.schema("cov_num").dataType === LongType)
    val gatedRows = gated
      .select($"di", $"dj", $"cov_num").as[(Int, Int, Long)].collect().toSeq
    spark.conf.set("spark.graft.q246.widen", "true")
    try {
      val wide = Similarity.q246Covariance(spark, sf)
      assert(wide.schema("cov_num").dataType === DecimalType(38, 0))
      val wideRows = wide.select($"di", $"dj",
          $"cov_num".cast("long")).as[(Int, Int, Long)].collect().toSeq
      assert(wideRows === gatedRows,
        "widening must change the output WIDTH only, never a value or the order")
    } finally spark.conf.unset("spark.graft.q246.widen")
    // default path byte-stable after unset
    val again = Similarity.q246Covariance(spark, sf)
      .select($"di", $"dj", $"cov_num").as[(Int, Int, Long)].collect().toSeq
    assert(again === gatedRows)
  }
}
