package graft

import org.apache.spark.sql.functions._

import graft.engine.{Dedup, Tables, TextQueries}

/** Wave 40 (q264–q266): data-recipe planning, dedup ROI curve, MapState
  * streaming counts. Invariants: budget conservation and temperature
  * direction, threshold monotonicity, stream-equals-batch. */
class Wave40Spec extends SparkTestBase {

  test("q264 recipe conserves the budget split and upsamples small sources") {
    import spark.implicits._
    val plan = TextQueries.q264DataRecipe(spark, sf)
    assert(plan.filter($"contributed" + $"deficit" =!= $"desired").count() === 0,
      "every desired token is either contributed or reported as deficit")
    assert(plan.filter($"epochs" < 1 ||
      $"epochs" > TextQueries.RecipeMaxEpochs).count() === 0)
    val rows = plan.select($"t_tokens", $"epochs").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val smallest = rows.minBy(_._1)
    val largest = rows.maxBy(_._1)
    assert(smallest._2 >= largest._2,
      "α=1/2 temperature scaling must not repeat a small source less " +
        s"than a large one: $smallest vs $largest")
  }

  test("q265 removal is monotone non-increasing in the threshold") {
    val curve = Dedup.q265DedupRoi(spark, sf).orderBy(col("tau_permille"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    curve.sliding(2).foreach { case Array(lo, hi) =>
      assert(hi._2 <= lo._2 && hi._3 <= lo._3,
        s"a stricter threshold cannot remove more: $lo -> $hi")
    }
    assert(curve.last._2 > 0, "the fixture's verbatim dups survive τ=0.985")
  }

  test("q266 MapState stream equals batch per-(user, type) counts") {
    import spark.implicits._
    val streamed = graft.streaming.Streaming.q266StreamTypeCounts(spark, sf)
    val batch = Tables.events(spark, sf)
      .groupBy($"user_id", $"event_type")
      .agg(count(lit(1)).as("counts"))
    assert(streamed.exceptAll(batch).isEmpty &&
      batch.exceptAll(streamed).isEmpty)
  }

  test("q267 ListState buffer holds exactly the K most recent events per user") {
    import spark.implicits._
    val res = graft.streaming.Streaming.q267StreamLastK(spark, sf)
      .withColumn("k", size(split($"last5", ",")))
    assert(res.filter($"n_events" >= graft.streaming.Streaming.LastK &&
      $"k" =!= graft.streaming.Streaming.LastK).count() === 0,
      "a user with >= K events must report a full buffer")
    assert(res.filter($"n_events" < graft.streaming.Streaming.LastK &&
      $"k" =!= $"n_events").count() === 0,
      "a user with < K events reports them all")
  }

  test("q269 md5 shuffle lands near multinomial expectation; sorted order does not") {
    val rows = graft.engine.Relational30.q269ShuffleQuality(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("rate_ppm"), r.getAs[Long]("expected_ppm"))).toMap
    val (shufRate, expect) = rows("2_md5_shuffled")
    val (sortRate, _) = rows("1_source_sorted")
    assert(sortRate > 10 * expect,
      "source-sorted order must be grossly clustered vs expectation")
    assert(shufRate < 3 * expect + 20000,
      s"the md5 shuffle must sit near the multinomial rate: $shufRate vs $expect")
  }

  test("q268 XML roundtrip conserves rows and the exact value sum") {
    import spark.implicits._
    val res = graft.engine.Formats.q268XmlRoundtrip(spark, sf)
    val n = res.agg(sum($"counts")).head.getLong(0)
    assert(n === Tables.events(spark, sf)
      .filter($"event_id" % 10 === 0).count(),
      "every written <event> row must read back")
  }
}
