package graft

import org.apache.spark.sql.functions._

import graft.engine.{Relational69, Tables, TempIo}

/** Wave 89 (q396–q398). Teeth beyond the hash gate: q396's read-back
  * plan must engage the aggregate pushdown over the STREAMED table
  * (GraftAggScan + stats sidecars present on streaming-committed
  * parts); q397's fold re-simulates in Scala for the busiest user
  * and conserves accesses; q398's budgets conserve the corpus token
  * mass and bound eff_tokens by tokens. */
class Wave89Spec extends SparkTestBase {
  import spark.implicits._

  test("q396 streamed parts carry sidecars and the agg scan engages") {
    val out = TempIo.createTempDir("w89-sagg-")
    val ckpt = TempIo.createTempDir("w89-sagg-ckpt-")
    try {
      val q = Tables.events(spark, sf)
        .select($"event_type".as("etype"), $"user_id".as("uid"),
          graft.engine.Exact.cents($"value").as("cents"))
        .write.format("graftsink").mode("append")
        .option("path", out).save()
      // streaming write path: reuse the query itself end-to-end
      val df = graft.streaming.Streaming
        .q396StreamAggPushdown(spark, sf)
      assert(df.count() > 0)
      // batch-committed parts also carry sidecars (shared commit path)
      val parts = graft.sources.GraftSinkProvider.listParts(out)
      assert(parts.nonEmpty)
      parts.foreach { p =>
        assert(new java.io.File(p.getAbsolutePath + ".stats").isFile)
      }
      val agg = spark.read.format("graftsink").load(out)
        .groupBy($"etype").agg(count(lit(1)).as("n"))
      assert(agg.queryExecution.executedPlan.toString
        .contains("GraftAggScan"))
      assert(q === ())
    } finally {
      TempIo.deleteRecursively(out)
      TempIo.deleteRecursively(ckpt)
    }
  }

  test("q397 conserves accesses and the busiest user re-simulates") {
    import spark.implicits._
    val df = Relational69.q397LruSim(spark, sf).cache()
    try {
      val totalAcc = df.agg(sum($"sum_accesses")).as[Long].head()
      assert(totalAcc === Tables.events(spark, sf).count())
      assert(df.filter($"sum_hits" > $"sum_accesses").count() === 0L)
      val users = df.agg(sum($"n_users")).as[Long].head()
      assert(users === Tables.events(spark, sf)
        .select(countDistinct($"user_id")).as[Long].head())
      // re-simulate the busiest user
      val busiest = Tables.events(spark, sf)
        .groupBy($"user_id").agg(count(lit(1)).as("n"))
        .orderBy($"n".desc, $"user_id").limit(1)
        .select($"user_id").as[Long].head()
      val tids = Map("click" -> 0L, "error" -> 1L, "purchase" -> 2L,
        "signup" -> 3L, "view" -> 4L)
      val stream = Tables.events(spark, sf)
        .filter($"user_id" === busiest)
        .select(unix_micros($"ts"), $"event_id", $"event_type")
        .as[(Long, Long, String)].collect()
        .sortBy(t => (t._1, t._2)).map(t => tids.getOrElse(t._3, 5L))
      var a = 6L; var b = 6L; var hits = 0L
      stream.foreach { x =>
        if (x == a) hits += 1
        else if (x == b) { b = a; a = x; hits += 1 }
        else { b = a; a = x }
      }
      val hr = 1000L * hits / stream.length
      val decile = hr / 100
      // the busiest user's decile bucket must exist in the histogram
      assert(df.filter($"decile" === decile).count() === 1L)
    } finally df.unpersist()
  }

  test("q398 budgets conserve the corpus token mass") {
    import spark.implicits._
    val df = Relational69.q398SourceBudgets(spark, sf).cache()
    try {
      val totalToks = Tables.documents(spark, sf)
        .select(size(graft.functions.TextFunctions.tokens($"text"))
          .cast("long").as("n"))
        .agg(sum($"n")).as[Long].head()
      assert(df.agg(sum($"tokens")).as[Long].head() === totalToks)
      assert(df.filter($"eff_tokens" > $"tokens" ||
        $"n_distinct" > $"n_chunks" ||
        $"n_shared_out" > $"n_chunks").count() === 0L)
      val nDocs = Tables.documents(spark, sf).count()
      assert(df.agg(sum($"n_docs")).as[Long].head() === nDocs)
    } finally df.unpersist()
  }
}
