package graft

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

import graft.engine.{Exact, Relational64, Tables, TempIo}

/** Wave 84 (q382–q384). Teeth beyond the hash gate: q382's zone-map
  * pruning must actually SKIP files (scan partitions < committed part
  * files) while staying result-invisible, sidecars must exist for
  * every part, and the scan must report exact row statistics; q383's
  * WL rounds must be a true refinement (classes split, never merge)
  * with round 0 = the degree partition; q384 conserves the test set
  * and bounds every band. */
class Wave84Spec extends SparkTestBase {
  import spark.implicits._

  test("q382 zone-map pruning skips files, stats report exact rows") {
    val dir = TempIo.createTempDir("w84-zm-")
    try {
      val staged = Tables.lineitem(spark, sf)
        .select($"l_partkey".as("pk"), Exact.cents($"l_quantity").as("qc"),
          Exact.cents($"l_extendedprice").as("pc"))
      staged.repartitionByRange(8, $"qc")
        .write.format("graftsink").mode("append")
        .option("path", dir).save()
      val parts = graft.sources.GraftSinkProvider.listParts(dir)
      assert(parts.length > 1, "need multiple files for pruning to matter")
      parts.foreach { p =>
        assert(new java.io.File(p.getAbsolutePath + ".stats").isFile,
          s"missing sidecar for ${p.getName}")
      }
      val narrow = spark.read.format("graftsink").load(dir)
        .filter($"qc" >= 4701L && $"qc" <= 5000L)
      val scans = narrow.queryExecution.executedPlan.collect {
        case b: BatchScanExec => b }
      assert(scans.nonEmpty)
      val scanned = scans.head.inputPartitions.length
      assert(scanned < parts.length,
        s"pruning skipped nothing: $scanned of ${parts.length} files scanned")
      // result-invisible: pruned read == full read + post-filter
      val full = spark.read.format("graftsink").load(dir)
        .collect().count { r => val q = r.getAs[Long]("qc")
          q >= 4701L && q <= 5000L }
      assert(narrow.count().toInt === full)
      // exact numRows via SupportsReportStatistics
      val rel = spark.read.format("graftsink").load(dir)
        .queryExecution.optimizedPlan.collect {
          case r: org.apache.spark.sql.execution.datasources.v2
            .DataSourceV2ScanRelation => r }.head
      val stats = rel.scan.asInstanceOf[
        org.apache.spark.sql.connector.read.SupportsReportStatistics]
        .estimateStatistics()
      assert(stats.numRows().getAsLong === staged.count())
      assert(stats.sizeInBytes().getAsLong > 0L)
    } finally TempIo.deleteRecursively(dir)
  }

  test("q383 WL rounds are a strict refinement of the degree partition") {
    import spark.implicits._
    val df = Relational64.q383WlRefinement(spark, sf).orderBy($"round").cache()
    try {
      val rows = df.select($"round", $"n_colors").as[(Long, Long)].collect()
      assert(rows.length === Relational64.Q383Rounds + 1)
      val ns = rows.map(_._2)
      assert(ns.zip(ns.tail).forall { case (a, b) => b >= a },
        "WL classes split, never merge")
      // round 0 is the degree partition
      val li = Tables.lineitem(spark, sf)
        .select($"l_orderkey".as("ok"), $"l_partkey".as("pk")).distinct()
      val degs = li.as("a")
        .join(li.as("b"), $"a.ok" === $"b.ok" && $"a.pk" < $"b.pk")
        .groupBy($"a.pk".as("u"), $"b.pk".as("v"))
        .agg(count(lit(1)).as("cnt")).filter($"cnt" >= 2L)
        .select(explode(array($"u", $"v")).as("n"))
        .groupBy($"n").agg(count(lit(1)).as("deg"))
        .select(countDistinct($"deg")).as[Long].head()
      assert(rows.head._2 === degs)
    } finally df.unpersist()
  }

  test("q384 conserves the test set and bounds every band") {
    import spark.implicits._
    val df = Relational64.q384TransitionSurprise(spark, sf).cache()
    try {
      assert(df.filter($"band" < -1L || $"band" > 10L).count() === 0L)
      assert(df.filter($"sum_permille" > $"n_test" * 1000L).count() === 0L)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"user_id").orderBy($"us", $"event_id")
      val nTest = Tables.events(spark, sf)
        .select($"user_id", $"event_id", $"event_type",
          unix_micros($"ts").as("us"))
        .select($"us", lag($"event_type", 1).over(w).as("prev_t"))
        .filter($"prev_t".isNotNull)
        .filter($"us" >= unix_micros(
          lit(graft.engine.Relational63.Q380Split).cast("timestamp")))
        .count()
      assert(df.agg(sum($"n_test")).as[Long].head() === nTest)
    } finally df.unpersist()
  }
}
