package graft

import org.apache.spark.sql.functions._

import graft.engine.{Relational62, Tables, TempIo}

/** Wave 81 (q375). Teeth beyond the hash gate: the aggregate pushdown
  * must actually ENGAGE — the physical plan's scan node is
  * GraftAggScan (not the row scan), the scan advertises the pushed
  * aggregation, the rows leaving the scan are group-scale (≤ groups ×
  * part files), and a filter composes with the pushed aggregate.
  * Global (group-less) aggregation over an empty-after-filter table
  * still yields count 0, not an empty frame. */
class Wave81Spec extends SparkTestBase {
  import spark.implicits._

  private def stage(dir: String): Unit =
    Tables.events(spark, sf)
      .select($"event_type".as("etype"), $"user_id".as("uid"),
        graft.engine.Exact.cents($"value").as("cents"))
      .write.format("graftsink").mode("append").option("path", dir).save()

  test("q375 plan swaps to GraftAggScan and scan output is group-scale") {
    val dir = TempIo.createTempDir("w81-agg-")
    try {
      stage(dir)
      val df = spark.read.format("graftsink").load(dir)
        .groupBy($"etype")
        .agg(count(lit(1)).as("n"), count($"uid").as("nu"),
          min($"cents").as("mn"), max($"cents").as("mx"))
      val planStr = df.queryExecution.executedPlan.toString
      assert(planStr.contains("GraftAggScan"),
        s"aggregate pushdown did not engage:\n$planStr")
      assert(planStr.contains("pushedAggregation="))
      // scan emits ≤ groups × files rows, never row-scale
      val nFiles =
        graft.sources.GraftSinkProvider.listParts(dir).length.toLong
      val nGroups = df.count()
      val scanRows = spark.read.format("graftsink").load(dir)
        .groupBy($"etype").agg(count(lit(1)).as("n"))
        .queryExecution.executedPlan.collectLeaves().head
        .execute().count()
      assert(scanRows <= nGroups * nFiles)
      assert(scanRows < Tables.events(spark, sf).count(),
        "scan must not ship row-scale data")
      // values equal the non-pushed computation
      val expect = Tables.events(spark, sf)
        .groupBy($"event_type".as("etype"))
        .agg(count(lit(1)).as("n"), count($"user_id").as("nu"),
          min(graft.engine.Exact.cents($"value")).as("mn"),
          max(graft.engine.Exact.cents($"value")).as("mx"))
      assert(df.orderBy($"etype").collect().toSeq ===
        expect.orderBy($"etype").collect().toSeq)
    } finally TempIo.deleteRecursively(dir)
  }

  test("pushed filter composes with pushed aggregate") {
    val dir = TempIo.createTempDir("w81-aggf-")
    try {
      stage(dir)
      val df = spark.read.format("graftsink").load(dir)
        .filter($"cents" >= 0L)
        .groupBy($"etype").agg(count(lit(1)).as("n"))
      val planStr = df.queryExecution.executedPlan.toString
      assert(planStr.contains("GraftAggScan"))
      assert(planStr.contains("cents"), "filter visible on the agg scan")
      val expect = Tables.events(spark, sf)
        .filter(graft.engine.Exact.cents($"value") >= 0L)
        .groupBy($"event_type".as("etype")).agg(count(lit(1)).as("n"))
      assert(df.orderBy($"etype").collect().toSeq ===
        expect.orderBy($"etype").collect().toSeq)
    } finally TempIo.deleteRecursively(dir)
  }

  test("group-less aggregation over zero surviving rows yields count 0") {
    val dir = TempIo.createTempDir("w81-agg0-")
    try {
      stage(dir)
      val df = spark.read.format("graftsink").load(dir)
        .filter($"etype" === "no_such_type")
        .agg(count(lit(1)).as("n"), max($"cents").as("mx"))
      val planStr = df.queryExecution.executedPlan.toString
      assert(planStr.contains("GraftAggScan"))
      val row = df.collect().head
      assert(row.getLong(0) === 0L)
      assert(row.isNullAt(1))
    } finally TempIo.deleteRecursively(dir)
  }

  test("unsupported aggregate falls back to the row scan") {
    val dir = TempIo.createTempDir("w81-aggu-")
    try {
      stage(dir)
      val df = spark.read.format("graftsink").load(dir)
        .groupBy($"etype").agg(sum($"cents").as("s"))
      val planStr = df.queryExecution.executedPlan.toString
      assert(!planStr.contains("GraftAggScan"),
        "sum must not be claimed by the connector")
      val expect = Tables.events(spark, sf)
        .groupBy($"event_type".as("etype"))
        .agg(sum(graft.engine.Exact.cents($"value")).as("s"))
      assert(df.orderBy($"etype").collect().toSeq ===
        expect.orderBy($"etype").collect().toSeq)
    } finally TempIo.deleteRecursively(dir)
  }
}
