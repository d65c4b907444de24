package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

import graft.engine.{Tables, TempIo}

/** The fixture-contract canary and the adaptive events reader.
  *
  * Round 6 lost 113 queries to a silent physical-encoding change in
  * events.parquet (TIMESTAMP(NANOS) → TIMESTAMP_NTZ(μs)): 98 analysis
  * errors plus 15 silently-wrong streaming results. These tests pin the
  * two defenses: `Tables.normalizeTs` must accept every encoding the
  * driver has ever shipped (and produce identical instants), and
  * `Tables.assertFixtureContract` must fail LOUDLY, with a named cause,
  * on any encoding it cannot prove safe.
  */
class FixtureContractSpec extends SparkTestBase {

  test("assertFixtureContract passes on the driver's current fixtures") {
    Tables.assertFixtureContract(spark, sf) // must not throw
  }

  /** A drifted fixture dir: all tables as shipped, but events.ts
    * re-encoded as the given Spark SQL cast type. */
  private def driftedDir(castTo: String): String = {
    val dir = TempIo.createTempDir("graft-drift-")
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "documents", "embeddings"))
      Files.copy(Paths.get(s"$sf/$t.parquet"), Paths.get(s"$dir/$t.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
    val stage = s"$dir/stage"
    Tables.events(spark, sf)
      .withColumn("ts", col("ts").cast(castTo))
      .coalesce(1).write.parquet(stage)
    val part = new java.io.File(stage).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    Files.move(part.toPath, Paths.get(s"$dir/events.parquet"))
    TempIo.deleteRecursively(stage)
    dir
  }

  test("assertFixtureContract fails loudly, naming events.ts, on an unsupported encoding") {
    val dir = driftedDir("string")
    try {
      val e = intercept[IllegalStateException] {
        Tables.assertFixtureContract(spark, dir)
      }
      assert(e.getMessage.contains("FIXTURE CONTRACT DRIFT"),
        "the canary must name the failure class")
      assert(e.getMessage.contains("events.ts"),
        "the canary must name the drifted column")
    } finally TempIo.deleteRecursively(dir)
  }

  /** Rewrite one table in an otherwise-faithful fixture dir with a
    * column cast — the generic "driver flipped an encoding" simulator. */
  private def rewrittenDir(tableName: String, colName: String,
      castTo: String): String = {
    val dir = TempIo.createTempDir("graft-drift-")
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings")
        if t != tableName)
      Files.copy(Paths.get(s"$sf/$t.parquet"), Paths.get(s"$dir/$t.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
    val stage = s"$dir/stage"
    spark.read.parquet(s"$sf/$tableName.parquet")
      .withColumn(colName, col(colName).cast(castTo))
      .coalesce(1).write.parquet(stage)
    val part = new java.io.File(stage).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    Files.move(part.toPath, Paths.get(s"$dir/$tableName.parquet"))
    TempIo.deleteRecursively(stage)
    dir
  }

  test("assertFixtureContract pins NON-events column types: an int64→int32 key flip fails by name") {
    val dir = rewrittenDir("lineitem", "l_suppkey", "int")
    try {
      val e = intercept[IllegalStateException] {
        Tables.assertFixtureContract(spark, dir)
      }
      assert(e.getMessage.contains("lineitem.l_suppkey"),
        "the canary must name the drifted table.column")
    } finally TempIo.deleteRecursively(dir)
  }

  test("assertFixtureContract pins value types: a double→decimal flip fails by name") {
    val dir = rewrittenDir("customer", "c_acctbal", "decimal(12,2)")
    try {
      val e = intercept[IllegalStateException] {
        Tables.assertFixtureContract(spark, dir)
      }
      assert(e.getMessage.contains("customer.c_acctbal"),
        "the canary must name the drifted table.column")
    } finally TempIo.deleteRecursively(dir)
  }

  test("assertFixtureContract rejects a plain int64-micros events.ts by magnitude") {
    // a long ts whose values are epoch-MICROS would pass the type check
    // (LongType is the legacy nanos encoding) but be silently shrunk
    // 1000x by normalizeTs's div-1000 — the magnitude probe must flag it
    val dir = TempIo.createTempDir("graft-drift-")
    try {
      for (t <- Seq("region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "documents", "embeddings"))
        Files.copy(Paths.get(s"$sf/$t.parquet"), Paths.get(s"$dir/$t.parquet"),
          StandardCopyOption.REPLACE_EXISTING)
      val stage = s"$dir/stage"
      Tables.events(spark, sf)
        .withColumn("ts", unix_micros(col("ts")))
        .coalesce(1).write.parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.move(part.toPath, Paths.get(s"$dir/events.parquet"))
      TempIo.deleteRecursively(stage)
      val e = intercept[IllegalStateException] {
        Tables.assertFixtureContract(spark, dir)
      }
      assert(e.getMessage.contains("not epoch-nanos") ||
        e.getMessage.contains("magnitude"),
        "the canary must flag the ambiguous long encoding by magnitude")
    } finally TempIo.deleteRecursively(dir)
  }

  test("normalizeTs accepts every encoding the driver has shipped, same instants") {
    // current fixture (TIMESTAMP_NTZ μs since round 6) — via Tables.events
    val current = Tables.events(spark, sf)
      .select(col("event_id"), unix_micros(col("ts")).as("us")).orderBy(col("event_id"))
    assert(Tables.events(spark, sf).schema("ts").dataType == TimestampType,
      "the normalized frame must always expose TimestampType")
    val dir = TempIo.createTempDir("graft-enc-")
    try {
      // legacy rounds-1-5 encoding: long nanoseconds (as loaded under
      // nanosAsLong) — normalizeTs must take the div-1000 branch
      val stage = s"$dir/stage"
      Tables.events(spark, sf)
        .withColumn("ts", unix_micros(col("ts")) * 1000L)
        .coalesce(1).write.parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.move(part.toPath, Paths.get(s"$dir/events.parquet"))
      TempIo.deleteRecursively(stage)
      val legacy = Tables.events(spark, dir)
        .select(col("event_id"), unix_micros(col("ts")).as("us")).orderBy(col("event_id"))
      assert(legacy.except(current).count() == 0 &&
        current.except(legacy).count() == 0,
        "long-nanos and timestamp-μs fixtures must normalize to identical instants")
    } finally TempIo.deleteRecursively(dir)
  }
}
