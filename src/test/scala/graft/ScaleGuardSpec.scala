package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.engine.{Relational47, TempIo, TextQueries}

/** Pins the scale-hardening behaviors the ×10-carve full-catalog pass
  * forced this round, on fixtures the gate SFs can never produce:
  *
  *  - q335's covariance-style combines (n·Σxy − Σx·Σy) go through
  *    exact DECIMAL(38,0): with epoch-day x (~2·10⁴) the TERMS are
  *    n²-scaled and cross 2⁶³ near 10⁶ rows per type — under Spark 4's
  *    default ANSI mode the old Long combine crashed the whole query
  *    with ARITHMETIC_OVERFLOW at the carve even though the RESULT
  *    fits BIGINT comfortably.
  *  - q283's per-shard kept_md5 must be NULL — not md5('') — for a
  *    shard whose every member is taken down, because the oracle's
  *    string_agg over zero kept rows is NULL and the gate hashes the
  *    cell. No gate fixture has an all-gone shard; this builds one.
  */
class ScaleGuardSpec extends SparkTestBase {

  /** Write df as `<dir>/<table>.parquet` (single file, fixture layout). */
  private def writeTable(dir: String, tableName: String,
      df: org.apache.spark.sql.DataFrame): Unit = {
    val stage = s"$dir/stage-$tableName"
    df.coalesce(1).write.parquet(stage)
    val part = new java.io.File(stage).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    Files.move(part.toPath, Paths.get(s"$dir/$tableName.parquet"))
    TempIo.deleteRecursively(stage)
  }

  test("q335: n²-scaled combine terms over 2^63 compute exactly instead of overflowing") {
    import spark.implicits._
    val dir = TempIo.createTempDir("graft-q335-overflow-")
    try {
      // 400k rows, one type, constant epoch-2024 ts (x ≈ 19800), cents
      // alternating 40000/50000: n·Σxy ≈ 1.4·10^20 — far past 2^63 —
      // while the true slope_num/slope_den are exactly 0 (x constant).
      val n = 400000L
      val ev = spark.range(n).select(
        $"id".as("event_id"),
        lit("2024-03-15 12:00:00").cast("timestamp_ntz").as("ts"),
        ($"id" % 100L).as("user_id"),
        lit("purchase").as("event_type"),
        when($"id" % 2 === 0, 400.0).otherwise(500.0).as("value"),
        lit("{}").as("props"))
      writeTable(dir, "events", ev)
      val r = Relational47.q335WinsorTrend(spark, dir).collect()
      assert(r.length == 1)
      val row = r.head
      assert(row.getAs[Long]("n") == n)
      assert(row.getAs[Long]("p05_cents") == 40000L)
      assert(row.getAs[Long]("p95_cents") == 50000L)
      // constant x ⇒ both combines are exactly zero; the old Long path
      // raised ARITHMETIC_OVERFLOW here under ANSI before ever getting
      // to the (in-range) result
      assert(row.getAs[Long]("slope_num") == 0L)
      assert(row.getAs[Long]("slope_den") == 0L)
    } finally TempIo.deleteRecursively(dir)
  }

  test("q283: a shard whose every doc is taken down hashes to NULL, not md5('')") {
    import spark.implicits._
    val dir = TempIo.createTempDir("graft-q283-allgone-")
    try {
      // doc 13 (≡ TakedownRes mod TakedownMod) occupies shard 0 alone:
      // its 6000 tokens cross the 5000-token budget, so doc 20 starts
      // shard 1. Shard 0 is then ALL taken down; shard 1 keeps doc 20.
      assert(TextQueries.TakedownMod == 97L && TextQueries.TakedownRes == 13L,
        "fixture below assumes the 13 mod 97 takedown selector")
      val text13 = Seq.fill(6000)("tok").mkString(" ")
      val docs = Seq(
        (13L, text13, "en", "web", text13.length.toLong),
        (20L, "just a few tokens here", "en", "web", 22L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
      writeTable(dir, "documents", docs)
      val r = TextQueries.q283TakedownPlan(spark, dir).collect()
      assert(r.length == 2)
      val shard0 = r.find(_.getAs[Long]("shard") == 0L).get
      assert(shard0.getAs[Long]("n_docs") == 1L)
      assert(shard0.getAs[Long]("n_remove") == 1L)
      // the oracle's string_agg FILTER over zero kept rows is NULL;
      // md5(NULL) is NULL — md5('') here would hash-diverge at the gate
      assert(shard0.isNullAt(shard0.fieldIndex("kept_md5")),
        "all-gone shard must carry a NULL kept_md5")
      val shard1 = r.find(_.getAs[Long]("shard") == 1L).get
      assert(shard1.getAs[Long]("n_remove") == 0L)
      assert(shard1.getAs[String]("kept_md5") != null)
    } finally TempIo.deleteRecursively(dir)
  }
}
