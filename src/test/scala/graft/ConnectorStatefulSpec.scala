package graft

import java.io.File

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.engine.TempIo

/** q414's load-bearing invariant the hash gate can't see: the windowed
  * aggregate's state must accumulate ACROSS micro-batches produced by
  * the graftsink source's admission control — if everything collapsed
  * into one batch, the query would pass its oracle without ever
  * exercising cross-batch state. Re-runs the pipeline with an owned
  * checkpoint and asserts the batch count, then equality with the
  * batch aggregate. */
class ConnectorStatefulSpec extends SparkTestBase {
  import spark.implicits._

  test("q414 aggregates across four connector micro-batches, equal to the batch aggregate") {
    val src = TempIo.createTempDir("csagg-src-")
    val ckpt = TempIo.createTempDir("csagg-ckpt-")
    try {
      val ev = graft.engine.Tables.events(spark, sf)
        .select($"event_id", $"ts", $"event_type",
          graft.engine.Exact.cents($"value").as("cents"))
      ev.repartitionByRange(4, $"ts")
        .write.format("graftsink").mode("append").option("path", src).save()
      val q = spark.readStream.format("graftsink")
        .option("maxFilesPerTrigger", "1")
        .load(src)
        .groupBy(window($"ts", "1 day"), $"event_type")
        .agg(count(lit(1)).as("n"), sum($"cents").as("cents"))
        .writeStream.outputMode("complete")
        .format("memory").queryName("csagg_agg")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val commits = new File(s"$ckpt/commits").listFiles()
        .count(_.getName.forall(_.isDigit))
      assert(commits >= 4,
        s"4 part files at 1 file/trigger must commit >=4 batches, got " +
          s"$commits — without multiple batches this test proves nothing")
      val got = spark.table("csagg_agg")
        .select($"window.start".as("day"), $"event_type", $"n", $"cents")
      val want = ev
        .groupBy(window($"ts", "1 day").getField("start").as("day"),
          $"event_type")
        .agg(count(lit(1)).as("n"), sum($"cents").as("cents"))
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
        "complete-mode emission after the final batch must equal the " +
          "batch aggregate — any cross-batch state loss shows here")
    } finally {
      TempIo.deleteRecursively(src)
      TempIo.deleteRecursively(ckpt)
    }
  }

  test("q415 late-data contract: a sub-watermark row is dropped, an in-gate row still counts") {
    // q415's fixture replays in timestamp order, so its oracle never
    // sees a late row — this test manufactures one with CONTROLLED
    // ARRIVAL through the connector source: epoch A advances the
    // watermark past hour 7, epoch B then delivers two rows BELOW it
    // (their windows already emitted or evictable) and one on-time row.
    // Append mode must drop the late rows and never revise an emitted
    // window — the exactly-once-per-window contract a file/connector
    // sink depends on.
    val table = TempIo.createTempDir("capp-late-table-")
    val out = TempIo.createTempDir("capp-late-out-")
    val ckpt = TempIo.createTempDir("capp-late-ckpt-")
    try {
      def write(rows: Seq[(String, Long)]): Unit =
        rows.toDF("t", "v")
          .select(to_timestamp($"t").as("ts"), $"v")
          .coalesce(1)
          .write.format("graftsink").mode("append").option("path", table).save()
      def drain(): Unit = {
        val agg = spark.readStream.format("graftsink").load(table)
          .withWatermark("ts", "2 hours")
          .groupBy(window($"ts", "1 hour"))
          .agg(count(lit(1)).as("n"), sum($"v").as("sv"))
          .select($"window.start".as("ws"), $"n", $"sv")
        val q = agg.writeStream.outputMode("append")
          .format("graftsink")
          .option("path", out).option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      // epoch A: windows [0,1) and [1,2), plus a 09:00 row that drives
      // the watermark to 07:00 after the batch — both early windows emit
      write(Seq(("2024-03-01 00:30:00", 1L), ("2024-03-01 01:30:00", 10L),
        ("2024-03-01 09:00:00", 100L)))
      drain()
      val after1 = spark.read.format("graftsink").load(out)
        .select($"ws".cast("string"), $"n", $"sv").as[(String, Long, Long)]
        .collect().toSet
      assert(after1 === Set(("2024-03-01 00:00:00", 1L, 1L),
        ("2024-03-01 01:00:00", 1L, 10L)),
        s"watermark 07:00 must emit exactly the two closed windows, got $after1")
      // epoch B: 00:45 (window emitted — LATE, must drop), 05:30 (window
      // closed below the watermark — LATE, must drop), 12:00 (on time,
      // advances the watermark to 10:00 so [9,10) emits)
      write(Seq(("2024-03-01 00:45:00", 1000L), ("2024-03-01 05:30:00", 1000L),
        ("2024-03-01 12:00:00", 1000L)))
      drain()
      val after2 = spark.read.format("graftsink").load(out)
        .select($"ws".cast("string"), $"n", $"sv").as[(String, Long, Long)]
        .collect().toSet
      assert(after2 === Set(
        ("2024-03-01 00:00:00", 1L, 1L),   // NOT revised to n=2 by the late row
        ("2024-03-01 01:00:00", 1L, 10L),
        ("2024-03-01 09:00:00", 1L, 100L)), // emitted once wm passed 10:00
        s"late rows must be dropped and emitted windows never revised, got $after2")
      // the 05:30 late row must not have opened a fresh window either
      assert(!after2.exists(_._1 == "2024-03-01 05:00:00"),
        "a row below the watermark must not resurrect its window")
    } finally {
      TempIo.deleteRecursively(table)
      TempIo.deleteRecursively(out)
      TempIo.deleteRecursively(ckpt)
    }
  }
}
