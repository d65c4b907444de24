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
}
