package graft

import java.io.File

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.engine.TempIo

/** Retention × concurrent writers, together (VERDICT r12 item 5):
  * `ArrivalLogSpec` proves retention in isolation and
  * `ConcurrentWritersSpec` proves two interleaved writers, but the
  * interaction — a retention fold racing a second writer's epoch
  * publishes, per-writer skip watermarks carried across REFOLDS and
  * reader restarts — was never driven as one scenario. This spec runs
  * the full stack:
  *
  *   two checkpointed streaming writers → ONE graftsink table →
  *   one checkpointed streaming READER with `logRetainMaxEntries`
  *   small enough to force retention folds mid-interleave,
  *   the reader's ENTIRE checkpoint on `strictdfs:` (HDFS's
  *   refuse-existing-destination rename), so any compact/refold
  *   publish targeting an existing name — the (total, base) collision
  *   class — fails the stream instead of being silently overwritten.
  *
  * Pinned: (1) read-back is the exactly-once union of both writers'
  * inputs across folds, refolds, writer restarts, and reader restarts;
  * (2) the compact header carries one skip watermark PER WRITER and
  * they survive refolds and reader restarts (no retired epoch
  * re-ingests); (3) retention never covers a writer's not-yet-ingested
  * range — epochs published after a fold still land exactly once. */
class RetentionConcurrentSpec extends SparkTestBase {
  import spark.implicits._

  private def logDirOf(ckpt: String) =
    new File(s"$ckpt/sources/0/graft-arrival-log")

  /** (#skipe qid → watermark) lines of the NEWEST compact file. */
  private def skipWatermarks(logDir: File): Map[String, Long] = {
    val compacts = Option(logDir.listFiles()).getOrElse(Array.empty[File])
      .filter(_.getName.startsWith("compact-"))
    if (compacts.isEmpty) Map.empty
    else {
      val newest = compacts.maxBy { f =>
        f.getName.stripPrefix("compact-").stripSuffix(".log")
          .split('-').map(_.toLong) match {
          case Array(total) => (total, 0L)
          case Array(total, base) => (total, base)
        }
      }
      scala.io.Source.fromFile(newest).getLines()
        .collect { case l if l.startsWith("#skipe ") =>
          val body = l.stripPrefix("#skipe ")
          val cut = body.lastIndexOf(' ')
          body.substring(0, cut) -> body.substring(cut + 1).toLong
        }.toMap
    }
  }

  test("retention folds racing two writers: per-writer watermarks survive refolds; union stays exactly-once") {
    spark.sparkContext.hadoopConfiguration.set("fs.strictdfs.impl",
      classOf[StrictDfsFileSystem].getName)
    val srcA = TempIo.createTempDir("rc-src-a-")
    val srcB = TempIo.createTempDir("rc-src-b-")
    val out = TempIo.createTempDir("rc-out-")
    val sink = TempIo.createTempDir("rc-sink-")
    val ckptA = TempIo.createTempDir("rc-ckpt-a-")
    val ckptB = TempIo.createTempDir("rc-ckpt-b-")
    val ckptR = TempIo.createTempDir("rc-ckpt-r-")
    try {
      def append(src: String, lo: Long, hi: Long): Unit =
        spark.range(lo, hi).select($"id").coalesce(1)
          .write.format("graftsink").mode("append").option("path", src).save()
      def writer(src: String, ckpt: String) =
        spark.readStream.format("graftsink")
          .option("maxFilesPerTrigger", "1").load(src)
          .writeStream.format("graftsink")
          .option("path", out).option("checkpointLocation", ckpt)
          .outputMode("append").trigger(Trigger.AvailableNow()).start()
      def drainReader(): Unit = {
        // compactInterval=1 + retainMaxEntries=2 forces a fold at
        // nearly every commit — maximal interleaving of folds with the
        // other writer's publishes; maxFilesPerTrigger=1 makes each
        // epoch its own commit so the committed floor ratchets through
        // the interleaved dirs one at a time
        val q = spark.readStream.format("graftsink")
          .option("maxFilesPerTrigger", "1")
          .option("logCompactInterval", "1")
          .option("logRetainMaxEntries", "2")
          .load(out)
          .writeStream.format("parquet")
          .option("path", sink)
          .option("checkpointLocation", "strictdfs:" + ckptR)
          .outputMode("append").trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
      def readBack() = spark.read.parquet(sink)

      // ROUND 1: both writers live at once (interleaved epoch
      // publishes), then the reader drains with folds at every commit
      (0 until 4).foreach(i => append(srcA, i * 10L, i * 10L + 10))
      (0 until 4).foreach(i => append(srcB, 100L + i * 10, 110L + i * 10))
      val qA1 = writer(srcA, ckptA); val qB1 = writer(srcB, ckptB)
      qA1.awaitTermination(); qB1.awaitTermination()
      drainReader()
      assert(readBack().count() === 80)
      assert(readBack().select(countDistinct($"id")).as[Long].head() === 80)

      val wm1 = skipWatermarks(logDirOf(ckptR))
      assert(wm1.size === 2,
        s"after folding through both writers' retired epochs the compact " +
          s"header must carry one watermark PER writer, got $wm1")

      // ROUND 2: each writer RESTARTS from its checkpoint with new
      // input — their new epochs publish above the fold horizon while
      // the reader refolds; retention must never cover them pre-ingest
      (4 until 8).foreach(i => append(srcA, i * 10L, i * 10L + 10))
      (4 until 8).foreach(i => append(srcB, 100L + i * 10, 110L + i * 10))
      val qA2 = writer(srcA, ckptA); val qB2 = writer(srcB, ckptB)
      qA2.awaitTermination(); qB2.awaitTermination()
      drainReader()
      assert(readBack().count() === 160)
      assert(readBack().select(countDistinct($"id")).as[Long].head() === 160,
        "epochs published after a retention fold must land exactly once")

      // watermarks advanced per writer across the REFOLDS (base moved
      // again), and stayed per-writer — qids identical to round 1
      val wm2 = skipWatermarks(logDirOf(ckptR))
      assert(wm2.keySet === wm1.keySet,
        "a refold must not invent or lose writer watermarks")
      assert(wm2.forall { case (qid, w) => w >= wm1(qid) },
        s"watermarks must be monotone across refolds: $wm1 -> $wm2")
      assert(wm2.exists { case (qid, w) => w > wm1(qid) },
        "round 2's retirements must advance at least one watermark")
      // a refold genuinely happened: the newest compact carries a base
      val newestCompact = Option(logDirOf(ckptR).listFiles()).get
        .map(_.getName).filter(_.startsWith("compact-"))
        .maxBy(n => n.stripPrefix("compact-").stripSuffix(".log")
          .split('-').map(_.toLong).padTo(2, 0L).toSeq match {
          case Seq(t, b) => (t, b)
        })
      assert(newestCompact.stripPrefix("compact-").stripSuffix(".log")
        .split('-').length === 2 &&
        newestCompact.stripPrefix("compact-").stripSuffix(".log")
          .split('-')(1).toLong > 0,
        s"expected a retention-based compact name, got $newestCompact")

      // ROUND 3: idle reader restart — the skip state must come back
      // from the compact header; nothing re-ingests
      drainReader()
      assert(readBack().count() === 160,
        "an idle restart over retired-and-skipped epochs must ingest nothing")

      // ROUND 4: post-restart appends from both writers still ingest —
      // the skip watermarks cover only genuinely retired epochs
      append(srcA, 80, 90); append(srcB, 180, 190)
      val qA3 = writer(srcA, ckptA); val qB3 = writer(srcB, ckptB)
      qA3.awaitTermination(); qB3.awaitTermination()
      drainReader()
      assert(readBack().count() === 180)
      assert(readBack().select(countDistinct($"id")).as[Long].head() === 180)
    } finally {
      Seq(srcA, srcB, out, sink, ckptA, ckptB, ckptR)
        .foreach(TempIo.deleteRecursively)
      spark.sparkContext.hadoopConfiguration.unset("fs.strictdfs.impl")
    }
  }
}
