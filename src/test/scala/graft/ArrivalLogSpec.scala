package graft

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.engine.TempIo
import graft.sources.ArrivalLog

/** The segmented/compacted arrival log behind the graftsink streaming
  * source (VERDICT r10 item 1): per-trigger log I/O must be bounded by
  * the SEGMENT (this trigger's fresh files), never the table's
  * lifetime; compaction must fold the directory back to O(1) files at
  * the configured interval; and NO crash point inside compaction — or
  * restart across one — may lose or shift an offset. */
class ArrivalLogSpec extends SparkTestBase {
  import spark.implicits._

  private def entriesOf(log: ArrivalLog): Seq[String] =
    log.slice(0L, log.size)

  private def names(dir: File): Seq[String] =
    Option(dir.listFiles()).getOrElse(Array.empty[File])
      .map(_.getName).filterNot(_.endsWith(".tmp")).sorted.toSeq

  test("per-trigger log work is bounded by the segment, not the table: old files stay byte-identical") {
    val dir = new File(TempIo.createTempDir("alog-spec-"))
    try {
      val log = new ArrivalLog(dir, compactInterval = 1000)
      // simulate a long-running stream: 50 triggers, 3 fresh files each
      var snapshots = Map.empty[String, Long] // name -> size at creation
      (0 until 50).foreach { t =>
        val fresh = (0 until 3).map(i => s"epoch-q-$t/part-$i.graft")
        log.append(fresh)
        val now = Option(dir.listFiles()).get
          .filterNot(_.getName.endsWith(".tmp"))
          .map(f => f.getName -> f.length()).toMap
        val added = now.keySet -- snapshots.keySet
        assert(added === Set(s"seg-${t * 3}.log"),
          s"trigger $t must add exactly its own segment, got $added")
        // every pre-existing log file untouched — the r10 wholesale
        // rewrite would change seg sizes/mtimes every trigger
        snapshots.foreach { case (n, sz) =>
          assert(now(n) === sz, s"$n was rewritten on trigger $t")
        }
        // the new segment holds ONLY this trigger's entries
        assert(Files.readAllLines(new File(dir, s"seg-${t * 3}.log").toPath)
          .size === 3)
        snapshots = now
      }
      assert(log.size === 150)
      // offsets map 1:1 to append order
      assert(log.slice(42, 45) ===
        Seq("epoch-q-14/part-0.graft", "epoch-q-14/part-1.graft",
          "epoch-q-14/part-2.graft"))
    } finally TempIo.deleteRecursively(dir.getAbsolutePath)
  }

  test("compaction folds the directory at the interval and a reload sees identical entries") {
    val dir = new File(TempIo.createTempDir("alog-spec-"))
    try {
      val log = new ArrivalLog(dir, compactInterval = 4)
      (0 until 11).foreach(t => log.append(Seq(s"f-$t.graft")))
      // 11 appends at interval 4 → compactions after t=3 and t=7;
      // since then 3 more segments (t=8..10)
      assert(names(dir) ===
        Seq("compact-8.log", "seg-10.log", "seg-8.log", "seg-9.log"),
        "covered segments and superseded compacts must be reclaimed")
      val reloaded = new ArrivalLog(dir, compactInterval = 4)
      assert(entriesOf(reloaded) === (0 until 11).map(t => s"f-$t.graft"))
      // one more append hits the interval → everything folds to one file
      reloaded.append(Seq("f-11.graft"))
      assert(names(dir) === Seq("compact-12.log"))
      assert(entriesOf(new ArrivalLog(dir, 4)) ===
        (0 until 12).map(t => s"f-$t.graft"))
    } finally TempIo.deleteRecursively(dir.getAbsolutePath)
  }

  test("restart mid-compaction loses no offsets at any crash point") {
    // crash point A: compact file published, covered segments and the
    // older compact NOT yet deleted (the rename happened, cleanup
    // didn't) — loader must prefer the newest compact, ignore and
    // reclaim the stale files, and keep tail segments beyond coverage
    val a = new File(TempIo.createTempDir("alog-spec-"))
    try {
      def put(name: String, lines: Seq[String]): Unit =
        Files.write(new File(a, name).toPath,
          lines.mkString("", "\n", "\n").getBytes("UTF-8"))
      put("compact-2.log", Seq("f0", "f1"))          // older compact
      put("seg-0.log", Seq("f0", "f1"))              // stale (covered)
      put("seg-2.log", Seq("f2", "f3"))              // stale (covered)
      put("compact-4.log", Seq("f0", "f1", "f2", "f3")) // the new compact
      put("seg-4.log", Seq("f4"))                    // tail beyond coverage
      val log = new ArrivalLog(a, 10)
      assert(entriesOf(log) === Seq("f0", "f1", "f2", "f3", "f4"),
        "every offset must survive a crash between compact-rename and cleanup")
      assert(names(a) === Seq("compact-4.log", "seg-4.log"),
        "stale covered segments and superseded compacts are reclaimed on load")
    } finally TempIo.deleteRecursively(a.getAbsolutePath)

    // crash point B: compaction died BEFORE the atomic rename — only a
    // .tmp exists; the segments remain authoritative and the torn tmp
    // is never read
    val b = new File(TempIo.createTempDir("alog-spec-"))
    try {
      Files.write(new File(b, "seg-0.log").toPath, "f0\nf1\n".getBytes("UTF-8"))
      Files.write(new File(b, "seg-2.log").toPath, "f2\n".getBytes("UTF-8"))
      Files.write(new File(b, "compact-3.log.tmp").toPath,
        "f0\nf1\nTORN".getBytes("UTF-8"))
      val log = new ArrivalLog(b, 10)
      assert(entriesOf(log) === Seq("f0", "f1", "f2"))
    } finally TempIo.deleteRecursively(b.getAbsolutePath)

    // a GAP (a deleted segment) must fail loudly, never remap offsets
    val c = new File(TempIo.createTempDir("alog-spec-"))
    try {
      Files.write(new File(c, "seg-0.log").toPath, "f0\n".getBytes("UTF-8"))
      Files.write(new File(c, "seg-5.log").toPath, "f5\n".getBytes("UTF-8"))
      val e = intercept[IllegalArgumentException](new ArrivalLog(c, 10))
      assert(e.getMessage.contains("gap"))
    } finally TempIo.deleteRecursively(c.getAbsolutePath)
  }

  test("legacy single-file seen.log checkpoints load and fold into the segmented form") {
    val dir = new File(TempIo.createTempDir("alog-spec-"))
    try {
      Files.write(new File(dir, "seen.log").toPath,
        "old-0.graft\nold-1.graft\n".getBytes("UTF-8"))
      val log = new ArrivalLog(dir, compactInterval = 1)
      assert(entriesOf(log) === Seq("old-0.graft", "old-1.graft"),
        "pre-segmentation offsets must stay valid")
      log.append(Seq("new-2.graft")) // interval 1 → immediate compaction
      assert(names(dir) === Seq("compact-3.log"),
        "compaction must retire the legacy file")
      assert(entriesOf(new ArrivalLog(dir, 1)) ===
        Seq("old-0.graft", "old-1.graft", "new-2.graft"))
    } finally TempIo.deleteRecursively(dir.getAbsolutePath)
  }

  test("end-to-end: restart replay stays exactly-once with an aggressively compacted log") {
    val table = TempIo.createTempDir("alog-e2e-table-")
    val sink = TempIo.createTempDir("alog-e2e-sink-")
    val ckpt = TempIo.createTempDir("alog-e2e-ckpt-")
    try {
      def append(lo: Long, hi: Long, parts: Int): Unit =
        spark.range(lo, hi).select($"id").repartition(parts)
          .write.format("graftsink").mode("append").option("path", table).save()
      def drain(): Unit = {
        val q = spark.readStream.format("graftsink")
          .option("maxFilesPerTrigger", "1")
          .option("logCompactInterval", "1") // compact on EVERY discovery
          .load(table)
          .writeStream.format("parquet")
          .option("path", sink).option("checkpointLocation", ckpt)
          .outputMode("append")
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      append(0, 60, 3); drain()
      append(60, 100, 2); drain()
      drain() // idle restart
      val got = spark.read.parquet(sink)
      assert(got.count() === 100)
      assert(got.select(countDistinct($"id")).as[Long].head() === 100,
        "no duplicates across compacted-log restarts")
      val logDir = new File(s"$ckpt/sources/0/graft-arrival-log")
      assert(names(logDir) === Seq("compact-5.log"),
        "interval-1 compaction must fold the log to exactly one file")
    } finally {
      TempIo.deleteRecursively(table)
      TempIo.deleteRecursively(sink)
      TempIo.deleteRecursively(ckpt)
    }
  }

  test("live ProcessingTime stream: concurrent appends consume exactly once; idle triggers add nothing") {
    // every other streaming test drains with AvailableNow; this one
    // runs the source the way production would — a live trigger loop
    // discovering appends as they land — and pins the idle posture:
    // triggers with no new data must neither grow the arrival log nor
    // publish epoch dirs (the r10 design rewrote the whole log every
    // trigger; zero-row epochs used to publish empty marker dirs).
    val table = TempIo.createTempDir("alog-live-table-")
    val out = TempIo.createTempDir("alog-live-out-")
    val ckpt = TempIo.createTempDir("alog-live-ckpt-")
    try {
      def append(lo: Long, hi: Long): Unit =
        spark.range(lo, hi).select($"id").coalesce(2)
          .write.format("graftsink").mode("append").option("path", table).save()
      append(0, 20) // the source table must exist (schema sidecar) pre-start
      val q = spark.readStream.format("graftsink").load(table)
        .writeStream.format("graftsink")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("250 milliseconds"))
        .start()
      def countOut(): Long =
        try spark.read.format("graftsink").load(out).count()
        catch { case _: Exception => -1L } // schema sidecar not landed yet
      def awaitCount(n: Long): Unit = {
        val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
        while (countOut() != n && System.nanoTime() < deadline) Thread.sleep(100)
        assert(countOut() === n, s"stream did not reach $n rows in 60 s")
      }
      try {
        awaitCount(20)
        append(20, 50) // lands while the trigger loop is live
        awaitCount(50)
        // idle stretch: several empty trigger fires
        val logDir = new File(s"$ckpt/sources/0/graft-arrival-log")
        val logBefore = names(logDir)
        val epochsBefore = Option(new File(out).listFiles()).get
          .count(_.getName.startsWith("epoch-"))
        Thread.sleep(1500)
        assert(names(logDir) === logBefore,
          "idle triggers must not grow or rewrite the arrival log")
        val epochsAfter = Option(new File(out).listFiles()).get
          .count(_.getName.startsWith("epoch-"))
        assert(epochsAfter === epochsBefore,
          "idle triggers must not publish epoch directories")
      } finally q.stop()
      val got = spark.read.format("graftsink").load(out)
      assert(got.count() === 50)
      assert(got.select(countDistinct($"id")).as[Long].head() === 50,
        "live-trigger consumption must stay exactly-once")
    } finally {
      TempIo.deleteRecursively(table)
      TempIo.deleteRecursively(out)
      TempIo.deleteRecursively(ckpt)
    }
  }

  test("the log routes through the checkpoint's Hadoop FileSystem: a non-file scheme works end to end") {
    // VERDICT r11 item 1: the r11 posture REFUSED non-file checkpoints
    // because the log was java.io-local; now it follows the checkpoint
    // FileSystem exactly as FileStreamSource's metadata log does. The
    // stand-in for an HDFS-style scheme is MockDfsFileSystem —
    // RawLocalFileSystem registered under `mockdfs:` — so the ENTIRE
    // checkpoint (Spark's offset/commit logs AND the arrival log)
    // resolves through the Hadoop FileSystem API under a non-local
    // scheme, byte-backed on local disk.
    spark.sparkContext.hadoopConfiguration.set("fs.mockdfs.impl",
      classOf[MockDfsFileSystem].getName)
    val table = TempIo.createTempDir("alog-mockdfs-table-")
    val sink = TempIo.createTempDir("alog-mockdfs-sink-")
    val ckptLocal = TempIo.createTempDir("alog-mockdfs-ckpt-")
    try {
      def append(lo: Long, hi: Long, parts: Int): Unit =
        spark.range(lo, hi).select($"id").repartition(parts)
          .write.format("graftsink").mode("append").option("path", table).save()
      def drain(): Unit = {
        val q = spark.readStream.format("graftsink")
          .option("maxFilesPerTrigger", "1")
          .option("logCompactInterval", "2")
          .load(table)
          .writeStream.format("parquet")
          .option("path", sink)
          .option("checkpointLocation", "mockdfs:" + ckptLocal)
          .outputMode("append")
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      append(0, 40, 2); drain()
      append(40, 70, 2); drain()
      drain() // idle restart across the non-local scheme
      val got = spark.read.parquet(sink)
      assert(got.count() === 70)
      assert(got.select(countDistinct($"id")).as[Long].head() === 70,
        "exactly-once must hold across restarts on a non-file-scheme checkpoint")
      // the arrival log physically landed INSIDE the checkpoint tree
      // (routed through the mockdfs FileSystem, not strandable driver
      // state): segments/compacts present under <ckpt>/sources/0
      val logDir = new File(s"$ckptLocal/sources/0/graft-arrival-log")
      assert(logDir.isDirectory, "arrival log must live under the checkpoint")
      assert(names(logDir).nonEmpty &&
        names(logDir).forall(n => n.startsWith("seg-") || n.startsWith("compact-")),
        s"expected segmented/compacted log files, got ${names(logDir)}")
    } finally {
      TempIo.deleteRecursively(table)
      TempIo.deleteRecursively(sink)
      TempIo.deleteRecursively(ckptLocal)
    }
  }

  test("copy-on-rename object-store checkpoints are refused loudly, admitted only under the explicit opt-in") {
    // r12 second-review finding: deleting the r11 local-only guard must
    // not silently admit schemes whose rename is copy-then-delete —
    // there the log's atomic-publish crash-safety protocol is void.
    // Stand-in: RawLocalFileSystem registered under `s3a:`.
    spark.sparkContext.hadoopConfiguration.set("fs.s3a.impl",
      classOf[MockS3aFileSystem].getName)
    val local = TempIo.createTempDir("alog-s3a-")
    try {
      val ex = intercept[IllegalArgumentException] {
        ArrivalLog.open(s"s3a:$local/ckpt", compactInterval = 2)
      }
      assert(ex.getMessage.contains("copy-then-delete") &&
        ex.getMessage.contains("allowNonAtomicRename"),
        s"the refusal must name the hazard and the opt-in: ${ex.getMessage}")
      spark.conf.set("spark.graft.arrivalLog.allowNonAtomicRename", "true")
      try {
        val log = ArrivalLog.open(s"s3a:$local/ckpt", compactInterval = 2)
        log.append(Seq("epoch-a/p0", "epoch-a/p1"))
        log.append(Seq("epoch-b/p0"))
        val reloaded = ArrivalLog.open(s"s3a:$local/ckpt", compactInterval = 2)
        assert(reloaded.slice(0, 3) ===
          Seq("epoch-a/p0", "epoch-a/p1", "epoch-b/p0"),
          "under the opt-in the log must function normally")
      } finally
        spark.conf.unset("spark.graft.arrivalLog.allowNonAtomicRename")
    } finally {
      spark.sparkContext.hadoopConfiguration.unset("fs.s3a.impl")
      TempIo.deleteRecursively(local)
    }
  }

  test("ArrivalLog unit cycle over a non-file FileSystem: append, compact, crash-reclaim, reload") {
    val conf = new org.apache.hadoop.conf.Configuration()
    conf.set("fs.mockdfs.impl", classOf[MockDfsFileSystem].getName)
    val local = TempIo.createTempDir("alog-mockdfs-unit-")
    try {
      val p = new org.apache.hadoop.fs.Path(s"mockdfs:$local/alog")
      val fs = p.getFileSystem(conf)
      assert(fs.isInstanceOf[MockDfsFileSystem],
        "the path must resolve to the conf-registered non-local FileSystem")
      val log = new ArrivalLog(p, fs, compactInterval = 2)
      log.append(Seq("epoch-a/p0", "epoch-a/p1"))
      log.append(Seq("epoch-b/p0")) // second segment → compaction
      assert(log.size === 3)
      // bytes really are on the mockdfs-backed directory
      assert(names(new File(s"$local/alog")) === Seq("compact-3.log"))
      val reloaded = new ArrivalLog(p, fs, compactInterval = 2)
      assert(reloaded.slice(0, 3) ===
        Seq("epoch-a/p0", "epoch-a/p1", "epoch-b/p0"),
        "offsets must replay identically through the non-local FileSystem")
    } finally TempIo.deleteRecursively(local)
  }

  test("retention drops only committed, out-of-window entries; offsets stay stable; below-horizon seeks fail loudly") {
    // VERDICT r11 item 3: the resident map is O(total files) for the
    // stream's lifetime without a bound. logRetainMaxEntries lets
    // compaction drop entries that are BOTH below Spark's committed
    // offset (commit() ran — no correct restart replays below it) and
    // outside the retention window; absolute offsets never shift.
    val dir = new File(TempIo.createTempDir("alog-ret-"))
    def hp = new org.apache.hadoop.fs.Path(dir.toURI)
    // HDFS's strict rename contract: a publish targeting an existing
    // name would return false and fail the stream — retention folds
    // must therefore always mint fresh compact names
    val fs = new StrictRenameFileSystem()
    fs.initialize(new java.net.URI("file:///"),
      new org.apache.hadoop.conf.Configuration())
    try {
      val log = new ArrivalLog(hp, fs, compactInterval = 1, retainMaxEntries = 2)
      log.append(Seq("epoch-A/p0", "epoch-A/p1"))
      // nothing committed yet → retention must hold everything
      assert(log.residentStats._1 === 2)
      log.committed(2)
      log.append(Seq("epoch-B/p0", "epoch-B/p1"))
      // floor=2, window start=4-2=2 → drop [0,2) = all of epoch-A
      assert(log.size === 4, "absolute size must count dropped entries")
      assert(log.residentStats._1 === 2)
      assert(log.isRetiredTop("epoch-A") && !log.isRetiredTop("epoch-B"))
      assert(log.slice(2, 4) === Seq("epoch-B/p0", "epoch-B/p1"),
        "retained offsets must replay byte-identically after the drop")
      val e = intercept[IllegalStateException](log.slice(1, 3))
      assert(e.getMessage.contains("retention horizon"),
        s"below-horizon seek must fail loudly, got: ${e.getMessage}")
      // restart: base, retained entries, and the skip set all survive
      val re = new ArrivalLog(hp, fs, compactInterval = 1, retainMaxEntries = 2)
      assert(re.size === 4)
      assert(re.slice(2, 4) === Seq("epoch-B/p0", "epoch-B/p1"),
        "a retained log must replay its committed range byte-identically across restart")
      assert(re.isRetiredTop("epoch-A"),
        "the discovery skip set must survive restart or retired dirs re-ingest")
      intercept[IllegalStateException](re.slice(0, 2))
    } finally TempIo.deleteRecursively(dir.getAbsolutePath)
  }

  test("a commit-triggered refold with no new appends publishes under a fresh name (HDFS strict rename)") {
    // the r12 review finding: retention advances base WITHOUT changing
    // the total, so a refold after an append-triggered compact would
    // have re-targeted compact-<total>.log — silently overwritten by
    // the raw local FS, refused (rename -> false) by HDFS. Names now
    // carry the base; this drives the exact sequence under the strict
    // contract.
    val dir = new File(TempIo.createTempDir("alog-refold-"))
    val fs = new StrictRenameFileSystem()
    fs.initialize(new java.net.URI("file:///"),
      new org.apache.hadoop.conf.Configuration())
    try {
      val hp = new org.apache.hadoop.fs.Path(dir.toURI)
      val log = new ArrivalLog(hp, fs, compactInterval = 1, retainMaxEntries = 1)
      log.append(Seq("part-a.graft", "part-b.graft")) // -> compact-2.log
      assert(names(dir) === Seq("compact-2.log"))
      // an AvailableNow drain: commits arrive AFTER the only discovery,
      // so this refold happens with the total unchanged at 2
      log.committed(2)
      assert(names(dir) === Seq("compact-2-1.log"),
        "the refold must mint a fresh name and reclaim the superseded compact")
      assert(log.size === 2 && log.residentStats._1 === 1)
      val re = new ArrivalLog(hp, fs, compactInterval = 1, retainMaxEntries = 1)
      assert(re.size === 2)
      assert(re.slice(1, 2) === Seq("part-b.graft"))
      assert(re.isRetiredTop("part-a.graft"))
    } finally TempIo.deleteRecursively(dir.getAbsolutePath)
  }

  test("retired epoch dirs compress to one watermark per writer") {
    val dir = new File(TempIo.createTempDir("alog-wm-"))
    val fs = new StrictRenameFileSystem()
    fs.initialize(new java.net.URI("file:///"),
      new org.apache.hadoop.conf.Configuration())
    try {
      val hp = new org.apache.hadoop.fs.Path(dir.toURI)
      val log = new ArrivalLog(hp, fs, compactInterval = 1, retainMaxEntries = 2)
      // an upstream writer publishing one epoch dir per trigger must
      // not grow the skip state per epoch — O(#writers), not O(#epochs)
      (0 until 50).foreach { e =>
        log.append(Seq(s"epoch-qA-$e/p0"))
        log.committed(e + 1L)
      }
      val (resident, _, skips) = log.residentStats
      assert(resident <= 3, s"resident window must stay bounded, got $resident")
      assert(skips === 1L,
        s"50 retired epochs of one writer must compress to ONE watermark, got $skips")
      assert(log.isRetiredTop("epoch-qA-0") && log.isRetiredTop("epoch-qA-40"))
      assert(!log.isRetiredTop("epoch-qA-49"),
        "the newest retained epoch must stay above the watermark")
      assert(!log.isRetiredTop("epoch-qB-0"),
        "another writer's epochs are not covered by qA's watermark")
      // durable across restart via the #skipe header
      val re = new ArrivalLog(hp, fs, compactInterval = 1, retainMaxEntries = 2)
      assert(re.isRetiredTop("epoch-qA-40") && !re.isRetiredTop("epoch-qB-0"))
      assert(re.residentStats._3 === 1L)
    } finally TempIo.deleteRecursively(dir.getAbsolutePath)
  }

  test("retention never splits a commit dir and retires loose files individually") {
    val fs = org.apache.hadoop.fs.FileSystem
      .getLocal(new org.apache.hadoop.conf.Configuration()).getRaw
    // a horizon that lands MID-DIR rounds down: epoch-X's three files
    // entered the log together (dirs are listed once, immutable after
    // publish), so they must retire together or not at all
    val a = new File(TempIo.createTempDir("alog-ret-dir-"))
    try {
      val log = new ArrivalLog(new org.apache.hadoop.fs.Path(a.toURI), fs,
        compactInterval = 1, retainMaxEntries = 2)
      log.append(Seq("epoch-X/p0", "epoch-X/p1", "epoch-X/p2"))
      log.committed(3)
      log.append(Seq("epoch-Y/p0"))
      // window start = 4-2 = 2 lands inside epoch-X → no drop at all
      assert(log.residentStats._1 === 4, "a dir must never retire partially")
      assert(!log.isRetiredTop("epoch-X"))
      log.committed(4)
      log.append(Seq("epoch-Z/p0"))
      // window start = 5-2 = 3 is exactly the X/Y boundary → X retires
      assert(log.residentStats._1 === 2)
      assert(log.isRetiredTop("epoch-X") && !log.isRetiredTop("epoch-Y"))
      assert(log.slice(3, 5) === Seq("epoch-Y/p0", "epoch-Z/p0"))
    } finally TempIo.deleteRecursively(a.getAbsolutePath)

    // loose top-level parts have no dir to group under: each retires
    // under its own name (the skip set holds the file name itself)
    val b = new File(TempIo.createTempDir("alog-ret-loose-"))
    try {
      val log = new ArrivalLog(new org.apache.hadoop.fs.Path(b.toURI), fs,
        compactInterval = 1, retainMaxEntries = 1)
      log.append(Seq("part-a.graft", "part-b.graft"))
      log.committed(2)
      log.append(Seq("part-c.graft"))
      assert(log.residentStats._1 === 1)
      assert(log.isRetiredTop("part-a.graft") && log.isRetiredTop("part-b.graft"))
      assert(log.slice(2, 3) === Seq("part-c.graft"))
    } finally TempIo.deleteRecursively(b.getAbsolutePath)
  }

  test("end-to-end retention: retired dirs are never re-discovered; exactly-once holds across drains") {
    val table = TempIo.createTempDir("alog-rete2e-table-")
    val sink = TempIo.createTempDir("alog-rete2e-sink-")
    val ckpt = TempIo.createTempDir("alog-rete2e-ckpt-")
    try {
      def append(lo: Long, hi: Long, parts: Int): Unit =
        spark.range(lo, hi).select($"id").repartition(parts)
          .write.format("graftsink").mode("append").option("path", table).save()
      def drain(): Unit = {
        val q = spark.readStream.format("graftsink")
          .option("maxFilesPerTrigger", "2")
          .option("logCompactInterval", "1")
          .option("logRetainMaxEntries", "3")
          .load(table)
          .writeStream.format("parquet")
          .option("path", sink).option("checkpointLocation", ckpt)
          .outputMode("append")
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      append(0, 30, 3); drain()
      append(30, 60, 3); drain()
      append(60, 80, 2); drain()
      drain() // idle restart over a retention-trimmed log
      val got = spark.read.parquet(sink)
      assert(got.count() === 80)
      assert(got.select(countDistinct($"id")).as[Long].head() === 80,
        "retired dirs must be skipped at discovery, not re-ingested")
      // the compact file carries the retirement state (skip header)
      val logDir = new File(s"$ckpt/sources/0/graft-arrival-log")
      val compact = names(logDir).filter(_.startsWith("compact-"))
      assert(compact.nonEmpty)
      val content = new String(Files.readAllBytes(
        new File(logDir, compact.last).toPath), "UTF-8")
      assert(content.startsWith("#v2 base="),
        "retention state must be durable in the compact header")
      assert(content.contains("#skip batch-"),
        "retired batch dirs must persist in the discovery skip set")
    } finally {
      TempIo.deleteRecursively(table)
      TempIo.deleteRecursively(sink)
      TempIo.deleteRecursively(ckpt)
    }
  }

  test("a zero-row streaming epoch publishes no epoch directory (idle streams don't accumulate dirs)") {
    val src = TempIo.createTempDir("alog-empty-src-")
    val out = TempIo.createTempDir("alog-empty-out-")
    val ckpt = TempIo.createTempDir("alog-empty-ckpt-")
    try {
      spark.range(0, 10).select($"id").write.parquet(s"$src/data")
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType)))
      def run(pred: org.apache.spark.sql.Column): Unit = {
        val q = spark.readStream.schema(schema).parquet(s"$src/data")
          .filter(pred)
          .writeStream.format("graftsink")
          .option("path", out).option("checkpointLocation", ckpt)
          .outputMode("append")
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      run(lit(false)) // every task commits 0 rows
      val dirs0 = Option(new File(out).listFiles()).get
        .filter(f => f.isDirectory && f.getName.startsWith("epoch-"))
      assert(dirs0.isEmpty,
        "a zero-row epoch must not publish an (empty) epoch directory")
      // the schema sidecar still lands, so the table is readable as empty
      assert(spark.read.format("graftsink").load(out).count() === 0)
      // and a later non-empty epoch through the same checkpoint publishes
      TempIo.deleteRecursively(ckpt)
      run(lit(true))
      assert(spark.read.format("graftsink").load(out).count() === 10)
      val dirs1 = Option(new File(out).listFiles()).get
        .filter(f => f.isDirectory && f.getName.startsWith("epoch-"))
      assert(dirs1.length === 1)
    } finally {
      TempIo.deleteRecursively(src)
      TempIo.deleteRecursively(out)
      TempIo.deleteRecursively(ckpt)
    }
  }
}
