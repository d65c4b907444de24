package graft.tools

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.sources.GraftMicroBatchStream

/** Measures the graftsink streaming source's per-trigger DISCOVERY cost
  * against a long-lived table (VERDICT r10 item 5): the atomic
  * epoch-dir publish keeps one directory per non-empty epoch for the
  * table's lifetime, so a years-running stream accumulates directories
  * the source must notice. The round-11 mitigations under test:
  *
  *   - published commit dirs are IMMUTABLE, so the source caches each
  *     dir's listing for the stream's lifetime — a steady-state trigger
  *     pays one top-level readdir (names only) plus a descent into NEW
  *     dirs only;
  *   - the arrival log is segmented: the same trigger appends O(fresh)
  *     log bytes, never rewriting the 10k-entry history;
  *   - zero-row epochs publish no dir at all, so an IDLE stream adds
  *     nothing to the count this probe scales.
  *
  * Prints cold (first sync: full descend + full log write), steady
  * (no new data), steady (+1 fresh epoch), and restart (log reload +
  * one full re-descend) timings at the requested epoch count
  * (default 10,000). Recorded in PLANS.md.
  *
  * Usage: tools/run.sh graft.tools.ListCostProbe [epochs]
  */
object ListCostProbe {
  def main(args: Array[String]): Unit = {
    val epochs = args.headOption.map(_.toInt).getOrElse(10000)
    val table = Files.createTempDirectory("graft-listcost-").toFile
    val ckpt = Files.createTempDirectory("graft-listcost-ckpt-").toFile
    try {
      def addEpoch(i: Int): Unit = {
        val d = new File(table, s"epoch-probe-$i")
        d.mkdirs()
        Files.write(new File(d, "part-0.graft").toPath, Array.emptyByteArray)
      }
      (0 until epochs).foreach(addEpoch)
      val schema = StructType(Seq(StructField("id", LongType)))
      def stream() = new GraftMicroBatchStream(table.getAbsolutePath,
        schema, schema, Array.empty, ckpt.getAbsolutePath, None)
      def timed(label: String)(f: => Unit): Unit = {
        val t0 = System.nanoTime()
        f
        println(f"${(System.nanoTime() - t0) / 1e6}%9.1f ms  $label")
      }
      println(s"epoch directories: $epochs (one part file each)")
      val s1 = stream()
      timed(s"cold first sync: descend all $epochs dirs + write the full log once")(
        s1.prepareForTriggerAvailableNow())
      timed("steady trigger, no new data: one top-level readdir, cached descents, no log I/O")(
        s1.prepareForTriggerAvailableNow())
      addEpoch(epochs)
      timed("steady trigger, +1 fresh epoch: descend ONLY the new dir + O(1) log segment append")(
        s1.prepareForTriggerAvailableNow())
      timed("restart: reload the (compacted) log + one full re-descend, once per restart")(
        stream().prepareForTriggerAvailableNow())

      // Arrival-log RESIDENT MEMORY at 100k entries (VERDICT r11
      // item 3): without retention the driver holds every part-file
      // name for the stream's lifetime; with logRetainMaxEntries the
      // resident map is bounded by the window while absolute offsets
      // stay stable (retired dirs persist as one skip-set NAME per
      // commit dir, not per file).
      val logBase = Files.createTempDirectory("graft-alogmem-").toFile
      try {
        def fill(retain: Long, label: String): Unit = {
          val d = new File(logBase, s"ret-$retain")
          val log = new graft.sources.ArrivalLog(
            new org.apache.hadoop.fs.Path(d.toURI),
            org.apache.hadoop.fs.FileSystem
              .getLocal(new org.apache.hadoop.conf.Configuration()).getRaw,
            compactInterval = 100, retainMaxEntries = retain)
          (0 until 10000).foreach { e =>
            log.append((0 until 10).map(i =>
              s"epoch-probe-$e/part-0000$i-of-a-realistic-length-name.graft"))
            log.committed((e + 1) * 10L)
          }
          val (res, chars, skips) = log.residentStats
          println(f"$res%9d entries ($chars%9d chars) + $skips%6d skip names resident  $label (size=${log.size})")
        }
        fill(Long.MaxValue, "retention OFF: O(total) names for the stream's lifetime")
        fill(10000L, "logRetainMaxEntries=10000: resident bounded by the window")
      } finally graft.engine.TempIo.deleteRecursively(logBase.getAbsolutePath)
    } finally {
      graft.engine.TempIo.deleteRecursively(table.getAbsolutePath)
      graft.engine.TempIo.deleteRecursively(ckpt.getAbsolutePath)
    }
  }
}
