package graft.engine

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Scratch-directory lifecycle for queries that prove a write/read
  * roundtrip (q49 formats, q63 ingest sink, q86 foreachBatch store).
  * Bench runs every query at least twice, so sink scratch space must be
  * reclaimed inside the query itself or /tmp accretes a copy of the
  * corpus per run. */
object TempIo {

  def createTempDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  def deleteRecursively(path: String): Unit = {
    def rm(f: java.io.File): Unit = {
      // listFiles is null on I/O error / concurrent removal — skip, the
      // final delete() then just fails silently on a non-empty dir
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
      f.delete(): Unit
    }
    rm(new java.io.File(path))
  }

  /** Force a small result to driver memory and re-wrap it as a local
    * DataFrame, so scratch directories backing the lazy plan can be
    * deleted before the caller consumes the result. Only for
    * post-aggregation outputs (the roundtrip queries reduce to at most a
    * few thousand rows); never for row-scale data. */
  def materialize(spark: SparkSession, df: DataFrame): DataFrame = {
    val rows = java.util.Arrays.asList(df.collect(): _*)
    spark.createDataFrame(rows, df.schema)
  }
}
