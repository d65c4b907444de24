package graft.tools

import org.apache.spark.sql.SparkSession

/** Dumps `explain("formatted")` for every SparkEntry query — the plan
  * review loop: check PushedFilters / ReadSchema (scan pruning),
  * BroadcastHashJoin vs SortMergeJoin choices, and WholeStageCodegen
  * span coverage.
  * Usage: tools/run.sh graft.tools.Explain <sfDir> [query-substring]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val only = args.drop(1).headOption.getOrElse("")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries
      .filter(_._1.contains(only))
      .foreach { case (name, fn) =>
        println(s"\n======== $name ========")
        try fn(spark, sfDir).explain("formatted")
        catch { case e: Throwable => println(s"explain failed: ${e.getMessage}") }
      }
    spark.stop()
  }
}
