package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev harness: time individual SparkEntry queries under the Bench
  * session config (warm run + timed run each) without paying for a full
  * Bench pass. Usage: tools/run.sh graft.tools.TimeQuery <sfDir> <name>…
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val show = sys.env.get("SHOW").exists(_ == "1")
    args.drop(1).foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      fn(spark, sfDir).count() // warm
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.3f s, $n rows")
      if (show) fn(spark, sfDir).show(50, truncate = false)
    }
    spark.stop()
  }
}
