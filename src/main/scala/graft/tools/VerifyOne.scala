package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev harness: run a SUBSET of SparkEntry queries through the exact
  * Verify dump contract (parquet + oracle_sql.json restricted to the
  * subset), so `python3 tools/check.py <sfDir> <outDir>` gates just the
  * queries under iteration without a full 140+-query pass.
  * Usage: tools/run.sh graft.tools.VerifyOne <sfDir> <outDir> <name>…
  */
object VerifyOne {
  def main(args: Array[String]): Unit = {
    if (args.length < 3) {
      System.err.println("usage: graft.tools.VerifyOne <sfDir> <outDir> <name>…")
      sys.exit(2)
    }
    val sfDir = args(0); val outDir = args(1); val names = args.drop(2).toSet
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val missing = names -- graft.SparkEntry.queries.keySet
    require(missing.isEmpty, s"unknown queries: $missing")
    graft.SparkEntry.queries.filter(kv => names(kv._1)).foreach {
      case (name, fn) =>
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = graft.SparkEntry.oracleSql.filter(kv => names(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }
      .mkString("{", ", ", "}")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$outDir/oracle_sql.json"),
      json.getBytes("UTF-8"))
    spark.stop()
  }
}
