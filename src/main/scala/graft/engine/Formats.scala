package graft.engine

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Serialization / source-format surface beyond parquet.
  *
  * Scale note: the round-trips here are correctness demonstrations; at
  * 100 TB the same writers run partitioned (`partitionBy`) with sized
  * output files (`spark.sql.files.maxRecordsPerFile`), and columnar
  * formats (parquet/ORC) are the only sane at-rest choice — CSV/JSON
  * exist for interchange edges (the reference's Kafka values are JSON,
  * S8/P1).
  */
object Formats {

  /** S8+P1 closed loop: encode each event to a Kafka-shaped JSON `value`
    * with to_json(struct(...)), parse it back with from_json, and verify
    * the fields survive — output is the parsed projection, oracle is the
    * plain projection (round-trip identity). */
  def q48JsonRoundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("event_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType)))
    Tables.events(spark, sfDir)
      .select(to_json(struct($"event_id", $"event_type", $"value")).as("payload"))
      .select(from_json($"payload", schema).as("p"))
      .select($"p.event_id".as("event_id"), $"p.event_type".as("event_type"),
        $"p.value".as("value"))
      .orderBy($"event_id")
  }

  def q48Sql: String =
    """SELECT event_id, event_type, value FROM events ORDER BY event_id"""

  /** Multi-format sink/source: write an events projection as ORC, CSV,
    * and JSON-lines, read each back, and count — one row per format, all
    * equal to the source count. Exercises the non-parquet readers/writers
    * end-to-end (schemas carried explicitly for the text formats). A
    * deterministic 5% slice keeps the triple write/read proportional to a
    * format check, not a full re-ingest — writer coverage is identical. */
  def q49FormatsRoundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val base = Tables.events(spark, sfDir)
      .filter($"event_id" % 20 === 0)
      .select($"event_id", $"user_id", $"event_type", $"value")
    val dir = Files.createTempDirectory("graft-formats-").toString
    base.write.mode("overwrite").orc(s"$dir/orc")
    base.write.mode("overwrite").option("header", "true").csv(s"$dir/csv")
    base.write.mode("overwrite").json(s"$dir/json")
    val counts = Seq(
      "csv" -> spark.read.option("header", "true").schema(base.schema).csv(s"$dir/csv").count(),
      "json" -> spark.read.schema(base.schema).json(s"$dir/json").count(),
      "orc" -> spark.read.orc(s"$dir/orc").count())
    // the counts above already forced the reads; the scratch dir can go
    TempIo.deleteRecursively(dir)
    counts.toDF("format", "counts").orderBy($"format")
  }

  def q49Sql: String =
    """SELECT f.format,
       (SELECT count(*) FROM events WHERE event_id % 20 = 0) AS counts
       FROM (VALUES ('csv'), ('json'), ('orc')) f(format)
       ORDER BY f.format"""

  /** Hidden `_metadata` file columns — per-file lineage audit (rows,
    * event_id extents, non-zero size) straight from the scan, the
    * provenance surface a corpus snapshot needs to map every row back
    * to its source file without a path-parsing UDF or a second listing
    * job. The reference hand-builds partition paths and globs them back
    * (consumer.scala:92-107); `_metadata.file_name` is the engine-native
    * inverse. The oracle pins the expected lineage (single-file tables
    * here, so the name is a constant and size positivity is a literal
    * `true`); at scale the same query audits thousands of files per
    * partition with file-level pruning intact.
    *
    * Scale: metadata columns are populated by the reader per split —
    * no extra I/O, no shuffle beyond the audit's own aggregate. */
  def q129FileMetadata(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, sfDir)
      .select(col("_metadata.file_name").as("file_name"),
        col("_metadata.file_size").as("fsize"),
        $"event_id")
      .groupBy($"file_name")
      .agg(count(lit(1)).as("counts"),
        min($"event_id").as("min_id"), max($"event_id").as("max_id"),
        (min($"fsize") > 0L).as("nonzero_size"))
      .orderBy($"file_name")
  }

  def q129Sql: String =
    """SELECT 'events.parquet' AS file_name, count(*) AS counts,
       min(event_id) AS min_id, max(event_id) AS max_id,
       true AS nonzero_size
       FROM events GROUP BY 1 ORDER BY file_name"""
}
