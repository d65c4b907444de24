package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table access layer for the driver-generated parquet tables
  * (`/root/repo/TESTDATA.md`). Schemas come from the parquet footers —
  * explicit `StructType`s would duplicate what the files already declare,
  * and footer reads are one driver round-trip per table.
  *
  * Scale posture: every reader returns the raw scan; queries are expected
  * to `select`/`filter` immediately so Catalyst pushes projection and
  * predicates into the parquet reader (check `PushedFilters`/`ReadSchema`
  * in `.explain("formatted")`). At 100 TB these tables would be
  * Hive-partitioned directories; `spark.read.parquet(root)` + `.where` on
  * partition columns keeps partition pruning optimizer-visible (vs. the
  * reference's hand-built partition path globs,
  * spark-app/src/main/scala/streamingConsumer/consumer.scala:92-107).
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** events.parquet stamps `ts` as parquet TIMESTAMP(NANOS), which
    * Spark's vectorized reader rejects without this flag. It is an
    * INTENTIONAL session-wide invariant, not a per-query toggle: every
    * events read (batch or streaming) requires it, it is idempotent,
    * and it only affects TIMESTAMP(NANOS) footers — which no other
    * table in this corpus carries. Every reader that touches
    * events.parquet outside [[events]] calls this instead of setting
    * the conf ad hoc, so there is exactly one owner of the flag. */
  def ensureNanosAsLong(spark: SparkSession): Unit =
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

  def region(spark: SparkSession, sfDir: String): DataFrame     = table(spark, sfDir, "region")
  def nation(spark: SparkSession, sfDir: String): DataFrame     = table(spark, sfDir, "nation")
  def customer(spark: SparkSession, sfDir: String): DataFrame   = table(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame   = table(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame       = table(spark, sfDir, "part")
  def orders(spark: SparkSession, sfDir: String): DataFrame     = table(spark, sfDir, "orders")
  def lineitem(spark: SparkSession, sfDir: String): DataFrame   = table(spark, sfDir, "lineitem")
  /** events.parquet stamps `ts` as parquet TIMESTAMP(NANOS), which Spark's
    * vectorized reader rejects. The data is μs-aligned (verified: all
    * epoch_ns % 1000 == 0 at every SF), so read nanos as long and convert
    * losslessly to a TimestampType at μs precision. */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    ensureNanosAsLong(spark)
    table(spark, sfDir, "events")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents(spark: SparkSession, sfDir: String): DataFrame  = table(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "embeddings")
}
