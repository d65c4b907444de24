package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

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

  /** Legacy-compat flag for TIMESTAMP(NANOS) fixtures (rounds 1–5
    * shipped events.ts that way; Spark's vectorized reader rejects
    * NANOS footers without it). Kept session-wide because it is
    * idempotent and a NO-OP for every other footer type — the round-6+
    * TIMESTAMP_NTZ(μs) fixtures are unaffected. The ACTUAL encoding
    * decision lives in [[normalizeTs]], which branches on the loaded
    * type; this flag only keeps the legacy encoding loadable at all. */
  def ensureNanosAsLong(spark: SparkSession): Unit =
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

  def region(spark: SparkSession, sfDir: String): DataFrame     = table(spark, sfDir, "region")
  def nation(spark: SparkSession, sfDir: String): DataFrame     = table(spark, sfDir, "nation")
  def customer(spark: SparkSession, sfDir: String): DataFrame   = table(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame   = table(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame       = table(spark, sfDir, "part")
  def orders(spark: SparkSession, sfDir: String): DataFrame     = table(spark, sfDir, "orders")
  def lineitem(spark: SparkSession, sfDir: String): DataFrame   = table(spark, sfDir, "lineitem")
  /** Normalize an events frame's `ts` column to session-zoned
    * `TimestampType`, whatever physical encoding the fixture carries.
    * The driver has shipped events.parquet as TIMESTAMP(NANOS)
    * (rounds 1–5; Spark loads it as long under nanosAsLong — data was
    * verified μs-aligned, so `div 1000` is lossless) and as
    * TIMESTAMP(isAdjustedToUTC=false, MICROS) (round 6+; Spark loads
    * it as TimestampNTZType). A 100 TB engine cannot hard-code one
    * producer's physical type, so branch on the LOADED type instead of
    * assuming it; the session timezone is forced to UTC at startup, so
    * the NTZ→TZ cast is a pure re-tag, not a wall-clock shift.
    * Idempotent: TimestampType passes through untouched. */
  def normalizeTs(df: DataFrame): DataFrame = df.schema("ts").dataType match {
    case LongType       => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
    case TimestampType  => df
    case other => throw new IllegalStateException(
      s"events.ts has unsupported physical type $other — " +
        "expected TIMESTAMP(NANOS) (long under nanosAsLong), TIMESTAMP_NTZ, or TIMESTAMP; " +
        "the fixture contract drifted (see Tables.assertFixtureContract)")
  }

  def events(spark: SparkSession, sfDir: String): DataFrame = {
    ensureNanosAsLong(spark)
    normalizeTs(table(spark, sfDir, "events"))
  }
  def documents(spark: SparkSession, sfDir: String): DataFrame  = table(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "embeddings")

  /** Fixture-contract canary. Round 6 lost 113 queries to a silent
    * physical-encoding change in events.parquet; this turns the next
    * drift into ONE loud, named failure at session start instead of a
    * hundred mysterious ones downstream. Checks, per table: the column
    * set (names), and for `events.ts` that the loaded type is one of
    * the encodings [[normalizeTs]] supports. Logical-type drift in
    * other columns (e.g. int64→int32 keys) is also reported. Cheap:
    * footer reads only, no data scan. */
  def assertFixtureContract(spark: SparkSession, sfDir: String): Unit = {
    ensureNanosAsLong(spark)
    val expected: Map[String, Seq[String]] = Map(
      "region"   -> Seq("r_regionkey", "r_name"),
      "nation"   -> Seq("n_nationkey", "n_name", "n_regionkey"),
      "customer" -> Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal",
        "c_mktsegment"),
      "supplier" -> Seq("s_suppkey", "s_name", "s_nationkey", "s_acctbal"),
      "part"     -> Seq("p_partkey", "p_name", "p_brand", "p_type", "p_size",
        "p_retailprice"),
      "orders"   -> Seq("o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "o_orderdate", "o_orderpriority"),
      "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate"),
      "events"   -> Seq("event_id", "ts", "user_id", "event_type", "value", "props"),
      "documents"  -> Seq("doc_id", "text", "lang", "source", "n_chars"),
      "embeddings" -> Seq("vec_id", "embedding", "label"))
    val problems = expected.toSeq.sortBy(_._1).flatMap { case (name, cols) =>
      try {
        val schema = table(spark, sfDir, name).schema
        val missing = cols.filterNot(schema.fieldNames.contains)
        val extra = schema.fieldNames.filterNot(cols.contains)
        val colDiff =
          if (missing.isEmpty && extra.isEmpty) Nil
          else Seq(s"$name: column drift — missing=${missing.mkString(",")} " +
            s"unexpected=${extra.mkString(",")}")
        val tsDiff =
          if (name != "events" || !schema.fieldNames.contains("ts")) Nil
          else schema("ts").dataType match {
            case LongType | TimestampNTZType | TimestampType => Nil
            case other => Seq(s"events.ts: unsupported physical type $other " +
              "(supported: TIMESTAMP(NANOS) as long, TIMESTAMP_NTZ, TIMESTAMP)")
          }
        colDiff ++ tsDiff
      } catch {
        case e: Exception => Seq(s"$name: unreadable — ${e.getMessage}")
      }
    }
    if (problems.nonEmpty) throw new IllegalStateException(
      "FIXTURE CONTRACT DRIFT at " + sfDir + " — the driver regenerated " +
        "testdata with a different physical schema. Fix the readers " +
        "(Tables.normalizeTs and friends), do NOT chase per-query errors:\n  " +
        problems.mkString("\n  "))
  }
}
