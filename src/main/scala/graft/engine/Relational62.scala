package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Eighty-first query wave, batch half: q375 runs a grouped aggregate
  * THROUGH the custom `graftsink` DataSourceV2 connector with
  * AGGREGATE PUSHDOWN — count/min/max partials fold inside the
  * connector's readers, one row per (file, group), and Spark's final
  * aggregate only merges partials.
  */
object Relational62 {

  /** q375 — DSV2 AGGREGATE PUSHDOWN ROUNDTRIP: event facts are staged
    * into a `graftsink` table, then re-aggregated per event_type —
    * count(*), count(user_id), min/max of the value cents — through
    * [[graft.sources.GraftScanBuilder]]'s
    * `SupportsPushDownAggregates`. The connector accepts the
    * aggregation (partial mode), so each part file is folded
    * EXECUTOR-SIDE to one row per group before anything enters the
    * Spark plan; the plan's only aggregate is the final merge (SUM of
    * count partials, MIN of mins, MAX of maxes). GraftSinkSpec
    * plan-asserts the scan swaps to GraftAggScan and that the rows
    * reaching Spark collapse from row-scale to group-scale; the
    * oracle proves end-to-end equivalence against the raw table.
    *
    * Scale: this is THE connector contract that matters at 100 TB —
    * a grouped count/min/max over an external table moves one row per
    * (file, group) over the wire instead of every stored row. */
  def q375GraftsourceAggPushdown(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val out = TempIo.createTempDir("graft-dsv2a-")
    try {
      Tables.events(spark, sfDir)
        .select($"event_type".as("etype"), $"user_id".as("uid"),
          Exact.cents($"value").as("cents"))
        .write.format("graftsink").mode("append")
        .option("path", out).save()
      TempIo.materialize(spark,
        spark.read.format("graftsink").load(out)
          .groupBy($"etype")
          .agg(count(lit(1)).as("n_events"),
            count($"uid").as("n_users_nonnull"),
            min($"cents").as("min_cents"),
            max($"cents").as("max_cents"))
          .orderBy($"etype"))
    } finally {
      TempIo.deleteRecursively(out)
    }
  }

  def q375Sql: String =
    """SELECT event_type AS etype,
         CAST(count(*) AS BIGINT) AS n_events,
         CAST(count(user_id) AS BIGINT) AS n_users_nonnull,
         min(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
           AS min_cents,
         max(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
           AS max_cents
       FROM events GROUP BY 1 ORDER BY etype"""
}
