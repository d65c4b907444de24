package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Twenty-second query wave (batch side): the typed cogroup API
  * surface, the gaps-and-islands pattern, and time-weighted averaging —
  * plus see Streaming.q174 for this wave's streaming member.
  */
object Relational15 {

  /** q175 — typed cogroup reconciliation: events keyed by user_id
    * cogrouped with orders keyed by o_custkey (the two ledgers sharing
    * one key domain), each key emitting its per-side row counts, rolled
    * up into a presence-matrix audit (both sides / events only /
    * orders only). This exercises `KeyValueGroupedDataset.cogroup` —
    * the typed escape hatch for per-key logic that cannot be expressed
    * relationally (custom sequence alignment, per-key state machines).
    * THIS reconciliation deliberately CAN be (the oracle is a full-
    * outer join of two aggregates), which is what makes the API
    * demonstration oracle-checkable; the plan is the same
    * shuffle-both-sides-by-key a relational full-outer uses, so the
    * cost model carries over. Scale: both sides reduce map-side only
    * if pre-aggregated — cogroup itself ships raw rows, so production
    * pre-counts per key BEFORE cogrouping when only counts are needed
    * (here the sides are (key, id) pairs to keep the iterator path
    * honest). */
  def q175CogroupReconcile(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, sfDir)
      .select($"user_id", $"event_id").as[(Long, Long)]
      .groupByKey(_._1)
    val ord = Tables.orders(spark, sfDir)
      .select($"o_custkey", $"o_orderkey").as[(Long, Long)]
      .groupByKey(_._1)
    val perKey = ev.cogroup(ord) { (k, evs, ords) =>
      Iterator((k, evs.size.toLong, ords.size.toLong))
    }.toDF("k", "n_events", "n_orders")
    perKey
      .withColumn("presence",
        when($"n_events" > 0 && $"n_orders" > 0, "both")
          .when($"n_events" > 0, "events_only")
          .otherwise("orders_only"))
      .groupBy($"presence")
      .agg(count(lit(1)).as("n_keys"),
        sum($"n_events").as("n_events"), sum($"n_orders").as("n_orders"))
      .orderBy($"presence")
  }

  def q175Sql: String =
    """WITH e AS (
         SELECT user_id AS k, CAST(count(*) AS BIGINT) AS n_events
         FROM events GROUP BY 1),
       o AS (
         SELECT o_custkey AS k, CAST(count(*) AS BIGINT) AS n_orders
         FROM orders GROUP BY 1),
       j AS (
         SELECT coalesce(e.k, o.k) AS k,
           coalesce(n_events, 0) AS n_events,
           coalesce(n_orders, 0) AS n_orders
         FROM e FULL OUTER JOIN o ON e.k = o.k),
       p AS (
         SELECT CASE WHEN n_events > 0 AND n_orders > 0 THEN 'both'
                     WHEN n_events > 0 THEN 'events_only'
                     ELSE 'orders_only' END AS presence,
           n_events, n_orders
         FROM j)
       SELECT presence, CAST(count(*) AS BIGINT) AS n_keys,
         CAST(sum(n_events) AS BIGINT) AS n_events,
         CAST(sum(n_orders) AS BIGINT) AS n_orders
       FROM p GROUP BY 1 ORDER BY presence"""

  /** q176 — gaps and islands: maximal runs of CONSECUTIVE event_ids per
    * event type (the classic sequence-reconstruction pattern: after a
    * type filter, which stretches of the log are unbroken?). The
    * run/island key is `event_id − row_number()` — constant within a
    * consecutive run, strictly changing across a gap — so islands fall
    * out of one partitioned window plus one aggregate; no self-join,
    * no recursion. Per type: island count, longest island, singleton
    * count, covered-id span. Used for ingest-completeness audits
    * (missing-id gaps = lost deliveries) on the same partitioning as
    * every per-key window. */
  def q176Islands(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"event_type").orderBy($"event_id")
    Tables.events(spark, sfDir)
      .select($"event_type", $"event_id")
      .withColumn("grp", $"event_id" - row_number().over(w))
      .groupBy($"event_type", $"grp")
      .agg(count(lit(1)).as("len"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_islands"),
        max($"len").as("max_len"),
        sum(when($"len" === 1, 1L).otherwise(0L)).as("n_singletons"),
        sum($"len").as("n_ids"))
      .orderBy($"event_type")
  }

  def q176Sql: String =
    """WITH isl AS (
         SELECT event_type,
           event_id - row_number() OVER (PARTITION BY event_type
             ORDER BY event_id) AS grp
         FROM events),
       runs AS (
         SELECT event_type, grp, CAST(count(*) AS BIGINT) AS len
         FROM isl GROUP BY 1, 2)
       SELECT event_type, CAST(count(*) AS BIGINT) AS n_islands,
         CAST(max(len) AS BIGINT) AS max_len,
         CAST(sum(CASE WHEN len = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_singletons,
         CAST(sum(len) AS BIGINT) AS n_ids
       FROM runs GROUP BY 1 ORDER BY event_type"""

  /** One day in microseconds. */
  private val DayUs = 86400000000L

  /** q177 — time-weighted average (TWAP): each event's value HOLDS
    * until the type's next event that day (step-function gauge
    * semantics — the honest mean for irregularly sampled series, where
    * q163's EWMA weights by observation count); the last observation
    * extends to midnight. TWAP = Σ(cents·held_ms) / Σ(held_ms): both
    * sums are exact int64 on one lead() window over the (type, day)
    * partitioning, the quotient ONE double division — bit-identical
    * cross-engine with no ordered fold needed (contrast q163: the
    * holding-time weights make the sum order-free). Scale: one shuffle
    * on the (type, day) key, partial aggregation map-side; day
    * boundaries bound every window frame. */
  def q177Twap(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"event_type", $"day")
      .orderBy($"ts", $"event_id")
    Tables.events(spark, sfDir)
      .select($"event_type", $"ts", $"event_id",
        date_format($"ts", "yyyy-MM-dd").as("day"),
        Exact.cents($"value").as("cents"))
      .withColumn("end_us",
        coalesce(unix_micros(lead($"ts", 1).over(w)),
          unix_micros(date_trunc("day", $"ts")) + DayUs))
      .withColumn("held_ms",
        expr("(end_us - unix_micros(ts)) div 1000"))
      .groupBy($"day", $"event_type")
      .agg(count(lit(1)).as("n"),
        sum($"held_ms").as("held_ms"),
        round(sum($"cents" * $"held_ms").cast("double")
          / sum($"held_ms").cast("double"), 6).as("twap_cents"))
      .orderBy($"day", $"event_type")
  }

  def q177Sql: String =
    """WITH s AS (
         SELECT event_type, ts,
           strftime(ts, '%Y-%m-%d') AS day,
           CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
           (coalesce(
              epoch_us(lead(ts, 1) OVER (PARTITION BY event_type,
                strftime(ts, '%Y-%m-%d') ORDER BY ts, event_id)),
              epoch_us(date_trunc('day', ts)) + 86400000000)
            - epoch_us(ts)) // 1000 AS held_ms
         FROM events)
       SELECT day, event_type, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(held_ms) AS BIGINT) AS held_ms,
         round(CAST(sum(cents * held_ms) AS DOUBLE)
           / CAST(sum(held_ms) AS DOUBLE), 6) AS twap_cents
       FROM s GROUP BY 1, 2 ORDER BY day, event_type"""
}
