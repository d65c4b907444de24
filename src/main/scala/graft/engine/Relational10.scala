package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sixteenth query wave: the join/maintenance shapes that remain after
  * Relational9 — a pure-inequality (theta) join made shuffle-joinable,
  * full MERGE INTO upsert semantics, and a sliding-window distinct
  * count — each one an operation a warehouse cannot express as a plain
  * equi-join + aggregate without the specific plan discipline shown
  * here.
  */
object Relational10 {

  /** Band width (cents) and the shift that keeps bucket arithmetic on
    * non-negative integers (acctbal ≥ −999.99 ⇒ cents ≥ −99 999). */
  val BandCents = 1000L
  private val BandShift = 100000L

  /** q147 — banded theta join: customers matched to suppliers with
    * |c_acctbal − s_acctbal| ≤ $10, a predicate with NO equi key.
    *
    * The naive plan is a cartesian product (BroadcastNestedLoopJoin) —
    * quadratic and a non-starter at 100 TB. The band trick restores an
    * equi key: bucket each side by floor(cents / W) with W equal to the
    * band width, replicate the LEFT side to its bucket ± 1 (|a−b| ≤ W
    * bounds the bucket distance by 1), equi-join on the bucket, and
    * re-check the exact predicate in-join. Each qualifying pair meets
    * in EXACTLY one bucket (the right side exists at one bucket; the
    * left's three replicas are distinct), so no post-join dedup is
    * needed. Cost: 3× replication of one side + one hash shuffle —
    * linear, AQE-skew-splittable, and the generic recipe for any
    * proximity theta join (time bands, geo tiles, price corridors).
    *
    * All arithmetic is integer cents on the shared decimal grid
    * ([[Exact.cents]]); the shift to non-negative buckets sidesteps the
    * Spark-div-vs-DuckDB-floor divergence on negatives. */
  def q147BandJoin(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val cust = Tables.customer(spark, sfDir)
      .select($"c_nationkey", $"c_custkey",
        Exact.cents($"c_acctbal").as("cc"))
      .withColumn("cb", expr(s"(cc + $BandShift) div $BandCents"))
    val supp = Tables.supplier(spark, sfDir)
      .select($"s_suppkey", Exact.cents($"s_acctbal").as("sc"))
      .withColumn("b", expr(s"(sc + $BandShift) div $BandCents"))
    cust
      .select($"c_nationkey", $"c_custkey", $"cc",
        explode(array($"cb" - 1, $"cb", $"cb" + 1)).as("b"))
      .join(supp, "b")
      .filter(abs($"cc" - $"sc") <= BandCents)
      .groupBy($"c_nationkey".as("nation"))
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct($"s_suppkey").as("n_sup"),
        countDistinct($"c_custkey").as("n_cust"))
      .orderBy($"nation")
  }

  def q147Sql: String =
    """SELECT c_nationkey AS nation,
         CAST(count(*) AS BIGINT) AS n_pairs,
         CAST(count(DISTINCT s_suppkey) AS BIGINT) AS n_sup,
         CAST(count(DISTINCT c_custkey) AS BIGINT) AS n_cust
       FROM customer c JOIN supplier s
         ON abs(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
              - CAST(CAST(s_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)) <= 1000
       GROUP BY 1 ORDER BY nation"""

  /** q148 — MERGE INTO semantics (the Delta/Iceberg upsert verb) from
    * plain Spark: base state ⊕ change set with INSERT / UPDATE / DELETE
    * arms, via one full-outer join.
    *
    * Base = each user's latest event value in the first half of the log
    * (by event_id — the log's total order); changes = the second half,
    * reduced to one action per user: DELETE if the user's last event is
    * an 'error' (account closed), else UPSERT to the latest value.
    * Full-outer join on user_id, one CASE per arm:
    * matched+delete → drop, matched+upsert → update, unmatched change →
    * insert, unmatched base → keep. The audit action column makes the
    * row's provenance part of the oracle-checked contract.
    *
    * Scale posture: both sides reduce to |users| rows BEFORE the join
    * (max_by aggregation with map-side partial combine — the log itself
    * is never shuffled twice), and the join shuffles the key space, not
    * the log. This is exactly the merge a lakehouse runs per batch; the
    * reduction-first discipline is what keeps it O(|keys|) not O(|log|). */
  def q148MergeUpsert(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, sfDir)
      .select($"event_id", $"user_id", $"event_type",
        Exact.cents($"value").as("cents"))
    val mid = ev.agg(expr("max(event_id) div 2").as("m"))
    val withHalf = ev.crossJoin(broadcast(mid))
    val base = withHalf.filter($"event_id" <= $"m")
      .groupBy($"user_id")
      .agg(max_by($"cents", $"event_id").as("base_cents"))
    val delta = withHalf.filter($"event_id" > $"m")
      .groupBy($"user_id")
      .agg(max_by($"cents", $"event_id").as("new_cents"),
        (max_by($"event_type", $"event_id") === "error").as("is_delete"))
    // deleted keys stay visible with NULL state — the row a CDC
    // downstream would consume as a tombstone
    base.join(delta, Seq("user_id"), "full_outer")
      .select($"user_id",
        when($"is_delete".isNull, lit("keep"))
          .when($"is_delete" && $"base_cents".isNotNull, lit("delete"))
          .when($"is_delete", lit("noop_delete"))
          .when($"base_cents".isNull, lit("insert"))
          .otherwise(lit("update")).as("action"),
        when($"is_delete".isNull, $"base_cents")
          .when($"is_delete", lit(null).cast("long"))
          .otherwise($"new_cents").as("cents"))
      .orderBy($"user_id", $"action")
  }

  def q148Sql: String =
    """WITH ev AS (
         SELECT event_id, user_id, event_type,
           CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
         FROM events),
       mid AS (SELECT max(event_id) // 2 AS m FROM ev),
       base AS (
         SELECT user_id, max_by(cents, event_id) AS base_cents
         FROM ev, mid WHERE event_id <= m GROUP BY user_id),
       delta AS (
         SELECT user_id, max_by(cents, event_id) AS new_cents,
           max_by(event_type, event_id) = 'error' AS is_delete
         FROM ev, mid WHERE event_id > m GROUP BY user_id),
       merged AS (
         SELECT coalesce(b.user_id, d.user_id) AS user_id,
           CASE WHEN d.user_id IS NULL THEN 'keep'
                WHEN d.is_delete AND b.user_id IS NOT NULL THEN 'delete'
                WHEN d.is_delete THEN 'noop_delete'
                WHEN b.user_id IS NULL THEN 'insert'
                ELSE 'update' END AS action,
           CASE WHEN d.user_id IS NULL THEN b.base_cents
                WHEN d.is_delete THEN NULL
                ELSE d.new_cents END AS cents
         FROM base b FULL OUTER JOIN delta d USING (user_id))
       SELECT user_id, action,
         CASE WHEN action IN ('delete', 'noop_delete') THEN NULL
              ELSE cents END AS cents
       FROM merged ORDER BY user_id, action"""

  private val HourUs = 3600000000L

  /** q149 — sliding-window distinct count: distinct users per event
    * type over the TRAILING 24 hours, one row per (type, hour) the
    * window is non-empty.
    *
    * `count(DISTINCT …) OVER (RANGE …)` does not exist in Spark (or
    * most engines) because distinct state cannot slide; the scalable
    * rewrite is: dedupe to (type, user, hour) presence rows FIRST (one
    * map-side-combinable aggregation that collapses the log), then
    * fan each presence row out to the ≤24 target hours it can serve
    * (bounded explode — interval arithmetic, no self-join of the raw
    * log), then count DISTINCT users per (type, target hour). The
    * explode factor is the window length in grain units — fixed — so
    * cost is O(|presence| · 24), independent of event volume per hour;
    * the naive hour×hour range self-join is O(|hours|²) state and the
    * raw-log window sort is O(|log| log |log|) per key.
    *
    * Hours are integral epoch-hour buckets (μs floor-div — the q64
    * recipe); target hours clamp to the data's max hour so the output
    * never projects past the corpus. */
  def q149SlidingDistinct(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val pres = Tables.events(spark, sfDir)
      .select($"event_type", $"user_id",
        expr(s"unix_micros(ts) div $HourUs").as("h"))
      .distinct()
    val hmax = pres.agg(max($"h").as("hmax"))
    pres.crossJoin(broadcast(hmax))
      .select($"event_type", $"user_id",
        explode(sequence($"h", least($"h" + 23, $"hmax"))).as("th"))
      .groupBy($"event_type", $"th")
      .agg(countDistinct($"user_id").as("n_users"))
      .orderBy($"event_type", $"th")
  }

  def q149Sql: String =
    """WITH pres AS (
         SELECT DISTINCT event_type, user_id,
           epoch_us(ts) // 3600000000 AS h
         FROM events),
       hmax AS (SELECT max(h) AS hm FROM pres),
       expanded AS (
         SELECT event_type, user_id, h + x AS th
         FROM pres, hmax,
           (SELECT unnest(range(0, 24)) AS x)
         WHERE h + x <= hm)
       SELECT event_type, th,
         CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
       FROM expanded GROUP BY 1, 2 ORDER BY event_type, th"""
}
