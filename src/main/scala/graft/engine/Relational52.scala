package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Seventy-first query wave: q346 sequential-pattern support (the
  * PrefixSpan-lite first pass: consecutive 3-event sequences ranked
  * by distinct-user support), q347 header↔detail reconciliation (does
  * the order header total agree with its lines — the fact-consistency
  * audit every warehouse runs), and q348 longest monotone daily
  * revenue streak per type (gaps-and-islands on the calendar frame).
  */
object Relational52 {

  /** q346 — SEQUENCE SUPPORT: the ten most-supported CONSECUTIVE
    * 3-event-type sequences, support = distinct users exhibiting the
    * sequence (not occurrence count — the association-mining
    * convention, so one hyperactive user can't fake a pattern). Per
    * user, events order by (ts, event_id); lead×2 forms the trigram;
    * distinct (user, trigram) then a support count.
    *
    * Scale: one user-keyed shuffle for the ordered windows; trigram
    * frame folds to |distinct trigram| ≤ |types|³ = 125 rows before
    * the top-k. */
  def q346SequenceSupport(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val byUser = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    Tables.events(spark, sfDir)
      .select($"user_id", $"ts", $"event_id", $"event_type")
      .withColumn("e2", lead($"event_type", 1).over(byUser))
      .withColumn("e3", lead($"event_type", 2).over(byUser))
      .filter($"e2".isNotNull && $"e3".isNotNull)
      .select($"user_id",
        concat_ws(">", $"event_type", $"e2", $"e3").as("seq"))
      .distinct()
      .groupBy($"seq")
      .agg(count(lit(1)).as("support"))
      .orderBy($"support".desc, $"seq")
      .limit(10)
  }

  def q346Sql: String =
    """WITH ordered AS (
         SELECT user_id, event_type,
           lead(event_type, 1) OVER (PARTITION BY user_id
             ORDER BY ts, event_id) AS e2,
           lead(event_type, 2) OVER (PARTITION BY user_id
             ORDER BY ts, event_id) AS e3
         FROM events),
       seqs AS (
         SELECT DISTINCT user_id,
           event_type || '>' || e2 || '>' || e3 AS seq
         FROM ordered WHERE e2 IS NOT NULL AND e3 IS NOT NULL)
       SELECT seq, CAST(count(*) AS BIGINT) AS support
       FROM seqs GROUP BY seq
       ORDER BY support DESC, seq LIMIT 10"""

  /** q347 — HEADER↔DETAIL RECONCILIATION: per order, the header
    * o_totalprice against the detail formula
    * Σ extendedprice·(1−discount)·(1+tax), both on the exact cent
    * grid (the detail term computes as epc·(100−dpc)·(100+tpc) in
    * 10⁻⁶-dollar units, then floors to cents via non-negative
    * integer division). The fixture's header is NOT guaranteed to
    * match the formula — the query's job is to SAY so: mismatches
    * bucket by relative deviation permille, the triage histogram a
    * reconciliation job emits.
    *
    * Scale: lineitem folds per orderkey (co-partitioned with the
    * header join), 5-row histogram out. */
  def q347Reconciliation(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val detail = Tables.lineitem(spark, sfDir)
      .select($"l_orderkey",
        (Exact.cents($"l_extendedprice") *
          (lit(100L) - Exact.cents($"l_discount")) *
          (lit(100L) + Exact.cents($"l_tax"))).as("micro"))
      .groupBy($"l_orderkey")
      .agg(expr("sum(micro) div 10000").as("detail_cents"))
    Tables.orders(spark, sfDir)
      .select($"o_orderkey", Exact.cents($"o_totalprice").as("header_cents"))
      .join(detail, $"o_orderkey" === $"l_orderkey", "left_outer")
      .select($"header_cents",
        coalesce($"detail_cents", lit(0L)).as("detail_cents"))
      .withColumn("dev_permille",
        expr("(1000 * abs(header_cents - detail_cents)) div " +
          "greatest(header_cents, 1)"))
      .withColumn("bucket",
        when($"dev_permille" === 0, "exact")
          .when($"dev_permille" <= 10, "within_1pct")
          .when($"dev_permille" <= 100, "within_10pct")
          .otherwise("divergent"))
      .groupBy($"bucket")
      .agg(count(lit(1)).as("n_orders"),
        sum($"header_cents").as("header_cents"),
        sum($"detail_cents").as("detail_cents"))
      .orderBy($"bucket")
  }

  def q347Sql: String =
    """WITH detail AS (
         SELECT l_orderkey,
           CAST(sum(
             CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) *
             (100 - CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT)) *
             (100 + CAST(CAST(l_tax AS DECIMAL(18,2)) * 100 AS BIGINT)))
             AS BIGINT) // 10000 AS detail_cents
         FROM lineitem GROUP BY 1),
       j AS (
         SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
           AS header_cents,
           coalesce(detail_cents, 0) AS detail_cents
         FROM orders LEFT JOIN detail ON o_orderkey = l_orderkey),
       dev AS (
         SELECT header_cents, detail_cents,
           (1000 * abs(header_cents - detail_cents))
             // greatest(header_cents, 1) AS dev_permille
         FROM j)
       SELECT CASE WHEN dev_permille = 0 THEN 'exact'
                   WHEN dev_permille <= 10 THEN 'within_1pct'
                   WHEN dev_permille <= 100 THEN 'within_10pct'
                   ELSE 'divergent' END AS bucket,
         CAST(count(*) AS BIGINT) AS n_orders,
         CAST(sum(header_cents) AS BIGINT) AS header_cents,
         CAST(sum(detail_cents) AS BIGINT) AS detail_cents
       FROM dev GROUP BY 1 ORDER BY bucket"""

  /** q348 — LONGEST MONOTONE STREAK: per event type, the longest run
    * of consecutive calendar days with strictly increasing daily
    * revenue — gaps-and-islands with a "break" prefix counter
    * (strictly-increasing AND day-adjacent continues a run; any break
    * increments the island id), then max island length. All on the
    * calendar-bounded day frame.
    *
    * Scale: the events fold to (type × day) first; both windows run
    * per type over that bounded frame. */
  def q348LongestStreak(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val day = Tables.events(spark, sfDir)
      .select($"event_type",
        expr("unix_micros(ts) div 86400000000").as("day"),
        Exact.cents($"value").as("c"))
      .groupBy($"event_type", $"day")
      .agg(sum($"c").as("rev"))
    val byType = Window.partitionBy($"event_type").orderBy($"day")
    val runs = day
      .withColumn("pd", lag($"day", 1).over(byType))
      .withColumn("pr", lag($"rev", 1).over(byType))
      .withColumn("brk",
        when($"pd".isNull || $"pd" =!= $"day" - 1 || $"pr" >= $"rev", 1L)
          .otherwise(0L))
      .withColumn("island", sum($"brk").over(
        byType.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    runs.groupBy($"event_type", $"island")
      .agg(count(lit(1)).as("len"), min($"day").as("start_day"))
      .withColumn("rk", row_number().over(
        Window.partitionBy($"event_type")
          .orderBy($"len".desc, $"start_day")))
      .filter($"rk" === 1)
      .select($"event_type", $"len".as("longest_streak_days"),
        $"start_day")
      .orderBy($"event_type")
  }

  def q348Sql: String =
    """WITH day AS (
         SELECT event_type, epoch_us(ts) // 86400000000 AS day,
           CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
             AS BIGINT) AS rev
         FROM events GROUP BY 1, 2),
       runs AS (
         SELECT event_type, day, rev,
           CASE WHEN lag(day, 1) OVER w IS NULL
                  OR lag(day, 1) OVER w <> day - 1
                  OR lag(rev, 1) OVER w >= rev THEN 1 ELSE 0 END AS brk
         FROM day
         WINDOW w AS (PARTITION BY event_type ORDER BY day)),
       islands AS (
         SELECT event_type, day,
           CAST(sum(brk) OVER (PARTITION BY event_type ORDER BY day
             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS island
         FROM runs),
       lens AS (
         SELECT event_type, island, CAST(count(*) AS BIGINT) AS len,
           min(day) AS start_day
         FROM islands GROUP BY 1, 2),
       ranked AS (
         SELECT event_type, len, start_day,
           row_number() OVER (PARTITION BY event_type
             ORDER BY len DESC, start_day) AS rk
         FROM lens)
       SELECT event_type, len AS longest_streak_days, start_day
       FROM ranked WHERE rk = 1 ORDER BY event_type"""
}
