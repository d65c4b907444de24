package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sixty-fourth query wave: grain alignment (day share of its week —
  * the percent-of-parent across TIME grains every BI layer needs) and
  * the A/B assignment audit (sticky hash bucketing + sample-ratio-
  * mismatch numerators).
  */
object Relational46 {

  /** q332 — GRAIN ALIGNMENT: daily event counts joined to their ISO
    * week's rollup, emitting each day's permille share of its week —
    * two aggregates of the SAME scan co-joined on the week key; no
    * window anywhere (the naive form is a partitioned window over the
    * day frame; the join form re-uses the day aggregate for the week
    * rollup and stays associative for IVM).
    *
    * Scale: the day frame is calendar×type bounded; the week rollup
    * re-aggregates it (not the raw events — the scan folds once). */
  def q332GrainAlignment(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val day = Tables.events(spark, sfDir)
      .select($"event_type",
        expr("unix_micros(ts) div 86400000000").as("day"))
      .groupBy($"event_type", $"day")
      .agg(count(lit(1)).as("n_day"))
      // epoch day 0 = Thursday; shift by 4 so weeks split Mon/Sun
      .withColumn("week", expr("(day + 4) div 7"))
    val week = day.groupBy($"event_type", $"week")
      .agg(sum($"n_day").as("n_week"))
    day.join(week, Seq("event_type", "week"))
      .select($"event_type", $"day", $"week", $"n_day", $"n_week",
        expr("(1000 * n_day) div n_week").as("share_permille"))
      .orderBy($"event_type", $"day")
  }

  def q332Sql: String =
    """WITH day AS (
         SELECT event_type, epoch_us(ts) // 86400000000 AS day,
           CAST(count(*) AS BIGINT) AS n_day
         FROM events GROUP BY 1, 2),
       wk AS (
         SELECT event_type, (day + 4) // 7 AS week, day, n_day FROM day),
       week AS (
         SELECT event_type, week, CAST(sum(n_day) AS BIGINT) AS n_week
         FROM wk GROUP BY 1, 2)
       SELECT wk.event_type, wk.day, wk.week, wk.n_day, week.n_week,
         (1000 * wk.n_day) // week.n_week AS share_permille
       FROM wk JOIN week USING (event_type, week)
       ORDER BY event_type, day"""

  /** q333 — A/B ASSIGNMENT AUDIT: users hash-bucketed 50/50 into
    * variants by md5 (sticky by construction — the audit proves it by
    * counting users whose EVENTS ever land in different variants:
    * must be zero), plus the sample-ratio-mismatch numerators — the
    * χ² statistic for a fair split is (nA−nB)²/(nA+nB), emitted as
    * exact integers. Per event type, catching a biased exposure path.
    *
    * Scale: one scan; variant is a projection of user_id; the rollup
    * is |types| rows. */
  def q333AbAudit(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val tagged = Tables.events(spark, sfDir)
      .select($"event_type", $"user_id",
        when(expr("substr(md5(CAST(user_id AS STRING)), 1, 1)") < "8", "A")
          .otherwise("B").as("variant"))
    val sticky = tagged.groupBy($"user_id")
      .agg(countDistinct($"variant").as("nv"))
      .agg(sum(when($"nv" > 1, 1L).otherwise(0L)).as("unsticky_users"))
    tagged.groupBy($"event_type")
      .agg(
        countDistinct(when($"variant" === "A", $"user_id")).as("users_a"),
        countDistinct(when($"variant" === "B", $"user_id")).as("users_b"))
      .crossJoin(broadcast(sticky))
      .select($"event_type", $"users_a", $"users_b",
        (($"users_a" - $"users_b") * ($"users_a" - $"users_b"))
          .as("srm_x2_num"),
        ($"users_a" + $"users_b").as("srm_x2_den"),
        $"unsticky_users")
      .orderBy($"event_type")
  }

  def q333Sql: String =
    """WITH tagged AS (
         SELECT event_type, user_id,
           CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 1) < '8'
                THEN 'A' ELSE 'B' END AS variant
         FROM events),
       sticky AS (
         SELECT CAST(sum(CASE WHEN nv > 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS unsticky_users
         FROM (SELECT user_id, count(DISTINCT variant) AS nv
               FROM tagged GROUP BY 1)),
       per_type AS (
         SELECT event_type,
           CAST(count(DISTINCT CASE WHEN variant = 'A' THEN user_id END)
             AS BIGINT) AS users_a,
           CAST(count(DISTINCT CASE WHEN variant = 'B' THEN user_id END)
             AS BIGINT) AS users_b
         FROM tagged GROUP BY 1)
       SELECT event_type, users_a, users_b,
         (users_a - users_b) * (users_a - users_b) AS srm_x2_num,
         users_a + users_b AS srm_x2_den,
         unsticky_users
       FROM per_type, sticky ORDER BY event_type"""
}
