package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Forty-sixth query wave: the TPC-H Q8 market-share shape (q285),
  * integer-exact linear revenue attribution (q286), and a seasonal
  * hour-of-day decomposition with residual dispersion (q287).
  *
  * House rules throughout: cents-grid money, integer division with
  * explicit remainder assignment (attribution must CONSERVE revenue to
  * the cent), shares as one double division of exact integer sums.
  */
object Relational33 {

  /** q285 — the TPC-H Q8 "national market share" shape: within each
    * order-year, the share of high-value order revenue contributed by
    * customers of one focal nation group, computed as a conditional
    * sum over the same aggregate (sum(CASE)/sum — never a self-join).
    * Revenue stays on the cents grid; the share is one double
    * division of two exact sums per year.
    *
    * Scale: one orders↔customer equi join (customer side is the
    * smaller table — AQE broadcasts it at these SFs and bucket-joins
    * at cluster scale) feeding a |years|-row aggregate. */
  def q285MarketShare(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val focal = Seq(1, 5, 9)
    val ord = Tables.orders(spark, sfDir)
      .filter($"o_totalprice" > 100000.0)
      .select($"o_custkey", year(to_date($"o_orderdate")).as("yr"),
        Exact.cents($"o_totalprice").as("cents"))
    val cust = Tables.customer(spark, sfDir)
      .select($"c_custkey", $"c_nationkey")
    ord.join(cust, $"o_custkey" === $"c_custkey")
      .groupBy($"yr")
      .agg(
        sum(when($"c_nationkey".isin(focal: _*), $"cents").otherwise(0L))
          .as("focal_cents"),
        sum($"cents").as("total_cents"))
      .select($"yr".cast("long").as("yr"), $"focal_cents", $"total_cents",
        round($"focal_cents".cast("double") / $"total_cents".cast("double"), 6)
          .as("mkt_share"))
      .orderBy($"yr")
  }

  def q285Sql: String =
    """WITH j AS (
         SELECT CAST(year(CAST(o_orderdate AS DATE)) AS BIGINT) AS yr,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
           c_nationkey
         FROM orders JOIN customer ON o_custkey = c_custkey
         WHERE o_totalprice > 100000)
       SELECT yr,
         CAST(sum(CASE WHEN c_nationkey IN (1, 5, 9) THEN cents ELSE 0 END)
           AS BIGINT) AS focal_cents,
         CAST(sum(cents) AS BIGINT) AS total_cents,
         round(CAST(sum(CASE WHEN c_nationkey IN (1, 5, 9) THEN cents ELSE 0 END)
             AS DOUBLE) / CAST(sum(cents) AS DOUBLE), 6) AS mkt_share
       FROM j GROUP BY yr ORDER BY yr"""

  /** q286 attribution lookback window. */
  val AttribWindowUs: Long = 7L * 86400000000L

  /** q286 — LINEAR REVENUE ATTRIBUTION, integer-exact: each purchase's
    * cents are split equally across the user's 'view' touches in the
    * preceding 7 days; integer division can't split a cent, so the
    * REMAINDER goes to the purchase row itself (house rule: attributed
    * revenue must CONSERVE the original to the cent — float shares
    * would leak ulps). Purchases with zero touches keep everything.
    * Output: per touch-count bucket, how many purchases and how the
    * money divides between touches and remainder — the attribution
    * table a marketing mix model consumes.
    *
    * Scale: one per-user-partitioned RANGE window counts touches (no
    * self-join — the window IS the interval join here, since only the
    * count is needed, not the touch identities); the rollup is
    * |buckets|-sized. */
  def q286LinearAttribution(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, sfDir)
      .select($"user_id", $"event_type", unix_micros($"ts").as("tus"),
        Exact.cents($"value").as("cents"))
      .filter($"event_type".isin("purchase", "view"))
    val touchWin = Window.partitionBy($"user_id").orderBy($"tus")
      .rangeBetween(-AttribWindowUs, -1)
    ev
      .withColumn("touches",
        count(when($"event_type" === "view", 1)).over(touchWin))
      .filter($"event_type" === "purchase")
      .withColumn("per_touch",
        when($"touches" > 0, expr("cents div touches")).otherwise(0L))
      .withColumn("to_touches", $"per_touch" * $"touches")
      .withColumn("kept", $"cents" - $"to_touches")
      .groupBy($"touches")
      .agg(count(lit(1)).as("n_purchases"),
        sum($"cents").as("revenue_cents"),
        sum($"to_touches").as("attributed_cents"),
        sum($"kept").as("kept_cents"))
      .orderBy($"touches")
  }

  def q286Sql: String =
    s"""WITH ev AS (
         SELECT user_id, event_type, epoch_us(ts) AS tus,
           CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
         FROM events WHERE event_type IN ('purchase', 'view')),
       t AS (
         SELECT user_id, event_type, cents,
           count(*) FILTER (WHERE event_type = 'view') OVER (
             PARTITION BY user_id ORDER BY tus
             RANGE BETWEEN $AttribWindowUs PRECEDING AND 1 PRECEDING)
             AS touches
         FROM ev),
       p AS (
         SELECT touches, cents,
           CASE WHEN touches > 0 THEN cents // touches ELSE 0 END AS per_touch
         FROM t WHERE event_type = 'purchase')
       SELECT CAST(touches AS BIGINT) AS touches,
         CAST(count(*) AS BIGINT) AS n_purchases,
         CAST(sum(cents) AS BIGINT) AS revenue_cents,
         CAST(sum(per_touch * touches) AS BIGINT) AS attributed_cents,
         CAST(sum(cents - per_touch * touches) AS BIGINT) AS kept_cents
       FROM p GROUP BY touches ORDER BY touches"""

  /** q287 — SEASONAL PROFILE DECOMPOSITION: split each event type's
    * value series into an hour-of-day seasonal mean and a residual,
    * reporting per (type, hour-of-day) the seasonal level and the
    * residual mean absolute deviation — the day-shape fingerprint
    * capacity planning and anomaly baselines read. All level
    * arithmetic is exact integer (sums of cents, counts); the two
    * published ratios are single double divisions, and the residual
    * |x − mean| is formed from cross-multiplied integers
    * (|cents·n − sum| with ONE division at the end) so no per-row
    * float mean ever accumulates.
    *
    * Scale: two combinable aggregates over the same (type, hod)
    * grouping — the second pass consumes the first through a
    * broadcast (24·|types| rows), never a re-shuffle of the log. */
  def q287SeasonalProfile(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, sfDir)
      .select($"event_type", hour($"ts").cast("long").as("hod"),
        Exact.cents($"value").as("cents"))
    val level = ev.groupBy($"event_type", $"hod")
      .agg(count(lit(1)).as("n"), sum($"cents").as("s"))
    ev.join(broadcast(level), Seq("event_type", "hod"))
      .withColumn("absdev_n", abs($"cents" * $"n" - $"s"))
      .groupBy($"event_type", $"hod")
      .agg(first($"n").as("n"), first($"s").as("s"),
        sum($"absdev_n").as("sum_absdev_n"))
      .select($"event_type", $"hod", $"n",
        round($"s".cast("double") / $"n".cast("double"), 6)
          .as("seasonal_cents"),
        // Σ|x·n − s| / n² = Σ|x − s/n| / n : exact ints, one division
        round($"sum_absdev_n".cast("double")
          / ($"n" * $"n").cast("double"), 6).as("resid_mad"))
      .orderBy($"event_type", $"hod")
  }

  def q287Sql: String =
    """WITH ev AS (
         SELECT event_type, CAST(hour(ts) AS BIGINT) AS hod,
           CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
         FROM events),
       lvl AS (
         SELECT event_type, hod, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(cents) AS BIGINT) AS s
         FROM ev GROUP BY 1, 2),
       d AS (
         SELECT ev.event_type, ev.hod, n, s,
           abs(cents * n - s) AS absdev_n
         FROM ev JOIN lvl USING (event_type, hod))
       SELECT event_type, hod, n,
         round(CAST(s AS DOUBLE) / CAST(n AS DOUBLE), 6) AS seasonal_cents,
         round(CAST(sum(absdev_n) AS DOUBLE) / CAST(n * n AS DOUBLE), 6)
           AS resid_mad
       FROM d GROUP BY event_type, hod, n, s
       ORDER BY event_type, hod"""
}
