package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sixty-sixth query wave: robust-regression sufficient statistics
  * (winsorize, then exact integer OLS moments) and U-shaped
  * position-based multi-touch attribution with cent conservation —
  * the two analytics a growth team actually argues about.
  */
object Relational47 {

  /** q335 — WINSORIZED TREND (robust OLS): per event type, clip event
    * values to their exact per-type [p05, p95] (thresholds from the
    * grouped prefix-sum cells — no per-type global window), then emit
    * the integer OLS sufficient statistics of clipped cents against
    * epoch day: n, Σx, Σy, Σxx, Σxy and the slope's exact numerator
    * and denominator (slope = num/den downstream; the division stays
    * out because a negative slope would hit the cross-engine
    * floor-vs-truncate rule).
    *
    * Scale: value cells fold per (type, cents); thresholds come from
    * one withGroupedRunningSums pass; the clip + moment fold is one
    * more scan. x is the EPOCH day (~2·10⁴) — the final combines are
    * therefore n²-scaled and go through exact decimal (see
    * [[exactCombine]]); the Long moment sums are audited to ~10¹⁰
    * rows per type. */
  def q335WinsorTrend(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, sfDir)
      .select($"event_type",
        expr("unix_micros(ts) div 86400000000").as("x"),
        Exact.cents($"value").as("v"))
    val cells = ev.groupBy($"event_type", $"v")
      .agg(count(lit(1)).as("cnt"))
    val cum = DistRank.withGroupedRunningSums(cells, Seq("event_type"),
      "v", "v", Seq("cnt" -> "cum"))
    val tot = cells.groupBy($"event_type").agg(sum($"cnt").as("n"))
    val bounds = cum.join(broadcast(tot), Seq("event_type"))
      .groupBy($"event_type")
      .agg(min(when($"cum" * 20 >= $"n", $"v")).as("lo"),
        min(when($"cum" * 20 >= $"n" * 19, $"v")).as("hi"))
    // The n·Σ − Σ·Σ combines are n²-scaled with EPOCH-day x (~2·10⁴,
    // not span days), so they cross 2⁶³ near 10⁶ rows per type — the
    // ×10 carve found exactly that. Combined in DECIMAL(38,0) on the
    // |types|-row frame (exact: each factor is a BIGINT, products
    // < 10³⁸) and cast back to the gated BIGINT contract with a loud
    // range check; the oracle already combines exactly (DuckDB sums
    // BIGINT into HUGEINT). The Long SUMs themselves stay safe to
    // ~10¹⁰ rows per type (|x·y| ≤ 2·10⁴·4·10⁴ = 8·10⁸).
    ev.join(broadcast(bounds), Seq("event_type"))
      .withColumn("y", greatest($"lo", least($"hi", $"v")))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"), max($"lo").as("p05_cents"),
        max($"hi").as("p95_cents"),
        sum($"x").as("sx"), sum($"y").as("sy"),
        sum($"x" * $"x").as("sxx"), sum($"x" * $"y").as("sxy"))
      .select($"event_type", $"n", $"p05_cents", $"p95_cents",
        exactCombine("sxy", "sx", "sy").as("slope_num"),
        exactCombine("sxx", "sx", "sx").as("slope_den"))
      .orderBy($"event_type")
  }

  /** n·`sab` − `sa`·`sb` in DECIMAL(38,0), cast back to BIGINT with a
    * loud range check — the covariance-style combine whose TERMS are
    * n²-scaled even when the result is small. */
  private def exactCombine(sab: String, sa: String, sb: String) =
    expr(s"""CASE
      WHEN abs(CAST(n AS DECIMAL(38,0)) * $sab
             - CAST($sa AS DECIMAL(38,0)) * $sb) > 9223372036854775807
      THEN CAST(raise_error(concat('q335: n*$sab - $sa*$sb for ',
        event_type, ' exceeds BIGINT; the gated contract caps the ',
        'corpus')) AS BIGINT)
      ELSE CAST(CAST(n AS DECIMAL(38,0)) * $sab
              - CAST($sa AS DECIMAL(38,0)) * $sb AS BIGINT)
      END""")

  def q335Sql: String =
    """WITH ev AS (
         SELECT event_type, epoch_us(ts) // 86400000000 AS x,
           CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
         FROM events),
       cells AS (
         SELECT event_type, v, CAST(count(*) AS BIGINT) AS cnt
         FROM ev GROUP BY 1, 2),
       cum AS (
         SELECT event_type, v, cnt,
           CAST(sum(cnt) OVER (PARTITION BY event_type ORDER BY v
             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
         FROM cells),
       tot AS (
         SELECT event_type, CAST(sum(cnt) AS BIGINT) AS n
         FROM cells GROUP BY 1),
       bounds AS (
         SELECT event_type,
           CAST(min(CASE WHEN cum * 20 >= n THEN v END) AS BIGINT) AS lo,
           CAST(min(CASE WHEN cum * 20 >= n * 19 THEN v END) AS BIGINT)
             AS hi
         FROM cum JOIN tot USING (event_type) GROUP BY 1),
       clipped AS (
         SELECT ev.event_type, x, greatest(lo, least(hi, v)) AS y, lo, hi
         FROM ev JOIN bounds USING (event_type))
       SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         max(lo) AS p05_cents, max(hi) AS p95_cents,
         CAST(count(*) * sum(x * y) - sum(x) * sum(y) AS BIGINT)
           AS slope_num,
         CAST(count(*) * sum(x * x) - sum(x) * sum(x) AS BIGINT)
           AS slope_den
       FROM clipped GROUP BY event_type ORDER BY event_type"""

  /** q336 — U-SHAPED MULTI-TOUCH ATTRIBUTION: each purchase credits
    * its view touches in the prior 7 days 40% (first) / 40% (last) /
    * 20% split across middles — the position-based rule, in exact
    * integer cents with EVERY remainder pushed to the LAST touch so
    * per-purchase conservation is an identity, not a rounding hope
    * (q286's linear rule, upgraded to position weights). One-touch
    * purchases give that touch everything; zero-touch purchases keep
    * the revenue.
    *
    * Scale: the purchase×touch fan-out is an interval join per user
    * (the touches ARE the workload); position ranks come from a
    * window partitioned by purchase. Rolled up to position classes. */
  def q336UShapeAttribution(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val WindowUs = 7L * 86400000000L
    val ev = Tables.events(spark, sfDir)
      .select($"user_id", $"event_type", $"event_id",
        unix_micros($"ts").as("tus"), Exact.cents($"value").as("cents"))
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"event_id".as("p_id"), $"tus".as("p_tus"),
        $"cents")
    val views = ev.filter($"event_type" === "view")
      .select($"user_id", $"event_id".as("v_id"), $"tus".as("v_tus"))
    val touched = purchases.join(views, Seq("user_id"))
      .filter($"v_tus" < $"p_tus" && $"v_tus" >= $"p_tus" - WindowUs)
    val byPurchase = Window.partitionBy($"p_id")
    val ranked = touched
      .withColumn("pos", row_number().over(
        byPurchase.orderBy($"v_tus", $"v_id")).cast("long"))
      .withColumn("nt", count(lit(1)).over(byPurchase))
    val credited = ranked.withColumn("credit",
      when($"nt" === 1, $"cents")
        .when($"nt" === 2,
          when($"pos" === 1, expr("cents div 2"))
            .otherwise($"cents" - expr("cents div 2")))
        .otherwise(
          when($"pos" === 1, expr("(cents * 2) div 5"))
            .when($"pos" < $"nt",
              expr("((cents div 5)) div (nt - 2)"))
            .otherwise($"cents" - expr("(cents * 2) div 5") -
              expr("((cents div 5)) div (nt - 2)") * ($"nt" - 2))))
    val classes = credited
      .withColumn("cls",
        when($"pos" === 1, "first").when($"pos" === $"nt", "last")
          .otherwise("middle"))
      .groupBy($"cls")
      .agg(count(lit(1)).as("n_credits"), sum($"credit").as("credited_cents"))
    val keep = purchases
      .join(credited.select($"p_id").distinct(), Seq("p_id"), "left_anti")
      .agg(coalesce(sum($"cents"), lit(0L)).as("credited_cents"),
        count(lit(1)).as("n_credits"))
      .select(lit("untouched_keep").as("cls"), $"n_credits",
        $"credited_cents")
    classes.unionByName(keep).orderBy($"cls")
  }

  def q336Sql: String =
    """WITH ev AS (
         SELECT user_id, event_type, event_id, epoch_us(ts) AS tus,
           CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
         FROM events),
       p AS (
         SELECT user_id, event_id AS p_id, tus AS p_tus, cents
         FROM ev WHERE event_type = 'purchase'),
       v AS (
         SELECT user_id, event_id AS v_id, tus AS v_tus
         FROM ev WHERE event_type = 'view'),
       touched AS (
         SELECT p.p_id, p.cents, v.v_id, v.v_tus
         FROM p JOIN v USING (user_id)
         WHERE v.v_tus < p.p_tus AND v.v_tus >= p.p_tus - 604800000000),
       ranked AS (
         SELECT p_id, cents, v_tus,
           CAST(row_number() OVER (PARTITION BY p_id ORDER BY v_tus, v_id)
             AS BIGINT) AS pos,
           CAST(count(*) OVER (PARTITION BY p_id) AS BIGINT) AS nt
         FROM touched),
       credited AS (
         SELECT p_id, pos, nt,
           CASE WHEN nt = 1 THEN cents
                WHEN nt = 2 THEN CASE WHEN pos = 1 THEN cents // 2
                                      ELSE cents - cents // 2 END
                ELSE CASE WHEN pos = 1 THEN (cents * 2) // 5
                          WHEN pos < nt THEN (cents // 5) // (nt - 2)
                          ELSE cents - (cents * 2) // 5
                            - ((cents // 5) // (nt - 2)) * (nt - 2) END
           END AS credit
         FROM ranked),
       classes AS (
         SELECT CASE WHEN pos = 1 THEN 'first'
                     WHEN pos = nt THEN 'last'
                     ELSE 'middle' END AS cls,
           CAST(count(*) AS BIGINT) AS n_credits,
           CAST(sum(credit) AS BIGINT) AS credited_cents
         FROM credited GROUP BY 1),
       keep AS (
         SELECT 'untouched_keep' AS cls,
           CAST(count(*) AS BIGINT) AS n_credits,
           CAST(coalesce(sum(cents), 0) AS BIGINT) AS credited_cents
         FROM p WHERE p_id NOT IN (SELECT DISTINCT p_id FROM credited))
       SELECT cls, n_credits, credited_cents FROM classes
       UNION ALL SELECT cls, n_credits, credited_cents FROM keep
       ORDER BY cls"""
}
