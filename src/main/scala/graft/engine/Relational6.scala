package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Eighth query wave: corpus-mixing and behavioral-analytics operators —
  * temperature-smoothed source mixture weights, Markov transition
  * matrices, heavy-hitter/skew audits, cohort retention, and robust
  * (Tukey-fence) outlier detection.
  *
  * Shared arithmetic discipline (see SparkEntry scaladoc): every
  * cross-engine double is either a single IEEE division of exact
  * integers or a correctly-rounded sqrt of an integer — no cross-row
  * float accumulation ever reaches the output.
  */
object Relational6 {

  // ---------------------------------------------------------------------
  // q100: temperature-smoothed mixture weights
  // ---------------------------------------------------------------------

  /** Data-mixing weights per source: multilingual/LLM pipelines sample
    * sources with probability ∝ tokens^α (α<1 upweights small sources —
    * the "temperature" of the mixture). α = 1/2 here so the weight is an
    * IEEE-exact `sqrt`; it is floored to an INTEGER weight so the
    * normalizing denominator is an exact integer sum (a float Σ√t would
    * be accumulation-order-dependent across engines/partitionings). The
    * per-source share and the expected draw from a 100k-doc epoch are
    * then single exact-integer divisions.
    *
    * Scale: one map-side-combined aggregate over the corpus; the
    * 20-source frame that the window normalizes is O(#sources), not
    * O(corpus). */
  def q100MixtureWeights(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val EpochDocs = 100000L
    val perSource = Tables.documents(spark, sfDir)
      .select($"source", TextFunctions.tokenCount($"text").cast("long").as("wc"))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"), sum($"wc").as("n_tokens"))
      .withColumn("weight", floor(sqrt($"n_tokens".cast("double"))).cast("long"))
    val tot = Window.partitionBy()
    perSource
      .withColumn("w_tot", sum($"weight").over(tot))
      .withColumn("tok_tot", sum($"n_tokens").over(tot))
      .select($"source", $"n_docs", $"n_tokens", $"weight",
        round($"weight".cast("double") / $"w_tot", 6).as("mix_share"),
        round($"n_tokens".cast("double") / $"tok_tot", 6).as("raw_share"),
        round(($"weight" * EpochDocs).cast("double") / $"w_tot", 3)
          .as("epoch_docs"))
      .orderBy($"source")
  }

  def q100Sql: String = {
    val wc = TextFunctions.tokenCountSql("text")
    s"""WITH s AS (
          SELECT source, count(*) AS n_docs,
            CAST(sum(CAST($wc AS BIGINT)) AS BIGINT) AS n_tokens
          FROM documents GROUP BY source),
        w AS (
          SELECT *, CAST(floor(sqrt(CAST(n_tokens AS DOUBLE))) AS BIGINT)
            AS weight FROM s)
        SELECT source, n_docs, n_tokens, weight,
          round(CAST(weight AS DOUBLE) / sum(weight) OVER (), 6) AS mix_share,
          round(CAST(n_tokens AS DOUBLE) / sum(n_tokens) OVER (), 6) AS raw_share,
          round(CAST(weight * 100000 AS DOUBLE) / sum(weight) OVER (), 3)
            AS epoch_docs
        FROM w ORDER BY source"""
  }

  // ---------------------------------------------------------------------
  // q101: Markov transition matrix over event sequences
  // ---------------------------------------------------------------------

  /** Per-user event-type transition counts and row-normalized
    * probabilities (first-order Markov / clickstream model): `lag` over
    * each user's event-time-ordered stream pairs every event with its
    * predecessor, then the (prev, next) matrix aggregates globally.
    * Ties on ts break by event_id so the sequence is total.
    *
    * Scale: ONE shuffle by user_id for the sequence window (the same
    * partitioning any per-user op reuses), then a partial+final
    * aggregate onto the tiny |types|² matrix; prob is an exact
    * integer division per matrix cell. */
  def q101Transitions(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val seq = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val m = Tables.events(spark, sfDir)
      .select($"user_id", $"ts", $"event_id", $"event_type")
      .withColumn("prev_type", lag($"event_type", 1).over(seq))
      .filter($"prev_type".isNotNull)
      .groupBy($"prev_type", $"event_type".as("next_type"))
      .agg(count(lit(1)).as("n"))
    val row = Window.partitionBy($"prev_type")
    m.withColumn("row_n", sum($"n").over(row))
      .select($"prev_type", $"next_type", $"n",
        round($"n".cast("double") / $"row_n", 6).as("prob"))
      .orderBy($"prev_type", $"next_type")
  }

  def q101Sql: String =
    """WITH seq AS (
         SELECT event_type,
           lag(event_type) OVER (PARTITION BY user_id
             ORDER BY ts, event_id) AS prev_type
         FROM events),
       m AS (
         SELECT prev_type, event_type AS next_type, count(*) AS n
         FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2)
       SELECT prev_type, next_type, n,
         round(CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY prev_type), 6)
           AS prob
       FROM m ORDER BY prev_type, next_type"""

  // ---------------------------------------------------------------------
  // q103: heavy hitters + skew audit
  // ---------------------------------------------------------------------

  /** Per-event-type heavy-hitter and skew statistics: the per-key
    * frequency profile that decides whether a downstream join/agg on
    * user_id needs salting (q45) or AQE skew splitting. `skew` is the
    * classic max/mean ratio (1.0 = perfectly even); `top_share` is the
    * heaviest key's traffic share. Tie on the top count breaks to the
    * smallest user_id via a composite max_by key, so the answer is
    * deterministic without a per-type sort.
    *
    * Scale: two aggregates — (type, user) partial+final, then the
    * per-type reduction; no windows over the raw stream, nothing
    * driver-side. */
  def q103HeavyHitters(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, sfDir)
      .groupBy($"event_type", $"user_id")
      .agg(count(lit(1)).as("n"))
      .groupBy($"event_type")
      .agg(sum($"n").as("total_events"),
        count(lit(1)).as("n_users"),
        max($"n").as("top_n"),
        // max_by on (n, -user_id): among equal counts the SMALLEST user
        // wins, mirroring the oracle's (n DESC, user_id ASC) rank
        max_by($"user_id", struct($"n", (-$"user_id").as("neg"))).as("top_user"))
      .select($"event_type", $"total_events", $"n_users", $"top_user", $"top_n",
        round($"top_n".cast("double") / $"total_events", 6).as("top_share"),
        round(($"top_n" * $"n_users").cast("double") / $"total_events", 6)
          .as("skew"))
      .orderBy($"event_type")
  }

  def q103Sql: String =
    """WITH k AS (
         SELECT event_type, user_id, count(*) AS n
         FROM events GROUP BY 1, 2),
       r AS (
         SELECT *, row_number() OVER (PARTITION BY event_type
           ORDER BY n DESC, user_id) AS rk
         FROM k)
       SELECT event_type,
         CAST(sum(n) AS BIGINT) AS total_events,
         count(*) AS n_users,
         CAST(max(CASE WHEN rk = 1 THEN user_id END) AS BIGINT) AS top_user,
         CAST(max(CASE WHEN rk = 1 THEN n END) AS BIGINT) AS top_n,
         round(CAST(max(CASE WHEN rk = 1 THEN n END) AS DOUBLE) / sum(n), 6)
           AS top_share,
         round(CAST(max(CASE WHEN rk = 1 THEN n END) * count(*) AS DOUBLE)
           / sum(n), 6) AS skew
       FROM r GROUP BY event_type ORDER BY event_type"""

  // ---------------------------------------------------------------------
  // q106: cohort retention triangle
  // ---------------------------------------------------------------------

  /** Weekly retention triangle: users cohort by their first-ever event
    * date; each later week of activity marks them retained for that
    * (cohort, week-offset) cell. retention = active/cohort_size is one
    * exact integer division. Complements q75 (conversion is one funnel
    * edge; retention is the full activity triangle).
    *
    * Scale: the min-ts-per-user aggregate and the (user, week) distinct
    * both shuffle by user_id — the broadcast-able cohort frame then
    * joins back without re-shuffling the event stream. */
  def q106Retention(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, sfDir)
    val first = ev.groupBy($"user_id")
      .agg(to_date(min($"ts")).as("cohort_date"))
    val cohortSize = first.groupBy($"cohort_date")
      .agg(count(lit(1)).as("cohort_users"))
    val active = ev.select($"user_id", to_date($"ts").as("d"))
      .join(first, "user_id")
      .select($"cohort_date",
        (datediff($"d", $"cohort_date") / 7).cast("int").as("week_offset"),
        $"user_id")
      .distinct()
      .groupBy($"cohort_date", $"week_offset")
      .agg(count(lit(1)).as("active_users"))
    active.join(cohortSize, "cohort_date")
      .select($"cohort_date".cast("string").as("cohort_date"), $"week_offset",
        $"active_users", $"cohort_users",
        round($"active_users".cast("double") / $"cohort_users", 6)
          .as("retention"))
      .orderBy($"cohort_date", $"week_offset")
  }

  def q106Sql: String =
    """WITH f AS (
         SELECT user_id, CAST(min(ts) AS DATE) AS cohort_date
         FROM events GROUP BY user_id),
       cs AS (
         SELECT cohort_date, count(*) AS cohort_users FROM f GROUP BY 1),
       a AS (
         SELECT DISTINCT f.cohort_date,
           CAST(date_diff('day', f.cohort_date, CAST(e.ts AS DATE)) // 7
             AS INT) AS week_offset,
           e.user_id
         FROM events e JOIN f USING (user_id)),
       g AS (
         SELECT cohort_date, week_offset, count(*) AS active_users
         FROM a GROUP BY 1, 2)
       SELECT CAST(g.cohort_date AS VARCHAR) AS cohort_date, week_offset,
         active_users, cohort_users,
         round(CAST(active_users AS DOUBLE) / cohort_users, 6) AS retention
       FROM g JOIN cs ON g.cohort_date = cs.cohort_date
       ORDER BY cohort_date, week_offset"""

  // ---------------------------------------------------------------------
  // q108: robust (Tukey-fence) outlier audit
  // ---------------------------------------------------------------------

  /** Per-type Tukey-fence outlier counts over value cents: flag
    * c < Q1 − 1.5·IQR or c > Q3 + 1.5·IQR. Quartiles interpolate on the
    * k/4 grid (positions (n−1)/4), so 4·Q is an exact integer and the
    * fences become pure 64-bit comparisons — 8c < 5A − 3B and
    * 8c > 5B − 3A with A = 4·Q1, B = 4·Q3 — immune to libm/rounding
    * skew in either engine. The reported quartiles are exact k/4-grid
    * doubles (A/4, B/4).
    *
    * Scale: exact `percentile` is a per-group sort here; at 100 TB the
    * fences come from `percentile_approx` (fixed-memory sketch) and the
    * flagging pass is unchanged — the integer-fence trick then bounds
    * divergence to sketch error rather than float error. */
  def q108OutlierAudit(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, sfDir)
      .select($"event_type",
        Exact.cents($"value").as("cents"))
    val fences = ev.groupBy($"event_type")
      .agg(
        (expr("percentile(cents, 0.25)") * 4).cast("long").as("a4"),
        (expr("percentile(cents, 0.75)") * 4).cast("long").as("b4"))
    // explicit broadcast (q113's discipline): a sort-merge fallback here
    // would shuffle the whole fact table onto |event_type| reducers
    ev.join(broadcast(fences), Seq("event_type"))
      .groupBy($"event_type", $"a4", $"b4")
      .agg(count(lit(1)).as("n"),
        count(when($"cents" * 8 < $"a4" * 5 - $"b4" * 3, 1)).as("n_low"),
        count(when($"cents" * 8 > $"b4" * 5 - $"a4" * 3, 1)).as("n_high"))
      .select($"event_type", $"n",
        ($"a4" / 4.0).as("q1_cents"), ($"b4" / 4.0).as("q3_cents"),
        $"n_low", $"n_high")
      .orderBy($"event_type")
  }

  def q108Sql: String =
    """WITH c AS (
         SELECT event_type,
           CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
         FROM events),
       f AS (
         SELECT event_type,
           CAST(quantile_cont(cents, 0.25) * 4 AS BIGINT) AS a4,
           CAST(quantile_cont(cents, 0.75) * 4 AS BIGINT) AS b4
         FROM c GROUP BY event_type)
       SELECT c.event_type, count(*) AS n,
         a4 / 4.0 AS q1_cents, b4 / 4.0 AS q3_cents,
         count(*) FILTER (WHERE cents * 8 < a4 * 5 - b4 * 3) AS n_low,
         count(*) FILTER (WHERE cents * 8 > b4 * 5 - a4 * 3) AS n_high
       FROM c JOIN f USING (event_type)
       GROUP BY c.event_type, a4, b4 ORDER BY event_type"""
}
