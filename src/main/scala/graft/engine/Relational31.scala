package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Forty-first query wave: warehouse-dimension construction and exact
  * grouped statistics — SCD2 interval building from a change log
  * (q271), per-group least-squares regression from exact integer
  * moments (q272), and the tokenizer fertility audit a multilingual
  * data-mixture owner reads before choosing a vocabulary (q273).
  *
  * Cross-engine determinism posture (house rules): all accumulations
  * are exact 64-bit integers on the cents/μs grid; every float
  * expression is ONE shared operation tree evaluated over those exact
  * sums, so both engines land on identical IEEE bits; ordering ties
  * are broken by unique ids.
  */
object Relational31 {

  /** q271 — SCD2 dimension BUILD from a change log: the reference's
    * pipelines enrich against versioned dimensions (the q208 as-of
    * join consumes one); this is the WRITE side — turning an event
    * stream of attribute observations into `[valid_from, valid_to)`
    * interval rows, the slowly-changing-dimension type-2 build every
    * warehouse runs. Per user, 'purchase' events carry a derived tier
    * attribute; consecutive duplicate tiers are collapsed (a real CDC
    * feed re-states unchanged attributes), each surviving change opens
    * an interval closed by the NEXT change (`lead`), and the last
    * interval per user stays open (is_current). The audit output is
    * the bounded per-tier summary: interval count, open count, and
    * total closed dwell seconds.
    *
    * Scale: both windows (change-collapse lag, interval-close lead)
    * are PARTITIONED by user — one user-keyed shuffle, no global sort
    * anywhere; the audit aggregate is map-side combinable. At 100 TB
    * the same two windows run per key after a bucketed exchange. */
  def q271Scd2Build(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val byUser = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val changes = Tables.events(spark, sfDir)
      .filter($"event_type" === "purchase")
      .select($"user_id", $"ts", $"event_id",
        (Exact.cents($"value") % 3).as("tier"))
      .withColumn("prev_tier", lag($"tier", 1).over(byUser))
      .filter($"prev_tier".isNull || $"tier" =!= $"prev_tier")
    changes
      .withColumn("from_us", unix_micros($"ts"))
      .withColumn("to_us", lead(unix_micros($"ts"), 1).over(byUser))
      .groupBy($"tier")
      .agg(count(lit(1)).as("n_intervals"),
        count(when($"to_us".isNull, 1)).as("n_current"),
        coalesce(sum(expr("(to_us - from_us) div 1000000")), lit(0L))
          .as("closed_dwell_s"))
      .orderBy($"tier")
  }

  def q271Sql: String =
    """WITH ch AS (
         SELECT user_id, ts, event_id,
           CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) % 3 AS tier
         FROM events WHERE event_type = 'purchase'),
       collapsed AS (
         SELECT * FROM (
           SELECT user_id, ts, event_id, tier,
             lag(tier) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_tier
           FROM ch)
         WHERE prev_tier IS NULL OR tier <> prev_tier),
       iv AS (
         SELECT tier, epoch_us(ts) AS from_us,
           lead(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS to_us
         FROM collapsed)
       SELECT tier, CAST(count(*) AS BIGINT) AS n_intervals,
         CAST(count(*) FILTER (WHERE to_us IS NULL) AS BIGINT) AS n_current,
         CAST(coalesce(sum((to_us - from_us) // 1000000), 0) AS BIGINT)
           AS closed_dwell_s
       FROM iv GROUP BY tier ORDER BY tier"""

  /** q272 — grouped least-squares (OLS) regression from exact moments:
    * per event_type, the slope and intercept of value-cents against
    * event-time hours — the per-segment trend line a monitoring or
    * curriculum pipeline fits millions of times. The whole regression
    * is ONE map-side-combinable aggregate of exact integer moments
    * (n, Σx, Σy, Σxy, Σx²) over hours RE-BASED to the corpus's first
    * hour (a broadcast scalar) so every per-row product fits far
    * inside int64 at any realistic scale; the closed-form
    * slope = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²) is then evaluated in ONE
    * shared double expression tree over those exact sums — identical
    * IEEE bits in both engines (the q121/Welch discipline).
    *
    * Scale: a single aggregate scan — no joins, no windows; the
    * rebase scalar is one parquet-stats-cheap min(). */
  def q272GroupOls(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val base = Tables.events(spark, sfDir)
      .agg(min(expr("unix_micros(ts) div 3600000000")).as("h0"))
    val moments = Tables.events(spark, sfDir)
      .select($"event_type",
        expr("unix_micros(ts) div 3600000000").as("h"),
        Exact.cents($"value").as("y"))
      .crossJoin(broadcast(base))
      .withColumn("x", $"h" - $"h0")
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"), sum($"x").as("sx"), sum($"y").as("sy"),
        sum($"x" * $"y").as("sxy"), sum($"x" * $"x").as("sxx"))
    // one shared double tree over exact sums (identical in q272Sql)
    val nD = $"n".cast("double"); val sxD = $"sx".cast("double")
    val syD = $"sy".cast("double"); val sxyD = $"sxy".cast("double")
    val sxxD = $"sxx".cast("double")
    val slope = (nD * sxyD - sxD * syD) / (nD * sxxD - sxD * sxD)
    moments.select($"event_type", $"n",
        round(slope, 6).as("slope_cents_per_h"),
        round((syD - slope * sxD) / nD, 6).as("intercept_cents"))
      .orderBy($"event_type")
  }

  def q272Sql: String =
    """WITH h0 AS (
         SELECT min(epoch_us(ts) // 3600000000) AS h0 FROM events),
       m AS (
         SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
           CAST(sum(x * y) AS BIGINT) AS sxy,
           CAST(sum(x * x) AS BIGINT) AS sxx
         FROM (
           SELECT event_type,
             epoch_us(ts) // 3600000000 - h0 AS x,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS y
           FROM events CROSS JOIN h0)
         GROUP BY event_type)
       SELECT event_type, n,
         round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
           / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6)
           AS slope_cents_per_h,
         round((CAST(sy AS DOUBLE)
            - (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
              / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
              * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE), 6)
           AS intercept_cents
       FROM m ORDER BY event_type"""

  /** q273 — tokenizer fertility audit per language: the
    * bytes-per-word / chars-per-word / words-per-doc profile a
    * multilingual pretraining run reads before sizing a vocabulary —
    * languages whose scripts pack more bytes per whitespace word need
    * proportionally more BPE merges (or a byte-level tokenizer) to hit
    * the same tokens-per-word fertility, and the mixture owner prices
    * that against the per-language token budget (q100/q264's input).
    * Whitespace words via the shared [[graft.functions.TextFunctions]]
    * tokenizer; all sums exact integers; each ratio is one double
    * division of exact totals.
    *
    * Scale: pure per-row projections inside the scan feeding one
    * map-side-combinable aggregate — no shuffle before the |langs|-row
    * frame. */
  def q273TokenizerFertility(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import graft.functions.TextFunctions
    Tables.documents(spark, sfDir)
      .select($"lang",
        TextFunctions.tokenCount($"text").cast("long").as("words"),
        length($"text").cast("long").as("chars"),
        octet_length($"text").cast("long").as("bytes"))
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"), sum($"words").as("n_words"),
        sum($"chars").as("n_chars"), sum($"bytes").as("n_bytes"))
      .select($"lang", $"n_docs", $"n_words", $"n_chars", $"n_bytes",
        round($"n_bytes".cast("double") / $"n_words".cast("double"), 6)
          .as("bytes_per_word"),
        round($"n_chars".cast("double") / $"n_words".cast("double"), 6)
          .as("chars_per_word"),
        round($"n_words".cast("double") / $"n_docs".cast("double"), 6)
          .as("words_per_doc"))
      .orderBy($"lang")
  }

  def q273Sql: String = {
    val wc = graft.functions.TextFunctions.tokenCountSql("text")
    s"""WITH t AS (
          SELECT lang, CAST($wc AS BIGINT) AS words,
            CAST(length(text) AS BIGINT) AS chars,
            CAST(strlen(text) AS BIGINT) AS bytes -- DuckDB: strlen = BYTE length of a VARCHAR (octet_length is BLOB-only)
          FROM documents),
        s AS (
          SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
            CAST(sum(words) AS BIGINT) AS n_words,
            CAST(sum(chars) AS BIGINT) AS n_chars,
            CAST(sum(bytes) AS BIGINT) AS n_bytes
          FROM t GROUP BY lang)
        SELECT lang, n_docs, n_words, n_chars, n_bytes,
          round(CAST(n_bytes AS DOUBLE) / CAST(n_words AS DOUBLE), 6)
            AS bytes_per_word,
          round(CAST(n_chars AS DOUBLE) / CAST(n_words AS DOUBLE), 6)
            AS chars_per_word,
          round(CAST(n_words AS DOUBLE) / CAST(n_docs AS DOUBLE), 6)
            AS words_per_doc
        FROM s ORDER BY lang"""
  }
}
