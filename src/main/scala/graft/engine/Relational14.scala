package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}

/** Twenty-first query wave: corpus boilerplate detection, RFM
  * segmentation, navigation-path mining, point-in-time feature
  * extraction, and higher-moment profiling. As with every wave, the
  * data-sized work is one combinable aggregate or one already-shared
  * window partitioning; verdict arithmetic happens on domain-sized
  * frames with engine-portable operation trees.
  */
object Relational14 {

  /** A shingle is boilerplate when it appears in more than this share
    * of the corpus (denominator 10 ⇒ 10%). */
  val BoilerplateDenom = 10L

  /** q169 — boilerplate detection: 5-gram shingles that recur across
    * more than 10% of documents are template/boilerplate content
    * (headers, footers, navigation chrome); each document then reports
    * what fraction of its distinct shingles is boilerplate, aggregated
    * per source — the curation signal for stripping templated spans
    * before training (near-dup dedup like q21 removes whole documents;
    * THIS finds the repeated content inside otherwise-distinct ones).
    *
    * Pipeline: distinct (doc, shingle) — combinable — then document
    * frequency per shingle (one shuffle on the shingle hash), the
    * global threshold broadcast from a count, one join back on shingle,
    * and per-doc / per-source reduction. Per-doc ratios are single
    * IEEE divisions rounded to the 6-dp grid BEFORE the per-source
    * exact decimal mean (sumExact), so cross-engine equality never
    * depends on summation order. */
  def q169Boilerplate(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val docShingle = Tables.documents(spark, sfDir)
      .select($"doc_id", $"source", TF.tokens($"text").as("toks"))
      .select($"doc_id", $"source",
        graft.functions.Generators.wordShingles($"toks", 5))
      .distinct()
    val nDocs = Tables.documents(spark, sfDir)
      .agg(count(lit(1)).as("n_docs"))
    val df = docShingle.groupBy($"shingle").agg(count(lit(1)).as("df"))
    val perDoc = docShingle
      .join(df, "shingle")
      .crossJoin(broadcast(nDocs))
      .groupBy($"source", $"doc_id")
      .agg(count(lit(1)).as("n_shingles"),
        sum(when($"df" * BoilerplateDenom > $"n_docs", 1L).otherwise(0L))
          .as("n_boiler"))
      .withColumn("ratio",
        round($"n_boiler".cast("double") / $"n_shingles".cast("double"), 6))
    perDoc.groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        sum($"n_boiler").as("boiler_shingles"),
        round(Exact.sumExact($"ratio", 6) / count(lit(1)).cast("double"), 6)
          .as("avg_boiler_ratio"))
      .orderBy($"source")
  }

  def q169Sql: String =
    s"""WITH ds AS MATERIALIZED (
          SELECT DISTINCT doc_id, source,
            unnest(${Dedup.shinglesSqlN("text", 5)}) AS shingle
          FROM documents),
        nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
        f AS (SELECT shingle, CAST(count(*) AS BIGINT) AS df
              FROM ds GROUP BY 1),
        perdoc AS (
          SELECT source, ds.doc_id,
            CAST(count(*) AS BIGINT) AS n_shingles,
            CAST(sum(CASE WHEN df * 10 > n_docs THEN 1 ELSE 0 END) AS BIGINT)
              AS n_boiler
          FROM ds JOIN f USING (shingle) CROSS JOIN nd
          GROUP BY 1, 2),
        r AS (
          SELECT source, n_boiler,
            round(CAST(n_boiler AS DOUBLE) / CAST(n_shingles AS DOUBLE), 6)
              AS ratio
          FROM perdoc)
        SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
          CAST(sum(n_boiler) AS BIGINT) AS boiler_shingles,
          round((CAST(sum(CAST(CAST(ratio AS DECIMAL(18,6)) * 1000000
              AS BIGINT)) AS BIGINT) / 1000000.0)
            / CAST(count(*) AS DOUBLE), 6) AS avg_boiler_ratio
        FROM r GROUP BY 1 ORDER BY source"""

  /** q170 — RFM segmentation: every user scored 1–5 on Recency (time
    * since last event), Frequency (event count), and Monetary (cents
    * sum) by quintile, then segment population and revenue reported per
    * (r, f, m) cell — the classic lifecycle-marketing table. Scores
    * come from exact ranks with a total-order tie-break (rank formula
    * `(rank−1)·5 div n`), so bucket edges are integer arithmetic, not
    * percentile floats. Scale: the log reduces to |users| metric rows
    * in one combinable aggregate; each of the three rankings is a
    * [[DistRank]] bucketed rank — approx cut points broadcast, local
    * sorts per bucket — so NO metric ever funnels the users frame
    * through a single-partition window (the round-5 weakness; the
    * exact-rank equivalence and the window-free plan are both
    * spec-asserted). */
  def q170Rfm(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // localCheckpoint the |users| frame (q67's discipline): the three
    // rank pipelines each branch off it several times (cut points,
    // bucket counts, the ranked spine) — without it the events
    // aggregation re-runs per branch
    val metrics = Tables.events(spark, sfDir)
      .select($"user_id", unix_micros($"ts").as("us"),
        Exact.cents($"value").as("cents"))
      .groupBy($"user_id")
      .agg(max($"us").as("last_us"), count(lit(1)).as("freq"),
        sum($"cents").as("monetary"))
      .localCheckpoint()
    val n = metrics.agg(count(lit(1)).as("n_users"))
    // recency rank: most recent first ⇒ score 5 = most recent quintile
    // checkpoint BETWEEN the three rank passes (r14): each withRank
    // consumes its input twice (bucket exchange + cut points), so an
    // unchecked chain re-runs rank #1's whole pipeline inside every
    // branch of rank #2 and #3 — multiplicative recompute over a
    // |users|-row frame whose materialization is nearly free
    val ranked = Seq(("last_us", "rk_r"), ("freq", "rk_f"), ("monetary", "rk_m"))
      .foldLeft(metrics) { case (df, (key, rk)) =>
        DistRank.withRank(df, key, "user_id", rk, desc = true)
          .localCheckpoint()
      }
    ranked.crossJoin(broadcast(n))
      .withColumn("r", lit(5L) - expr("(rk_r - 1) * 5 div n_users"))
      .withColumn("f", lit(5L) - expr("(rk_f - 1) * 5 div n_users"))
      .withColumn("m", lit(5L) - expr("(rk_m - 1) * 5 div n_users"))
      .groupBy($"r", $"f", $"m")
      .agg(count(lit(1)).as("n_users"), sum($"monetary").as("cents"))
      .orderBy($"r", $"f", $"m")
  }

  def q170Sql: String =
    """WITH metrics AS (
         SELECT user_id, max(epoch_us(ts)) AS last_us,
           CAST(count(*) AS BIGINT) AS freq,
           CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
             AS BIGINT) AS monetary
         FROM events GROUP BY 1),
       n AS (SELECT CAST(count(*) AS BIGINT) AS n_users FROM metrics),
       ranked AS (
         SELECT monetary,
           row_number() OVER (ORDER BY last_us DESC, user_id) AS rk_r,
           row_number() OVER (ORDER BY freq DESC, user_id) AS rk_f,
           row_number() OVER (ORDER BY monetary DESC, user_id) AS rk_m,
           n_users
         FROM metrics CROSS JOIN n)
       SELECT 5 - (rk_r - 1) * 5 // n_users AS r,
         5 - (rk_f - 1) * 5 // n_users AS f,
         5 - (rk_m - 1) * 5 // n_users AS m,
         CAST(count(*) AS BIGINT) AS n_users,
         CAST(sum(monetary) AS BIGINT) AS cents
       FROM ranked GROUP BY 1, 2, 3 ORDER BY r, f, m"""

  /** q171 — navigation-path mining: the 10 most frequent 3-step
    * event-type sequences (per-user, event-time order) — the
    * sequential-pattern extension of q101's single-step transition
    * matrix. Two lag windows over the user-sequence partitioning (the
    * shuffle every per-user query shares) synthesize the path string;
    * counting is map-side combinable; only the |distinct paths| frame
    * (≤ |types|³) reaches the final top-k sort. */
  def q171Paths(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val seq = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    Tables.events(spark, sfDir)
      .select($"user_id", $"ts", $"event_id", $"event_type")
      .withColumn("p1", lag($"event_type", 2).over(seq))
      .withColumn("p2", lag($"event_type", 1).over(seq))
      .filter($"p1".isNotNull)
      .select(concat_ws(">", $"p1", $"p2", $"event_type").as("path"))
      .groupBy($"path").agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"path")
      .limit(10)
  }

  def q171Sql: String =
    """WITH seq AS (
         SELECT lag(event_type, 2) OVER w AS p1,
           lag(event_type, 1) OVER w AS p2,
           event_type
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
       SELECT p1 || '>' || p2 || '>' || event_type AS path,
         CAST(count(*) AS BIGINT) AS n
       FROM seq WHERE p1 IS NOT NULL
       GROUP BY 1 ORDER BY n DESC, path LIMIT 10"""

  /** q172 — point-in-time feature extraction: for every purchase, the
    * user's event count and spend STRICTLY BEFORE it (frame ends at
    * `1 PRECEDING` — the no-leakage contract a feature store must
    * honor; including the label row is the classic target-leak bug),
    * reported as a conversion table by prior-activity bucket. One
    * user-partitioned window pass (the shared per-user shuffle), then a
    * |buckets|-row aggregate; bucket edges are an integer CASE ladder.
    * This is q46/q61's as-of idea turned into the feature-engineering
    * verb: state accumulates ALONG the stream instead of joining a
    * second table. */
  def q172PitFeatures(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val before = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.events(spark, sfDir)
      .select($"user_id", $"ts", $"event_id", $"event_type",
        Exact.cents($"value").as("cents"))
      .withColumn("prior_n", count(lit(1)).over(before))
      .withColumn("prior_cents", coalesce(sum($"cents").over(before), lit(0L)))
      .filter($"event_type" === "purchase")
      .withColumn("bucket",
        when($"prior_n" === 0, "a_cold")
          .when($"prior_n" <= 2, "b_1_2")
          .when($"prior_n" <= 5, "c_3_5")
          .when($"prior_n" <= 10, "d_6_10")
          .otherwise("e_gt10"))
      .groupBy($"bucket")
      .agg(count(lit(1)).as("n_purchases"),
        sum($"cents").as("purchase_cents"),
        sum($"prior_cents").as("prior_cents"),
        round(sum($"cents").cast("double")
          / count(lit(1)).cast("double"), 6).as("avg_purchase_cents"))
      .orderBy($"bucket")
  }

  def q172Sql: String =
    """WITH feat AS (
         SELECT event_type,
           CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
           count(*) OVER w AS prior_n,
           coalesce(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
             OVER w, 0) AS prior_cents
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
       p AS (
         SELECT CASE WHEN prior_n = 0 THEN 'a_cold'
                     WHEN prior_n <= 2 THEN 'b_1_2'
                     WHEN prior_n <= 5 THEN 'c_3_5'
                     WHEN prior_n <= 10 THEN 'd_6_10'
                     ELSE 'e_gt10' END AS bucket,
           cents, prior_cents
         FROM feat WHERE event_type = 'purchase')
       SELECT bucket, CAST(count(*) AS BIGINT) AS n_purchases,
         CAST(sum(cents) AS BIGINT) AS purchase_cents,
         CAST(sum(prior_cents) AS BIGINT) AS prior_cents,
         round(CAST(sum(cents) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
           AS avg_purchase_cents
       FROM p GROUP BY 1 ORDER BY bucket"""

  /** q173 — higher-moment profile: per-type skewness and excess
    * kurtosis of `value`, from exact integer raw moments (n, Σd, Σd²,
    * Σd³, Σd⁴ on the truncated-dollar grid — the 4th power of cents
    * would overflow int64; the dollar grid keeps Σd⁴ < 2⁶³ through
    * 100-TB row counts while still resolving shape). ONE map-side-
    * combined aggregation over the log; the central-moment/skew/kurt
    * algebra is a fixed double tree on |types| rows (q157's discipline
    * extended to 3rd/4th moments — the statistics that tell a planner
    * whether a key column is salting-worthy before any join). */
  def q173Moments(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val m = Tables.events(spark, sfDir)
      .select($"event_type",
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) div 100")
          .as("d"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"), sum($"d").as("s1"),
        sum($"d" * $"d").as("s2"),
        sum($"d" * $"d" * $"d").as("s3"),
        sum($"d" * $"d" * $"d" * $"d").as("s4"))
      .withColumn("dn", $"n".cast("double"))
      .withColumn("mean", $"s1".cast("double") / $"dn")
      .withColumn("m2",
        $"s2".cast("double") / $"dn" - $"mean" * $"mean")
      .withColumn("m3",
        $"s3".cast("double") / $"dn"
          - lit(3.0) * $"mean" * ($"s2".cast("double") / $"dn")
          + lit(2.0) * $"mean" * $"mean" * $"mean")
      .withColumn("m4",
        $"s4".cast("double") / $"dn"
          - lit(4.0) * $"mean" * ($"s3".cast("double") / $"dn")
          + lit(6.0) * $"mean" * $"mean" * ($"s2".cast("double") / $"dn")
          - lit(3.0) * $"mean" * $"mean" * $"mean" * $"mean")
    m.select($"event_type", $"n",
      round($"mean", 6).as("mean_dollars"),
      round($"m3" / ($"m2" * sqrt($"m2")), 6).as("skewness"),
      round($"m4" / ($"m2" * $"m2") - lit(3.0), 6).as("excess_kurtosis"))
      .orderBy($"event_type")
  }

  def q173Sql: String =
    """WITH raw AS (
         SELECT event_type,
           CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) // 100 AS d
         FROM events),
       m AS (
         SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(d) AS BIGINT) AS s1, CAST(sum(d * d) AS BIGINT) AS s2,
           CAST(sum(d * d * d) AS BIGINT) AS s3,
           CAST(sum(d * d * d * d) AS BIGINT) AS s4
         FROM raw GROUP BY 1),
       c AS (
         SELECT event_type, n, CAST(n AS DOUBLE) AS dn,
           CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
           s2, s3, s4
         FROM m),
       cm AS (
         SELECT event_type, n, mean,
           CAST(s2 AS DOUBLE) / dn - mean * mean AS m2,
           CAST(s3 AS DOUBLE) / dn
             - 3.0 * mean * (CAST(s2 AS DOUBLE) / dn)
             + 2.0 * mean * mean * mean AS m3,
           CAST(s4 AS DOUBLE) / dn
             - 4.0 * mean * (CAST(s3 AS DOUBLE) / dn)
             + 6.0 * mean * mean * (CAST(s2 AS DOUBLE) / dn)
             - 3.0 * mean * mean * mean * mean AS m4
         FROM c)
       SELECT event_type, n,
         round(mean, 6) AS mean_dollars,
         round(m3 / (m2 * sqrt(m2)), 6) AS skewness,
         round(m4 / (m2 * m2) - 3.0, 6) AS excess_kurtosis
       FROM cm ORDER BY event_type"""
}
