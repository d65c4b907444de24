package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Nineteenth query wave: the training-data curation verbs that sit
  * between raw tables and a tokenizer — temporal split hygiene, feature
  * normalization, curriculum interleaving, mixture reweighting, and
  * time-series smoothing. Each is deliberately formulated so the ONLY
  * data-sized operation is a combinable aggregate or a filter; every
  * downstream step runs on domain-sized frames.
  */
object Relational12 {

  /** Split fractions in percent (integer arithmetic end to end). */
  val TrainPct = 70L
  val EmbargoPct = 5L

  /** q159 — purged temporal split: train / embargo / test over the
    * event log with an embargo band between train and test (the
    * time-series CV hygiene that stops boundary leakage: samples
    * adjacent to the cutoff can share context with both sides, so a
    * band of them is EXCLUDED from training and evaluation alike).
    *
    * The log's total order is event_id (monotone with ts), so the
    * cutoffs are pure arithmetic on ONE max aggregate broadcast into a
    * filter — no global sort, no row_number, nothing rank-shaped ever
    * touches the data. That is the formulation that survives 100 TB:
    * the quantile-free cutoff costs one combinable max. The audit row
    * reports how many users appear on BOTH sides of the embargo —
    * user-level leakage the split deliberately permits but a grouped
    * split (q145) would forbid; surfacing it is the point. */
  def q159PurgedSplit(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, sfDir).select($"event_id", $"user_id")
    val cuts = ev.agg(max($"event_id").as("n"))
      .select(expr(s"n * $TrainPct div 100").as("k_train"),
        expr(s"n * ${TrainPct + EmbargoPct} div 100").as("k_emb"))
    val tagged = ev.crossJoin(broadcast(cuts))
      .withColumn("split",
        when($"event_id" <= $"k_train", lit("a_train"))
          .when($"event_id" <= $"k_emb", lit("b_embargo"))
          .otherwise(lit("c_test")))
    val perSplit = tagged.groupBy($"split")
      .agg(count(lit(1)).as("n"), countDistinct($"user_id").as("n_users"),
        min($"event_id").as("min_id"), max($"event_id").as("max_id"))
    val leak = tagged.filter($"split" =!= "b_embargo")
      .select($"user_id", $"split").distinct()
      .groupBy($"user_id").agg(count(lit(1)).as("sides"))
      .filter($"sides" === 2)
      .agg(count(lit(1)).as("n"))
      .select(lit("d_leak_users").as("split"), $"n",
        lit(null).cast("long").as("n_users"),
        lit(null).cast("long").as("min_id"),
        lit(null).cast("long").as("max_id"))
    perSplit.unionByName(leak).orderBy($"split")
  }

  def q159Sql: String =
    """WITH cuts AS (
         SELECT max(event_id) * 70 // 100 AS k_train,
                max(event_id) * 75 // 100 AS k_emb
         FROM events),
       tagged AS (
         SELECT event_id, user_id,
           CASE WHEN event_id <= k_train THEN 'a_train'
                WHEN event_id <= k_emb THEN 'b_embargo'
                ELSE 'c_test' END AS split
         FROM events CROSS JOIN cuts),
       per AS (
         SELECT split, CAST(count(*) AS BIGINT) AS n,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           min(event_id) AS min_id, max(event_id) AS max_id
         FROM tagged GROUP BY 1),
       leak AS (
         SELECT 'd_leak_users' AS split, CAST(count(*) AS BIGINT) AS n,
           CAST(NULL AS BIGINT) AS n_users,
           CAST(NULL AS BIGINT) AS min_id, CAST(NULL AS BIGINT) AS max_id
         FROM (
           SELECT user_id FROM (
             SELECT DISTINCT user_id, split FROM tagged
             WHERE split <> 'b_embargo') s
           GROUP BY user_id HAVING count(*) = 2) t)
       SELECT * FROM per UNION ALL SELECT * FROM leak ORDER BY split"""

  /** q160 — per-group min-max normalization, audited by decile: each
    * event's value is rescaled to [0,1] WITHIN its event type (the
    * feature-scaling pass before features from different activity types
    * share a model), then bucketed into normalized deciles. Two-pass
    * shape: one combinable (min, max) aggregate per group, broadcast
    * back into a map-side projection — the log is scanned twice but
    * shuffled only once (the final |types|×10 histogram). The
    * normalization itself is integer differences and ONE double
    * division, so bucket boundaries are bit-stable across engines. */
  def q160GroupNorm(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, sfDir)
      .select($"event_type", Exact.cents($"value").as("c"))
    val bounds = ev.groupBy($"event_type")
      .agg(min($"c").as("lo"), max($"c").as("hi"))
    ev.join(broadcast(bounds), "event_type")
      .withColumn("norm",
        when($"hi" === $"lo", lit(0.0))
          .otherwise(($"c" - $"lo").cast("double")
            / ($"hi" - $"lo").cast("double")))
      .withColumn("bucket", least(floor($"norm" * 10).cast("long"), lit(9L)))
      .groupBy($"event_type", $"bucket")
      .agg(count(lit(1)).as("n"),
        round(min($"norm"), 6).as("min_norm"),
        round(max($"norm"), 6).as("max_norm"))
      .orderBy($"event_type", $"bucket")
  }

  def q160Sql: String =
    """WITH ev AS (
         SELECT event_type,
           CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
         FROM events),
       bounds AS (
         SELECT event_type, min(c) AS lo, max(c) AS hi FROM ev GROUP BY 1),
       normed AS (
         SELECT ev.event_type,
           CASE WHEN hi = lo THEN 0.0
                ELSE CAST(c - lo AS DOUBLE) / CAST(hi - lo AS DOUBLE)
           END AS norm
         FROM ev JOIN bounds USING (event_type))
       SELECT event_type,
         CAST(least(floor(norm * 10), 9) AS BIGINT) AS bucket,
         CAST(count(*) AS BIGINT) AS n,
         round(min(norm), 6) AS min_norm,
         round(max(norm), 6) AS max_norm
       FROM normed GROUP BY 1, 2 ORDER BY event_type, bucket"""

  /** How many head-of-curriculum rows the audit emits. */
  val CurriculumHead = 24

  /** q161 — curriculum interleave: order the corpus for training so
    * sources alternate round-robin, each source internally ordered by a
    * quality proxy (longest documents first — stand-in for a learned
    * quality score). position = (rank−1)·|sources| + source_index is
    * pure arithmetic, so the GLOBAL training order needs no global
    * sort: per-source ranking is a partitioned window (map-side
    * WindowGroupLimit when only a head is consumed), the source index
    * is a |sources|-row broadcast, and a writer would range-partition
    * on the computed position. The audit emits the first 24 positions —
    * the round-robin property is visible (source cycles with period
    * |sources|) and oracle-checked. */
  def q161Curriculum(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
      .select($"source", $"doc_id", $"n_chars")
    val srcIdx = docs.select($"source").distinct()
      .withColumn("sidx", row_number().over(
        Window.orderBy($"source")).cast("long") - 1L)
    val nSrc = srcIdx.agg(count(lit(1)).as("n_src"))
    val ranked = docs.withColumn("rk", row_number().over(
      Window.partitionBy($"source")
        .orderBy($"n_chars".desc, $"doc_id".asc)).cast("long"))
    ranked.join(broadcast(srcIdx), "source")
      .crossJoin(broadcast(nSrc))
      .withColumn("position", ($"rk" - 1L) * $"n_src" + $"sidx")
      .filter($"position" < CurriculumHead)
      .select($"position", $"source", $"doc_id", $"n_chars")
      .orderBy($"position")
  }

  def q161Sql: String =
    """WITH srcidx AS (
         SELECT source,
           CAST(row_number() OVER (ORDER BY source) AS BIGINT) - 1 AS sidx
         FROM (SELECT DISTINCT source FROM documents)),
       nsrc AS (SELECT CAST(count(*) AS BIGINT) AS n_src FROM srcidx),
       ranked AS (
         SELECT source, doc_id, n_chars,
           CAST(row_number() OVER (PARTITION BY source
             ORDER BY n_chars DESC, doc_id ASC) AS BIGINT) AS rk
         FROM documents)
       SELECT (rk - 1) * n_src + sidx AS position, source, doc_id, n_chars
       FROM ranked JOIN srcidx USING (source) CROSS JOIN nsrc
       WHERE (rk - 1) * n_src + sidx < 24
       ORDER BY position"""

  /** q162 — mixture reweighting: given a target of a UNIFORM token
    * budget per source, compute each source's actual token share and
    * the per-source sampling rate that lands the corpus on the target
    * mixture (rate capped at 1 — undersized sources are taken whole,
    * they cannot be upsampled by subsampling). The output is the
    * sampling plan a curation job executes with q57's hash-mod
    * sampler; expected_tokens audits what the mix will actually yield.
    * One combinable aggregate over the corpus; everything after is
    * |sources|-sized arithmetic. */
  def q162MixtureReweight(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val bySrc = Tables.documents(spark, sfDir)
      .groupBy($"source").agg(sum($"n_chars").as("tokens"))
    val tot = bySrc.agg(sum($"tokens").as("total"),
      count(lit(1)).as("n_src"))
    bySrc.crossJoin(broadcast(tot))
      .withColumn("share", $"tokens".cast("double") / $"total".cast("double"))
      .withColumn("target", $"total".cast("double") / $"n_src".cast("double"))
      .withColumn("rate", least(lit(1.0), $"target" / $"tokens".cast("double")))
      .select($"source", $"tokens",
        round($"share", 6).as("share"),
        round($"rate", 6).as("rate"),
        round($"rate" * $"tokens".cast("double"), 6).as("expected_tokens"))
      .orderBy($"source")
  }

  def q162Sql: String =
    """WITH bysrc AS (
         SELECT source, CAST(sum(n_chars) AS BIGINT) AS tokens
         FROM documents GROUP BY 1),
       tot AS (
         SELECT CAST(sum(tokens) AS BIGINT) AS total,
           CAST(count(*) AS BIGINT) AS n_src
         FROM bysrc)
       SELECT source, tokens,
         round(CAST(tokens AS DOUBLE) / CAST(total AS DOUBLE), 6) AS share,
         round(least(1.0, (CAST(total AS DOUBLE) / CAST(n_src AS DOUBLE))
           / CAST(tokens AS DOUBLE)), 6) AS rate,
         round(least(1.0, (CAST(total AS DOUBLE) / CAST(n_src AS DOUBLE))
           / CAST(tokens AS DOUBLE)) * CAST(tokens AS DOUBLE), 6)
           AS expected_tokens
       FROM bysrc CROSS JOIN tot ORDER BY source"""

  /** q163 — EWMA smoothing of the hourly value series, one smoothed
    * level per day (α = 1/2: s_k = (x_k + s_{k−1}) / 2, seeded with the
    * day's first hour). α = 1/2 is chosen deliberately: the recurrence
    * is one IEEE addition and one EXACT halving per step, so the fold
    * is engine-reproducible given the fold ORDER — which both engines
    * pin by folding the day's hour-ordered list (the q152 ordered-fold
    * discipline; an unordered SUM of α(1−α)^k terms would be
    * partitioning-dependent). Scale: the log reduces to |day×hour|
    * means in one combinable aggregate; the fold runs over ≤24-element
    * arrays on day-sized rows. EWMA at 100 TB is an aggregate, not a
    * window over raw events. */
  def q163Ewma(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val hourly = Tables.events(spark, sfDir)
      .select(date_format($"ts", "yyyy-MM-dd").as("day"),
        date_format($"ts", "HH").as("hour"),
        Exact.cents($"value").as("c"))
      .groupBy($"day", $"hour")
      .agg((sum($"c").cast("double") / count(lit(1)).cast("double")).as("m"))
    hourly.groupBy($"day")
      .agg(collect_list(struct($"hour", $"m")).as("hs"))
      .withColumn("arr", transform(array_sort($"hs"), x => x.getField("m")))
      .select($"day",
        round(aggregate(slice($"arr", 2, 24), element_at($"arr", 1),
          (acc, v) => (acc + v) / 2.0), 6).as("ewma"),
        size($"arr").cast("long").as("n_hours"))
      .orderBy($"day")
  }

  def q163Sql: String =
    """WITH hourly AS (
         SELECT strftime(ts, '%Y-%m-%d') AS day, strftime(ts, '%H') AS hour,
           sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
             / CAST(count(*) AS DOUBLE) AS m
         FROM events GROUP BY 1, 2),
       packed AS (
         SELECT day, list(m ORDER BY hour) AS arr
         FROM hourly GROUP BY 1)
       SELECT day,
         round(list_reduce(arr, (acc, v) -> (acc + v) / 2.0), 6) AS ewma,
         CAST(len(arr) AS BIGINT) AS n_hours
       FROM packed ORDER BY day"""
}
