package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Sixtieth query wave: operational-governance trio — the ingestion
  * coverage calendar (which event feeds have holes, and how big), the
  * cross-source token-overlap matrix (which crawls re-collect each
  * other), and quota-constrained top-k selection (the eval-set builder
  * that caps any one source's contribution).
  */
object Relational42 {

  /** q321 — INGESTION COVERAGE CALENDAR: per event type, the active
    * span in days, how many days actually carried events, the missing
    * count, and the LONGEST gap (in days between consecutive active
    * days) — the feed-health report a daily pipeline reads first.
    *
    * Scale: events fold immediately to the (type × active-day) frame,
    * which is CALENDAR-bounded (span/86400 rows per type, independent
    * of event volume); the adjacency lag runs per type over that
    * bounded frame — a partitioned window whose partitions can never
    * exceed the calendar. */
  def q321CoverageCalendar(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val days = Tables.events(spark, sfDir)
      .select($"event_type", expr("unix_micros(ts) div 86400000000").as("day"))
      .groupBy($"event_type", $"day")
      .agg(count(lit(1)).as("n"))
    val byType = Window.partitionBy($"event_type").orderBy($"day")
    days
      .withColumn("prev_day", lag($"day", 1).over(byType))
      .groupBy($"event_type")
      .agg(min($"day").as("first_day"), max($"day").as("last_day"),
        count(lit(1)).as("active_days"),
        sum($"n").as("n_events"),
        coalesce(max($"day" - $"prev_day"), lit(0L)).as("longest_step"))
      .select($"event_type", $"first_day", $"last_day", $"active_days",
        ($"last_day" - $"first_day" + 1).as("span_days"),
        ($"last_day" - $"first_day" + 1 - $"active_days").as("missing_days"),
        greatest(lit(0L), $"longest_step" - 1).as("longest_gap_days"),
        $"n_events")
      .orderBy($"event_type")
  }

  def q321Sql: String =
    """WITH days AS (
         SELECT event_type, epoch_us(ts) // 86400000000 AS day,
           CAST(count(*) AS BIGINT) AS n
         FROM events GROUP BY 1, 2),
       stepped AS (
         SELECT event_type, day, n,
           lag(day, 1) OVER (PARTITION BY event_type ORDER BY day)
             AS prev_day
         FROM days),
       agg AS (
         SELECT event_type, min(day) AS first_day, max(day) AS last_day,
           CAST(count(*) AS BIGINT) AS active_days,
           CAST(sum(n) AS BIGINT) AS n_events,
           CAST(coalesce(max(day - prev_day), 0) AS BIGINT) AS longest_step
         FROM stepped GROUP BY 1)
       SELECT event_type, first_day, last_day, active_days,
         last_day - first_day + 1 AS span_days,
         last_day - first_day + 1 - active_days AS missing_days,
         greatest(0, longest_step - 1) AS longest_gap_days, n_events
       FROM agg ORDER BY event_type"""

  /** q322 — CROSS-SOURCE TOKEN-OVERLAP MATRIX: exact Jaccard between
    * every pair of sources over their distinct token VOCABULARIES —
    * which crawls re-collect each other's material. Intersections come
    * from the per-token source co-occurrence join (fan bounded by
    * |sources| per token, never corpus-scale); unions by
    * inclusion–exclusion from per-source vocabulary sizes.
    *
    * Scale: one tokenize pass → distinct (token, source) → a
    * token-keyed self-join whose fan-out is ≤|sources|² per token;
    * output is the |sources|² matrix. */
  def q322OverlapMatrix(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ts = Tables.documents(spark, sfDir)
      .select($"source", explode(TextFunctions.tokens($"text")).as("t"))
      .filter($"t" =!= "").distinct()
    val sizes = ts.groupBy($"source").agg(count(lit(1)).as("vocab"))
    val inter = ts.as("a").join(ts.as("b"),
        col("a.t") === col("b.t") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(broadcast(sizes.select($"source".as("source_a"),
        $"vocab".as("va"))), Seq("source_a"))
      .join(broadcast(sizes.select($"source".as("source_b"),
        $"vocab".as("vb"))), Seq("source_b"))
      .select($"source_a", $"source_b", $"inter",
        ($"va" + $"vb" - $"inter").as("uni"))
      .withColumn("jaccard_permille", expr("(1000 * inter) div uni"))
      .orderBy($"source_a", $"source_b")
  }

  def q322Sql: String =
    """WITH ts AS (
         SELECT DISTINCT source, t.token AS t
         FROM documents,
           unnest(regexp_split_to_array(trim(text), '\s+')) AS t(token)
         WHERE t.token <> ''),
       sizes AS (
         SELECT source, CAST(count(*) AS BIGINT) AS vocab
         FROM ts GROUP BY 1),
       inter AS (
         SELECT a.source AS source_a, b.source AS source_b,
           CAST(count(*) AS BIGINT) AS inter
         FROM ts a JOIN ts b ON a.t = b.t AND a.source < b.source
         GROUP BY 1, 2)
       SELECT source_a, source_b, inter,
         CAST(sa.vocab + sb.vocab - inter AS BIGINT) AS uni,
         (1000 * inter) // (sa.vocab + sb.vocab - inter)
           AS jaccard_permille
       FROM inter
       JOIN sizes sa ON sa.source = source_a
       JOIN sizes sb ON sb.source = source_b
       ORDER BY source_a, source_b"""

  /** q323 — QUOTA-CONSTRAINED TOP-K SELECTION: the 50 highest-quality
    * documents overall, but no source may contribute more than 5 —
    * the eval-set builder's diversity cap. Per-source rank first (a
    * source-partitioned window), quota filter, then the global top-50
    * via orderBy+limit — which plans as TakeOrderedAndProject (per-
    * partition heaps + a k-row driver merge), never a global sort.
    *
    * Ties: quality permille then doc_id ascending, both ranks — fully
    * deterministic. */
  def q323QuotaTopK(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val scored = Tables.documents(spark, sfDir)
      .select($"doc_id", $"source",
        expr("(1000 * length(regexp_replace(text, '[^a-zA-Z]', ''))) " +
          "div greatest(length(text), 1)").as("qp"))
    val bySource = Window.partitionBy($"source")
      .orderBy($"qp".desc, $"doc_id")
    scored
      .withColumn("src_rank", row_number().over(bySource).cast("long"))
      .filter($"src_rank" <= 5)
      .orderBy($"qp".desc, $"doc_id")
      .limit(50)
      .select($"doc_id", $"source", $"qp", $"src_rank")
  }

  def q323Sql: String =
    """WITH scored AS (
         SELECT doc_id, source,
           (1000 * length(regexp_replace(text, '[^a-zA-Z]', '', 'g')))
             // greatest(length(text), 1) AS qp
         FROM documents),
       ranked AS (
         SELECT doc_id, source, qp,
           CAST(row_number() OVER (PARTITION BY source
             ORDER BY qp DESC, doc_id) AS BIGINT) AS src_rank
         FROM scored)
       SELECT doc_id, source, qp, src_rank
       FROM ranked WHERE src_rank <= 5
       ORDER BY qp DESC, doc_id LIMIT 50"""
}
