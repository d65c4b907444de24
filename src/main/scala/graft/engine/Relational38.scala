package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Fifty-sixth query wave: three more curation-pipeline operators —
  * the MassiveText-style inter-document repeated-span coverage audit
  * (how much of each source is 5-gram boilerplate shared across ≥3
  * docs, measured as exact covered-TOKEN mass via per-doc interval
  * union), a one-pass deterministic bootstrap (16 hash-derived
  * resamples in a single scan — the variance estimate a mean-quality
  * number needs before anyone acts on it), and exact largest-remainder
  * (Hamilton) apportionment of a fixed sampling budget across sources.
  */
object Relational38 {

  /** q310 — REPEATED-SPAN COVERAGE: a 5-gram is boilerplate when it
    * occurs in ≥3 distinct documents; per document, the tokens covered
    * by at least one boilerplate occurrence form a union of [i, i+4]
    * intervals, merged exactly by the classic running-max sweep
    * (prev-max-end per doc, each interval contributes only its
    * uncovered suffix). Per source: flagged docs, covered token mass,
    * permille — the decision input for span-level (vs doc-level)
    * dedup.
    *
    * Scale: the gram shuffle is THE operator (row-scale by design —
    * at 100 TB the gram key becomes a 64-bit hash instead of the
    * string; the md5-string form here keeps the oracle portable); the
    * interval sweep windows are partitioned per doc. */
  def q310SpanCoverage(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val toks = Tables.documents(spark, sfDir)
      .select($"doc_id", $"source", TextFunctions.tokens($"text").as("tk"))
    val grams = toks
      .filter(size($"tk") >= 5)
      .select($"doc_id", $"source", posexplode(expr(
        "transform(sequence(1, size(tk) - 4), i -> concat_ws(' ', slice(tk, i, 5)))"))
        .as(Seq("p", "gram")))
      .select($"doc_id", $"source", ($"p" + 1).as("start"), $"gram")
    val boiler = grams.groupBy($"gram")
      .agg(countDistinct($"doc_id").as("nd"))
      .filter($"nd" >= 3)
      .select($"gram")
    val marks = grams.join(boiler, Seq("gram"))
      .select($"doc_id", $"start")
    val byDoc = Window.partitionBy($"doc_id").orderBy($"start")
    val covered = marks
      .withColumn("pm", max($"start" + 4).over(
        byDoc.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("add", greatest(lit(0),
        ($"start" + 4) - greatest(coalesce($"pm", lit(0)), $"start" - 1)))
      .groupBy($"doc_id")
      .agg(sum($"add".cast("long")).as("cov"))
    toks.select($"doc_id", $"source", size($"tk").cast("long").as("n"))
      .join(covered, Seq("doc_id"), "left")
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        count($"cov").as("n_flagged"),
        sum($"n").as("n_tokens"),
        coalesce(sum($"cov"), lit(0L)).as("n_covered"))
      .withColumn("cov_permille", expr("(1000 * n_covered) div n_tokens"))
      .orderBy($"source")
  }

  def q310Sql: String =
    """WITH toks AS (
         SELECT doc_id, source,
           regexp_split_to_array(trim(text), '\s+') AS tk
         FROM documents),
       g AS (
         SELECT doc_id, source, i AS start,
           tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] || ' ' ||
             tk[i+3] || ' ' || tk[i+4] AS gram
         FROM (SELECT doc_id, source, tk,
                 unnest(range(1, greatest(len(tk) - 3, 1))) AS i
               FROM toks)),
       boiler AS (
         SELECT gram FROM g GROUP BY gram
         HAVING count(DISTINCT doc_id) >= 3),
       marks AS (
         SELECT g.doc_id, g.start FROM g JOIN boiler USING (gram)),
       sweep AS (
         SELECT doc_id, start,
           max(start + 4) OVER (PARTITION BY doc_id ORDER BY start
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
         FROM marks),
       cov AS (
         SELECT doc_id,
           CAST(sum(greatest(0,
             (start + 4) - greatest(coalesce(pm, 0), start - 1))) AS BIGINT)
             AS cov
         FROM sweep GROUP BY doc_id),
       base AS (
         SELECT t.source, t.doc_id, CAST(len(t.tk) AS BIGINT) AS n, c.cov
         FROM toks t LEFT JOIN cov c USING (doc_id))
       SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(count(cov) AS BIGINT) AS n_flagged,
         CAST(sum(n) AS BIGINT) AS n_tokens,
         CAST(coalesce(sum(cov), 0) AS BIGINT) AS n_covered,
         (1000 * CAST(coalesce(sum(cov), 0) AS BIGINT))
           // CAST(sum(n) AS BIGINT) AS cov_permille
       FROM base GROUP BY source ORDER BY source"""

  /** q311 — ONE-PASS DETERMINISTIC BOOTSTRAP of mean document quality
    * per source: 16 resamples whose per-doc multiplicities m ∈
    * {0,1,2} (P = ¼/½/¼, mean 1 — the Poisson(1) surrogate) derive
    * from the first hex char of md5(doc_id:b), so every engine and
    * every rerun draws the same "random" sample. Emits per (source,
    * resample) the weighted count and weighted quality-permille sum —
    * the exact sufficient statistics of each resample mean; variance
    * across the 16 ratios is downstream arithmetic.
    *
    * Scale: ONE corpus scan exploded ×16 (a projection, no extra
    * shuffle beyond the final 16·|sources|-row aggregate) — versus 16
    * actual passes. */
  def q311Bootstrap(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .select($"source", $"doc_id",
        expr("(1000 * length(regexp_replace(text, '[^a-zA-Z]', ''))) " +
          "div greatest(length(text), 1)").as("qp"))
      .select($"source", $"doc_id", $"qp",
        explode(sequence(lit(0), lit(15))).as("b"))
      .withColumn("h",
        substring(md5(concat($"doc_id".cast("string"), lit(":"),
          $"b".cast("string"))), 1, 1))
      .withColumn("m",
        when($"h" < "4", 0L).when($"h" >= "c", 2L).otherwise(1L))
      .groupBy($"source", $"b")
      .agg(sum($"m").as("sum_w"), sum($"m" * $"qp").as("sum_wq"))
      .orderBy($"source", $"b")
  }

  def q311Sql: String =
    """WITH d AS (
         SELECT source, doc_id,
           (1000 * length(regexp_replace(text, '[^a-zA-Z]', '', 'g')))
             // greatest(length(text), 1) AS qp
         FROM documents),
       e AS (
         SELECT source, doc_id, qp, unnest(range(0, 16)) AS b FROM d),
       m AS (
         SELECT source, CAST(b AS INT) AS b, qp,
           CASE WHEN substr(md5(CAST(doc_id AS VARCHAR) || ':' ||
                  CAST(b AS VARCHAR)), 1, 1) < '4' THEN 0
                WHEN substr(md5(CAST(doc_id AS VARCHAR) || ':' ||
                  CAST(b AS VARCHAR)), 1, 1) >= 'c' THEN 2
                ELSE 1 END AS mult
         FROM e)
       SELECT source, b, CAST(sum(mult) AS BIGINT) AS sum_w,
         CAST(sum(mult * qp) AS BIGINT) AS sum_wq
       FROM m GROUP BY source, b ORDER BY source, b"""

  /** q312 — HAMILTON (largest-remainder) APPORTIONMENT of a 10000-slot
    * sampling budget across sources proportional to token mass: floor
    * shares first, then the leftover slots go to the largest
    * remainders (ties broken by source name — total ALWAYS lands
    * exactly on the budget, which proportional rounding does not
    * guarantee). The exactness invariant Σseats = 10000 is
    * spec-asserted.
    *
    * Scale: everything after the per-source token aggregate runs on
    * the |sources|-row frame (the global remainder-rank window is
    * bounded by the source domain — allowlisted). */
  def q312Apportionment(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val S = 10000L
    val t = Tables.documents(spark, sfDir)
      .select($"source", TextFunctions.tokenCount($"text").cast("long").as("wc"))
      .groupBy($"source").agg(sum($"wc").as("n_tokens"))
    val tot = t.agg(sum($"n_tokens").as("tt"))
    val based = t.crossJoin(broadcast(tot))
      .withColumn("base", expr(s"($S * n_tokens) div tt"))
      .withColumn("rem", expr(s"($S * n_tokens) % tt"))
    val deficit = based.agg((lit(S) - sum($"base")).as("deficit"))
    based.crossJoin(broadcast(deficit))
      .withColumn("rk", row_number().over(
        Window.orderBy($"rem".desc, $"source")))
      .withColumn("extra", when($"rk" <= $"deficit", 1L).otherwise(0L))
      .select($"source", $"n_tokens", $"base", $"extra",
        ($"base" + $"extra").as("seats"))
      .orderBy($"source")
  }

  def q312Sql: String = {
    val wc = TextFunctions.tokenCountSql("text")
    s"""WITH t AS (
         SELECT source, CAST(sum($wc) AS BIGINT) AS n_tokens
         FROM documents GROUP BY source),
       tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS tt FROM t),
       based AS (
         SELECT source, n_tokens,
           (10000 * n_tokens) // tt AS base,
           (10000 * n_tokens) % tt AS rem
         FROM t, tot),
       def AS (SELECT 10000 - CAST(sum(base) AS BIGINT) AS deficit FROM based),
       ranked AS (
         SELECT source, n_tokens, base, rem,
           row_number() OVER (ORDER BY rem DESC, source) AS rk
         FROM based)
       SELECT source, n_tokens, CAST(base AS BIGINT) AS base,
         CAST(CASE WHEN rk <= deficit THEN 1 ELSE 0 END AS BIGINT) AS extra,
         CAST(base + CASE WHEN rk <= deficit THEN 1 ELSE 0 END AS BIGINT)
           AS seats
       FROM ranked, def ORDER BY source"""
  }
}
