package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Fifty-seventh query wave: grouped order statistics at scale —
  * weighted quantiles and trimmed means — built on
  * [[DistRank.withGroupedRunningSums]], the grouped two-level
  * prefix-sum primitive. The naive formulation (a window partitioned
  * by the group over the raw rows) funnels each group through ONE
  * WindowExec partition — a group holding 30% of a 100 TB corpus is a
  * 30 TB sort on one task. Here every sort happens inside a
  * (group × value-bucket) cell and the cross-bucket lift is a
  * broadcast-sized triangular join.
  */
object Relational39 {

  /** q313 — TOKEN-WEIGHTED length quantiles per language: the median
    * and p90 TOKEN sits in a document of how many tokens? (Weighted by
    * token mass, not doc count — the length that matters for packing
    * and truncation budgets.) Exact: fold docs to (lang, length)
    * weight cells, grouped running weight, then the smallest length
    * whose cumulative weight crosses half (resp. 9/10) of the lang's
    * mass — integer cross-multiplied, no division. */
  def q313WeightedQuantiles(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val byLen = Tables.documents(spark, sfDir)
      .select($"lang", TextFunctions.tokenCount($"text").cast("long").as("wc"))
      .groupBy($"lang", $"wc")
      .agg(count(lit(1)).as("n"), sum($"wc").as("w"))
    val cum = DistRank.withGroupedRunningSums(byLen, Seq("lang"),
      "wc", "wc", Seq("w" -> "cumw"))
    val totals = byLen.groupBy($"lang")
      .agg(sum($"n").as("n_docs"), sum($"w").as("n_tokens"))
    cum.join(broadcast(totals), Seq("lang"))
      .groupBy($"lang")
      .agg(max($"n_docs").as("n_docs"), max($"n_tokens").as("n_tokens"),
        min(when($"cumw" * 2 >= $"n_tokens", $"wc")).as("med_len"),
        min(when($"cumw" * 10 >= $"n_tokens" * 9, $"wc")).as("p90_len"))
      .orderBy($"lang")
  }

  def q313Sql: String = {
    val wc = TextFunctions.tokenCountSql("text")
    s"""WITH d AS (
         SELECT lang, CAST($wc AS BIGINT) AS wc FROM documents),
       cells AS (
         SELECT lang, wc, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(wc) AS BIGINT) AS w
         FROM d GROUP BY 1, 2),
       cum AS (
         SELECT lang, wc, n, w,
           CAST(sum(w) OVER (PARTITION BY lang ORDER BY wc
             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumw
         FROM cells),
       tot AS (
         SELECT lang, CAST(sum(n) AS BIGINT) AS n_docs,
           CAST(sum(w) AS BIGINT) AS n_tokens
         FROM cells GROUP BY 1)
       SELECT lang, max(n_docs) AS n_docs, max(n_tokens) AS n_tokens,
         CAST(min(CASE WHEN cumw * 2 >= n_tokens THEN wc END) AS BIGINT)
           AS med_len,
         CAST(min(CASE WHEN cumw * 10 >= n_tokens * 9 THEN wc END) AS BIGINT)
           AS p90_len
       FROM cum JOIN tot USING (lang) GROUP BY lang ORDER BY lang"""
  }

  /** q314 — EXACT TRIMMED MEAN of order value per market segment: drop
    * exactly ⌊n/20⌋ orders from each tail (by value, ties in a cell
    * trimmed together by mass — the cell overlap formula
    * kept = max(0, min(cum, hi) − max(cum − cnt, lo)) slices partial
    * cells exactly), then the mean of what remains. The robust
    * location estimate a revenue dashboard should show instead of a
    * mean that one mega-order can drag.
    *
    * Scale: same grouped prefix-sum primitive; the only per-row work
    * is the (segment, cents) cell fold. */
  def q314TrimmedMean(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val cells = Tables.orders(spark, sfDir)
      .join(Tables.customer(spark, sfDir),
        $"o_custkey" === $"c_custkey")
      .select($"c_mktsegment".as("seg"), Exact.cents($"o_totalprice").as("v"))
      .groupBy($"seg", $"v")
      .agg(count(lit(1)).as("cnt"), sum($"v").as("sv"))
    val cum = DistRank.withGroupedRunningSums(cells, Seq("seg"),
      "v", "v", Seq("cnt" -> "cum"))
    val totals = cells.groupBy($"seg").agg(sum($"cnt").as("n"))
    cum.join(broadcast(totals), Seq("seg"))
      .withColumn("lo", expr("n div 20"))
      .withColumn("hi", $"n" - expr("n div 20"))
      .withColumn("kept", greatest(lit(0L),
        least($"cum", $"hi") - greatest($"cum" - $"cnt", $"lo")))
      .groupBy($"seg")
      .agg(max($"n").as("n_orders"),
        max($"hi" - $"lo").as("n_kept"),
        sum($"kept" * $"v").as("trimmed_cents"))
      .withColumn("trimmed_mean_cents",
        expr("trimmed_cents div n_kept"))
      .orderBy($"seg")
  }

  def q314Sql: String =
    """WITH j AS (
         SELECT c_mktsegment AS seg,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
         FROM orders JOIN customer ON o_custkey = c_custkey),
       cells AS (
         SELECT seg, v, CAST(count(*) AS BIGINT) AS cnt FROM j GROUP BY 1, 2),
       cum AS (
         SELECT seg, v, cnt,
           CAST(sum(cnt) OVER (PARTITION BY seg ORDER BY v
             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
         FROM cells),
       tot AS (SELECT seg, CAST(sum(cnt) AS BIGINT) AS n FROM cells GROUP BY 1),
       sliced AS (
         SELECT seg, v, cnt, cum, n, n // 20 AS lo, n - n // 20 AS hi
         FROM cum JOIN tot USING (seg))
       SELECT seg, max(n) AS n_orders,
         CAST(max(hi - lo) AS BIGINT) AS n_kept,
         CAST(sum(greatest(0, least(cum, hi) - greatest(cum - cnt, lo)) * v)
           AS BIGINT) AS trimmed_cents,
         CAST(sum(greatest(0, least(cum, hi) - greatest(cum - cnt, lo)) * v)
           AS BIGINT) // CAST(max(hi - lo) AS BIGINT) AS trimmed_mean_cents
       FROM sliced GROUP BY seg ORDER BY seg"""
}
