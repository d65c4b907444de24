package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fifty-first query wave: EXACT distributed rank statistics — the
  * evaluation tier of a training-data pipeline. A quality classifier
  * is judged by its AUC, a fixture drift by a two-sample KS distance,
  * a feature association by tie-corrected Spearman — and at corpus
  * scale each must come from grouped counts + distributed prefix sums
  * (DistRank.withRunningSums), never a global sort or per-row global
  * window. All three emit exact INTEGER sufficient statistics, so the
  * cross-engine hash gate bites on every bit.
  *
  * Reference anchor: the reference's aggregations stop at grouped
  * counts/means (consumer.scala's groupBy counts); this wave is the
  * statistics tier built on the same grouped-count machinery.
  */
object Relational36 {

  /** q297 — EXACT AUC (Mann–Whitney, tie-aware) of a deterministic
    * quality score against a binary label. Score: Latin-alphabet
    * ratio permille of the document text; label: lang = 'en' (the
    * score should separate Latin-script English from zh docs, less so
    * from de/es/fr — AUC quantifies exactly how much). Ties handled
    * by midrank: AUC = Σ_s np(s)·(nnBelow(s) + nn(s)/2) / (np·nn),
    * emitted as the ×2 integer numerator so no division rounds.
    *
    * Scale: one corpus scan folds to a ≤1001-row score histogram
    * (permille domain bounds it by CONSTRUCTION — the global window
    * over it is the documented tiny-frame exception, allowlisted in
    * PlanAssertionsSpec); everything after is arithmetic on that
    * frame. */
  def q297QualityAuc(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val scored = Tables.documents(spark, sfDir).select(
      expr("(1000 * length(regexp_replace(text, '[^a-zA-Z]', ''))) " +
        "div greatest(length(text), 1)").as("score"),
      when($"lang" === "en", 1L).otherwise(0L).as("pos"))
    val byScore = scored.groupBy($"score")
      .agg(sum($"pos").as("np"), sum(lit(1L) - $"pos").as("nn"))
    // ≤1001-row frame by construction: permille scores live in [0,1000]
    val below = Window.orderBy($"score")
      .rowsBetween(Window.unboundedPreceding, -1)
    byScore
      .withColumn("nn_below", coalesce(sum($"nn").over(below), lit(0L)))
      .agg(sum($"np").as("n_pos"), sum($"nn").as("n_neg"),
        sum($"np" * ($"nn_below" * 2 + $"nn")).as("auc_num2"))
      .select($"n_pos", $"n_neg", $"auc_num2",
        expr("(1000 * auc_num2) div (2 * n_pos * n_neg)").as("auc_permille"))
  }

  def q297Sql: String =
    """WITH scored AS (
         SELECT (1000 * length(regexp_replace(text, '[^a-zA-Z]', '', 'g')))
                  // greatest(length(text), 1) AS score,
                CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
         FROM documents),
       by_score AS (
         SELECT score, CAST(sum(pos) AS BIGINT) AS np,
                CAST(sum(1 - pos) AS BIGINT) AS nn
         FROM scored GROUP BY 1),
       cum AS (
         SELECT np, nn,
           CAST(coalesce(sum(nn) OVER (ORDER BY score
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
             AS nn_below
         FROM by_score),
       agg AS (
         SELECT CAST(sum(np) AS BIGINT) AS n_pos,
                CAST(sum(nn) AS BIGINT) AS n_neg,
                CAST(sum(np * (nn_below * 2 + nn)) AS BIGINT) AS auc_num2
         FROM cum)
       SELECT n_pos, n_neg, auc_num2,
         (1000 * auc_num2) // (2 * n_pos * n_neg) AS auc_permille
       FROM agg"""

  /** q298 — EXACT two-sample Kolmogorov–Smirnov distance between the
    * order-value distributions of two customer segments, as the
    * integer numerator max|cumA·nB − cumB·nA| over the pooled distinct
    * value grid (D = that / (nA·nB)) — the drift gate a pipeline runs
    * between a reference corpus slice and a new ingest batch.
    *
    * Scale: order values fold to one row per distinct cent value with
    * both segments' counts; the CDFs come from ONE
    * DistRank.withRunningSums pass (bucketed two-level prefix sums —
    * the distinct-value frame is row-scale, so no global window may
    * touch it); the max folds on the same frame. */
  def q298KsDrift(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val cust = Tables.customer(spark, sfDir)
      .filter($"c_mktsegment".isin("BUILDING", "MACHINERY"))
      .select($"c_custkey", $"c_mktsegment")
    val byV = Tables.orders(spark, sfDir)
      .select($"o_custkey", Exact.cents($"o_totalprice").as("v"))
      .join(cust, $"o_custkey" === $"c_custkey")
      .groupBy($"v")
      .agg(
        sum(when($"c_mktsegment" === "BUILDING", 1L).otherwise(0L)).as("a"),
        sum(when($"c_mktsegment" === "MACHINERY", 1L).otherwise(0L)).as("b"))
    val cum = DistRank.withRunningSums(byV, "v", "v",
      Seq("a" -> "cum_a", "b" -> "cum_b"))
    val totals = byV.agg(sum($"a").as("n_a"), sum($"b").as("n_b"))
    cum.crossJoin(broadcast(totals))
      .agg(max($"n_a").as("n_a"), max($"n_b").as("n_b"),
        max(abs($"cum_a" * $"n_b" - $"cum_b" * $"n_a")).as("ks_num"))
      .select($"n_a", $"n_b", $"ks_num",
        expr("(1000 * ks_num) div (n_a * n_b)").as("ks_permille"))
  }

  def q298Sql: String =
    """WITH j AS (
         SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                  AS v, c_mktsegment AS seg
         FROM orders JOIN customer ON o_custkey = c_custkey
         WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')),
       by_v AS (
         SELECT v,
           CAST(sum(CASE WHEN seg = 'BUILDING' THEN 1 ELSE 0 END) AS BIGINT)
             AS a,
           CAST(sum(CASE WHEN seg = 'MACHINERY' THEN 1 ELSE 0 END) AS BIGINT)
             AS b
         FROM j GROUP BY 1),
       cum AS (
         SELECT
           CAST(sum(a) OVER (ORDER BY v) AS BIGINT) AS cum_a,
           CAST(sum(b) OVER (ORDER BY v) AS BIGINT) AS cum_b
         FROM by_v),
       tot AS (
         SELECT CAST(sum(a) AS BIGINT) AS n_a, CAST(sum(b) AS BIGINT) AS n_b
         FROM by_v),
       agg AS (
         SELECT n_a, n_b,
           CAST(max(abs(cum_a * n_b - cum_b * n_a)) AS BIGINT) AS ks_num
         FROM cum, tot GROUP BY n_a, n_b)
       SELECT n_a, n_b, ks_num, (1000 * ks_num) // (n_a * n_b) AS ks_permille
       FROM agg"""

  /** q299 — tie-corrected SPEARMAN sufficient statistics between order
    * value and order date: n, Σd² (d = midrank2(x) − midrank2(y),
    * midrank2 = 2·average rank = 2·cntBelow + cntAt + 1, an integer
    * even under ties), and the tie-correction masses Σ(t³−t) for each
    * variable. Downstream, ρ = (Sx + Sy − Σd²/4) / (2·√(Sx·Sy)) with
    * S = (n³−n−T)/12 — kept OUT of the query so every emitted column
    * stays an exact integer.
    *
    * Scale: each variable folds to its distinct-value frame, takes
    * midranks from one withRunningSums pass, and joins back on the
    * value key it was grouped by — co-partitioned with its own
    * aggregate, so the join-back reuses the groupBy shuffle. The row
    * frame shuffles once per variable (by x, then by y). */
  def q299SpearmanStats(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val rows = Tables.orders(spark, sfDir).select(
      Exact.cents($"o_totalprice").as("x"),
      datediff(to_date($"o_orderdate"), to_date(lit("1995-01-01")))
        .cast("long").as("y"))
    def midranks2(varName: String): DataFrame = {
      val grouped = rows.groupBy(col(varName))
        .agg(count(lit(1)).as("t"))
      DistRank.withRunningSums(grouped, varName, varName,
          Seq("t" -> "cum"))
        .select(col(varName),
          (col("cum") * 2 - col("t") + 1).as(s"r2_$varName"),
          col("t").as(s"t_$varName"))
    }
    val rx = midranks2("x")
    val ry = midranks2("y")
    val ranked = rows.join(rx, Seq("x")).join(ry, Seq("y"))
    val ties = (v: String) =>
      rows.groupBy(col(v)).agg(count(lit(1)).as("t"))
        .agg(sum($"t" * $"t" * $"t" - $"t").as(s"tie_$v"))
    ranked
      .agg(count(lit(1)).as("n"),
        sum(($"r2_x" - $"r2_y") * ($"r2_x" - $"r2_y")).as("sum_d2"))
      .crossJoin(broadcast(ties("x")))
      .crossJoin(broadcast(ties("y")))
      .select($"n", $"sum_d2", $"tie_x", $"tie_y")
  }

  def q299Sql: String =
    """WITH rows_ AS (
         SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                  AS x,
                CAST(CAST(o_orderdate AS DATE) - DATE '1995-01-01' AS BIGINT)
                  AS y
         FROM orders),
       rx AS (
         SELECT x,
           CAST(2 * sum(count(*)) OVER (ORDER BY x) - count(*) + 1 AS BIGINT)
             AS r2_x
         FROM rows_ GROUP BY x),
       ry AS (
         SELECT y,
           CAST(2 * sum(count(*)) OVER (ORDER BY y) - count(*) + 1 AS BIGINT)
             AS r2_y
         FROM rows_ GROUP BY y),
       tx AS (
         SELECT CAST(sum(t*t*t - t) AS BIGINT) AS tie_x
         FROM (SELECT count(*) AS t FROM rows_ GROUP BY x)),
       ty AS (
         SELECT CAST(sum(t*t*t - t) AS BIGINT) AS tie_y
         FROM (SELECT count(*) AS t FROM rows_ GROUP BY y)),
       d AS (
         SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(sum((r2_x - r2_y) * (r2_x - r2_y)) AS BIGINT) AS sum_d2
         FROM rows_ JOIN rx USING (x) JOIN ry USING (y))
       SELECT n, sum_d2, tie_x, tie_y FROM d, tx, ty"""
}
