package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Fifty-fourth query wave: corpus-curation audit statistics — the
  * numbers a data team reads before committing a training mix:
  * vocabulary growth (is the corpus still contributing new types?),
  * labeler agreement (is the cheap classifier trustworthy?), token
  * concentration (is one source a few mega-docs in a trench coat?),
  * and coverage depth (how deep until 50%/90% of the mass?).
  * Everything stays exact-integer end to end.
  */
object Relational37 {

  /** q304 — VOCABULARY GROWTH (Heaps-law curve): the corpus in 16
    * doc_id-order slices; per slice, cumulative token count and
    * cumulative DISTINCT vocabulary. The distinct-cumulative is the
    * trick: counting distinct types per prefix directly would be 16
    * corpus-wide distincts; instead each type maps to its FIRST-SEEN
    * slice (one groupBy over the exploded tokens), new-type counts
    * fold per slice, and a prefix sum over the 16-row frame rebuilds
    * the curve — one explode pass, ever.
    *
    * Scale: the explode is the corpus tokenization (row-scale, one
    * shuffle on token for first-seen); both per-slice frames are
    * 16 rows, and the only global window runs over them (bounded by
    * the slice constant — allowlisted). Slice bounds ride a broadcast
    * scalar, not a driver round-trip. */
  def q304VocabGrowth(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
      .select($"doc_id", TextFunctions.tokens($"text").as("toks"))
    val bounds = docs.agg(min($"doc_id").as("lo"), max($"doc_id").as("hi"))
    val tok = docs.crossJoin(broadcast(bounds))
      .select(expr("((doc_id - lo) * 16) div (hi - lo + 1)").as("bucket"),
        explode($"toks").as("token"))
      .filter($"token" =!= "")
    val newVocab = tok.groupBy($"token").agg(min($"bucket").as("bucket"))
      .groupBy($"bucket").agg(count(lit(1)).as("nv"))
    val nTokens = tok.groupBy($"bucket").agg(count(lit(1)).as("nt"))
    val w = Window.orderBy($"bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    nTokens.join(newVocab, Seq("bucket"), "left")
      .na.fill(0L, Seq("nv"))
      .select($"bucket",
        sum($"nt").over(w).as("cum_tokens"),
        sum($"nv").over(w).as("cum_vocab"))
      .orderBy($"bucket")
  }

  def q304Sql: String =
    """WITH b AS (SELECT min(doc_id) AS lo, max(doc_id) AS hi FROM documents),
       tok AS (
         SELECT ((d.doc_id - b.lo) * 16) // (b.hi - b.lo + 1) AS bucket,
                t.token
         FROM documents d CROSS JOIN b
         CROSS JOIN unnest(regexp_split_to_array(trim(d.text), '\s+'))
           AS t(token)
         WHERE t.token <> ''),
       nv AS (
         SELECT bucket, count(*) AS nv FROM (
           SELECT token, min(bucket) AS bucket FROM tok GROUP BY token)
         GROUP BY bucket),
       nt AS (SELECT bucket, count(*) AS nt FROM tok GROUP BY bucket)
       SELECT nt.bucket,
         CAST(sum(nt.nt) OVER (ORDER BY nt.bucket
           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens,
         CAST(sum(coalesce(nv.nv, 0)) OVER (ORDER BY nt.bucket
           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_vocab
       FROM nt LEFT JOIN nv USING (bucket) ORDER BY bucket"""

  /** q305 — COHEN'S KAPPA sufficient statistics for the langId
    * heuristic against the labeled lang column: n, observed-agreement
    * count O, and the chance-agreement mass Σ_label row(label)·col
    * (label). κ = (n·O − Σrc) / (n² − Σrc) downstream — kept out of
    * the query because κ can be negative and floor-vs-truncate
    * integer division diverges across engines on negatives (the
    * repo's cross-engine division rule).
    *
    * Scale: one scan for the confusion counts; marginals re-aggregate
    * the |labels|² confusion frame; the marginal-product join runs on
    * the ≤8-label domain. */
  def q305KappaStats(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val conf = Tables.documents(spark, sfDir)
      .select($"lang", TextFunctions.langId($"text").as("pred"))
      .groupBy($"lang", $"pred").agg(count(lit(1)).as("c"))
    val rows = conf.groupBy($"lang").agg(sum($"c").as("rc"))
    val cols = conf.groupBy($"pred").agg(sum($"c").as("cc"))
    val chance = rows.join(cols, $"lang" === $"pred")
      .agg(coalesce(sum($"rc" * $"cc"), lit(0L)).as("chance_mass"))
    val agree = conf.agg(sum($"c").as("n"),
      coalesce(sum(when($"lang" === $"pred", $"c")), lit(0L)).as("observed"))
    agree.crossJoin(broadcast(chance))
      .select($"n", $"observed", $"chance_mass")
  }

  def q305Sql: String = {
    val pred = TextFunctions.langIdSql("text")
    s"""WITH conf AS (
         SELECT lang, $pred AS pred, CAST(count(*) AS BIGINT) AS c
         FROM documents GROUP BY 1, 2),
       r AS (SELECT lang, CAST(sum(c) AS BIGINT) AS rc FROM conf GROUP BY 1),
       co AS (SELECT pred, CAST(sum(c) AS BIGINT) AS cc FROM conf GROUP BY 1),
       ch AS (
         SELECT CAST(coalesce(sum(rc * cc), 0) AS BIGINT) AS chance_mass
         FROM r JOIN co ON lang = pred),
       ag AS (
         SELECT CAST(sum(c) AS BIGINT) AS n,
           CAST(coalesce(sum(CASE WHEN lang = pred THEN c END), 0) AS BIGINT)
             AS observed
         FROM conf)
       SELECT n, observed, chance_mass FROM ag, ch"""
  }

  /** q306 — GINI token-mass concentration per source, from the
    * rank-weighted identity G = (2·Σ r·x − (n+1)·Σx) / (n·Σx) with
    * docs ranked ascending by (token count, doc_id). Equal token
    * counts make Σ r·x invariant to tie order (a tie block's rank sum
    * is fixed), so the permille is deterministic. All numerators are
    * non-negative — integer `div` is portable here.
    *
    * Scale: the rank window is PARTITIONED by source; the rollup is
    * |sources| rows. */
  def q306GiniConcentration(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val wc = Tables.documents(spark, sfDir)
      .select($"source", $"doc_id",
        TextFunctions.tokenCount($"text").cast("long").as("wc"))
    val ranked = wc.withColumn("r", row_number().over(
      Window.partitionBy($"source").orderBy($"wc", $"doc_id")).cast("long"))
    ranked.groupBy($"source")
      .agg(count(lit(1)).as("n_docs"), sum($"wc").as("n_tokens"),
        sum($"r" * $"wc").as("rank_mass"))
      .select($"source", $"n_docs", $"n_tokens",
        expr("(1000 * (2 * rank_mass - (n_docs + 1) * n_tokens)) " +
          "div (n_docs * n_tokens)").as("gini_permille"))
      .orderBy($"source")
  }

  def q306Sql: String = {
    val wc = TextFunctions.tokenCountSql("text")
    s"""WITH w AS (
         SELECT source, doc_id, CAST($wc AS BIGINT) AS wc FROM documents),
       ranked AS (
         SELECT source, wc,
           CAST(row_number() OVER (PARTITION BY source ORDER BY wc, doc_id)
             AS BIGINT) AS r
         FROM w),
       agg AS (
         SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(wc) AS BIGINT) AS n_tokens,
           CAST(sum(r * wc) AS BIGINT) AS rank_mass
         FROM ranked GROUP BY source)
       SELECT source, n_docs, n_tokens,
         (1000 * (2 * rank_mass - (n_docs + 1) * n_tokens))
           // (n_docs * n_tokens) AS gini_permille
       FROM agg ORDER BY source"""
  }

  /** q307 — COVERAGE DEPTH per source: how many of the largest docs
    * it takes to cover 50% and 90% of the source's token mass — the
    * "is this source a few mega-documents?" probe that q306's scalar
    * Gini can't localize. Docs rank descending by (token count,
    * doc_id); the partitioned running sum finds the first rank whose
    * cumulative mass crosses each threshold (integer cross-multiplied
    * — no division at all).
    *
    * Scale: both windows are source-partitioned; output is |sources|
    * rows. */
  def q307CoverageDepth(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val wc = Tables.documents(spark, sfDir)
      .select($"source", $"doc_id",
        TextFunctions.tokenCount($"text").cast("long").as("wc"))
    val byDesc = Window.partitionBy($"source").orderBy($"wc".desc, $"doc_id")
    val ranked = wc
      .withColumn("r", row_number().over(byDesc).cast("long"))
      .withColumn("cum", sum($"wc").over(
        byDesc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("tot", sum($"wc").over(Window.partitionBy($"source")))
    ranked.groupBy($"source")
      .agg(count(lit(1)).as("n_docs"), max($"tot").as("n_tokens"),
        min(when($"cum" * 2 >= $"tot", $"r")).as("n50"),
        min(when($"cum" * 10 >= $"tot" * 9, $"r")).as("n90"))
      .orderBy($"source")
  }

  def q307Sql: String = {
    val wc = TextFunctions.tokenCountSql("text")
    s"""WITH w AS (
         SELECT source, doc_id, CAST($wc AS BIGINT) AS wc FROM documents),
       ranked AS (
         SELECT source, wc,
           CAST(row_number() OVER (PARTITION BY source
             ORDER BY wc DESC, doc_id) AS BIGINT) AS r,
           CAST(sum(wc) OVER (PARTITION BY source
             ORDER BY wc DESC, doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
             AS cum,
           CAST(sum(wc) OVER (PARTITION BY source) AS BIGINT) AS tot
         FROM w)
       SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(max(tot) AS BIGINT) AS n_tokens,
         CAST(min(CASE WHEN cum * 2 >= tot THEN r END) AS BIGINT) AS n50,
         CAST(min(CASE WHEN cum * 10 >= tot * 9 THEN r END) AS BIGINT) AS n90
       FROM ranked GROUP BY source ORDER BY source"""
  }
}
