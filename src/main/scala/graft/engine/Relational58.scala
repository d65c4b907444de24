package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Seventy-seventh query wave: q363 grouped Kendall concordance
  * (bounded-group pairwise statistics rolled up to nation level),
  * q364 filter-rule attribution (unique kills and leave-one-rule-out
  * retention for each curation rule in a single corpus scan), and
  * q365 leave-one-source-out corpus ablation from one rollup pass —
  * the ablation matrix a data-mixing pipeline consults before
  * dropping a source.
  */
object Relational58 {

  /** q363 — GROUPED KENDALL CONCORDANCE: for every customer, all
    * unordered pairs of their orders are classified by whether order
    * recency and order value move together (concordant), against each
    * other (discordant), or tie on either axis; counts roll up to
    * nation level together with the tau-b numerator C − D. All
    * outputs are exact integers — the tau-b denominator is a square
    * root, so it stays factored as its tie-adjusted counts, which is
    * what a downstream significance test wants anyway.
    *
    * Scale: the pair generation is a SELF-EQUI-JOIN ON o_custkey with
    * an orderkey inequality, so it shuffles once on the group key and
    * fans out only within a group; group size is the per-customer
    * order count (~Poisson(10) in the fixture, bounded by contract),
    * so the pair frame is a small constant multiple of the input —
    * never all-pairs global. The nation rollup is an ordinary
    * broadcast-dimension aggregate. */
  def q363KendallTau(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, sfDir).select(
      $"o_custkey".as("ck"), $"o_orderkey".as("ok"),
      datediff(to_date($"o_orderdate"), lit("1995-01-01"))
        .cast("long").as("d"),
      Exact.cents($"o_totalprice").as("pc"))
    val pairs = o.as("a").join(o.as("b"),
        $"a.ck" === $"b.ck" && $"a.ok" < $"b.ok")
      .select($"a.ck".as("ck"),
        ($"b.d" - $"a.d").as("dd"), ($"b.pc" - $"a.pc").as("dp"))
    val cls = pairs.select($"ck",
      when($"dd" =!= 0L && $"dp" =!= 0L &&
        ($"dd" > 0L) === ($"dp" > 0L), 1L).otherwise(0L).as("conc"),
      when($"dd" =!= 0L && $"dp" =!= 0L &&
        ($"dd" > 0L) =!= ($"dp" > 0L), 1L).otherwise(0L).as("disc"),
      when($"dd" === 0L && $"dp" =!= 0L, 1L).otherwise(0L).as("td"),
      when($"dp" === 0L && $"dd" =!= 0L, 1L).otherwise(0L).as("tp"),
      when($"dd" === 0L && $"dp" === 0L, 1L).otherwise(0L).as("tb"))
    val cust = Tables.customer(spark, sfDir)
      .select($"c_custkey", $"c_nationkey")
    val nation = Tables.nation(spark, sfDir)
      .select($"n_nationkey", $"n_name")
    TempIo.materialize(spark,
      cls.join(cust, cls("ck") === cust("c_custkey"))
        .join(broadcast(nation), $"c_nationkey" === $"n_nationkey")
        .groupBy($"n_name")
        .agg(count(lit(1)).as("n_pairs"),
          sum($"conc").as("concordant"),
          sum($"disc").as("discordant"),
          sum($"td").as("ties_date"),
          sum($"tp").as("ties_price"),
          sum($"tb").as("ties_both"),
          (sum($"conc") - sum($"disc")).as("tau_num"))
        .orderBy($"n_name"))
  }

  def q363Sql: String =
    """WITH o AS (
         SELECT o_custkey AS ck, o_orderkey AS ok,
           CAST(date_diff('day', DATE '1995-01-01',
             CAST(o_orderdate AS DATE)) AS BIGINT) AS d,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS pc
         FROM orders),
       pairs AS (
         SELECT a.ck, b.d - a.d AS dd, b.pc - a.pc AS dp
         FROM o a JOIN o b ON a.ck = b.ck AND a.ok < b.ok),
       cls AS (
         SELECT ck,
           CASE WHEN dd <> 0 AND dp <> 0 AND (dd > 0) = (dp > 0)
                THEN 1 ELSE 0 END AS conc,
           CASE WHEN dd <> 0 AND dp <> 0 AND (dd > 0) <> (dp > 0)
                THEN 1 ELSE 0 END AS disc,
           CASE WHEN dd = 0 AND dp <> 0 THEN 1 ELSE 0 END AS td,
           CASE WHEN dp = 0 AND dd <> 0 THEN 1 ELSE 0 END AS tp,
           CASE WHEN dd = 0 AND dp = 0 THEN 1 ELSE 0 END AS tb
         FROM pairs)
       SELECT n_name, CAST(count(*) AS BIGINT) AS n_pairs,
         CAST(sum(conc) AS BIGINT) AS concordant,
         CAST(sum(disc) AS BIGINT) AS discordant,
         CAST(sum(td) AS BIGINT) AS ties_date,
         CAST(sum(tp) AS BIGINT) AS ties_price,
         CAST(sum(tb) AS BIGINT) AS ties_both,
         CAST(sum(conc) - sum(disc) AS BIGINT) AS tau_num
       FROM cls
       JOIN customer ON ck = c_custkey
       JOIN nation ON c_nationkey = n_nationkey
       GROUP BY n_name ORDER BY n_name"""

  /** q364 — FILTER-RULE ATTRIBUTION: the q69 curation funnel reports
    * rules SEQUENTIALLY, which hides overlap — a rule late in the
    * chain gets no credit for documents an earlier rule already
    * killed. This query scores each of the five kill rules
    * independently in one scan: how often it fires at all, how often
    * it is the ONLY rule firing (its unique kills — the documents
    * that would survive if it were dropped), and the leave-one-out
    * retention (kept + unique kills), the number a pipeline owner
    * reads before relaxing a rule.
    *
    * Scale: one documents scan computes all five flags plus the
    * fingerprint-duplicate flag (one hash-partitioned window on fp);
    * everything after is a single 1-row aggregate stacked to five
    * labeled rows — driver-size by construction. */
  def q364RuleAttribution(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    import graft.functions.TextFunctions._
    val flags = Tables.documents(spark, sfDir)
      .select($"doc_id",
        (langId($"text") =!= "en").as("r_lang"),
        (qualityScore($"text") < 0.5).as("r_quality"),
        (tokenCount($"text") < 5).as("r_short"),
        (tokenCount($"text") > 5000).as("r_long"),
        fingerprint($"text").as("fp"))
      .withColumn("r_dup",
        $"doc_id" =!= min($"doc_id").over(Window.partitionBy($"fp")))
      .withColumn("n_fired",
        $"r_lang".cast("long") + $"r_quality".cast("long") +
          $"r_short".cast("long") + $"r_long".cast("long") +
          $"r_dup".cast("long"))
    val agg = flags.agg(
      count(when($"n_fired" === 0L, 1)).as("kept"),
      count(when($"r_lang", 1)).as("f_lang"),
      count(when($"r_lang" && $"n_fired" === 1L, 1)).as("u_lang"),
      count(when($"r_quality", 1)).as("f_quality"),
      count(when($"r_quality" && $"n_fired" === 1L, 1)).as("u_quality"),
      count(when($"r_short", 1)).as("f_short"),
      count(when($"r_short" && $"n_fired" === 1L, 1)).as("u_short"),
      count(when($"r_long", 1)).as("f_long"),
      count(when($"r_long" && $"n_fired" === 1L, 1)).as("u_long"),
      count(when($"r_dup", 1)).as("f_dup"),
      count(when($"r_dup" && $"n_fired" === 1L, 1)).as("u_dup"))
    def row(name: String, f: String, u: String) =
      agg.select(lit(name).as("rule"), col(f).as("fired"),
        col(u).as("unique_kills"),
        ($"kept" + col(u)).as("loo_retained"))
    TempIo.materialize(spark,
      row("dup", "f_dup", "u_dup")
        .unionByName(row("lang", "f_lang", "u_lang"))
        .unionByName(row("long", "f_long", "u_long"))
        .unionByName(row("quality", "f_quality", "u_quality"))
        .unionByName(row("short", "f_short", "u_short"))
        .orderBy($"rule"))
  }

  def q364Sql: String = {
    import graft.functions.TextFunctions._
    s"""WITH flags AS (
         SELECT doc_id,
           (${langIdSql("text")}) <> 'en' AS r_lang,
           (${qualityScoreSql("text")}) < 0.5 AS r_quality,
           (${tokenCountSql("text")}) < 5 AS r_short,
           (${tokenCountSql("text")}) > 5000 AS r_long,
           ${fingerprintSql("text")} AS fp
         FROM documents),
       d AS (
         SELECT *,
           doc_id <> min(doc_id) OVER (PARTITION BY fp) AS r_dup
         FROM flags),
       n AS (
         SELECT *,
           CAST(r_lang AS BIGINT) + CAST(r_quality AS BIGINT) +
           CAST(r_short AS BIGINT) + CAST(r_long AS BIGINT) +
           CAST(r_dup AS BIGINT) AS n_fired
         FROM d),
       agg AS (
         SELECT
           count(*) FILTER (WHERE n_fired = 0) AS kept,
           count(*) FILTER (WHERE r_lang) AS f_lang,
           count(*) FILTER (WHERE r_lang AND n_fired = 1) AS u_lang,
           count(*) FILTER (WHERE r_quality) AS f_quality,
           count(*) FILTER (WHERE r_quality AND n_fired = 1) AS u_quality,
           count(*) FILTER (WHERE r_short) AS f_short,
           count(*) FILTER (WHERE r_short AND n_fired = 1) AS u_short,
           count(*) FILTER (WHERE r_long) AS f_long,
           count(*) FILTER (WHERE r_long AND n_fired = 1) AS u_long,
           count(*) FILTER (WHERE r_dup) AS f_dup,
           count(*) FILTER (WHERE r_dup AND n_fired = 1) AS u_dup
         FROM n)
       SELECT rule, CAST(fired AS BIGINT) AS fired,
         CAST(unique_kills AS BIGINT) AS unique_kills,
         CAST(loo_retained AS BIGINT) AS loo_retained
       FROM (
         SELECT 'dup' AS rule, f_dup AS fired, u_dup AS unique_kills,
           kept + u_dup AS loo_retained FROM agg
         UNION ALL
         SELECT 'lang', f_lang, u_lang, kept + u_lang FROM agg
         UNION ALL
         SELECT 'long', f_long, u_long, kept + u_long FROM agg
         UNION ALL
         SELECT 'quality', f_quality, u_quality, kept + u_quality FROM agg
         UNION ALL
         SELECT 'short', f_short, u_short, kept + u_short FROM agg)
       ORDER BY rule"""
  }

  /** q365 — LEAVE-ONE-SOURCE-OUT CORPUS ABLATION: for every source,
    * the corpus-level doc/token counts and the English / quality
    * shares the corpus would have WITHOUT that source — the ablation
    * matrix consulted before dropping or down-weighting a source in a
    * data recipe. Shares are permille on non-negative integers, so
    * truncating and flooring division agree.
    *
    * Scale: ONE scan computes both grains via `rollup(source)` —
    * Catalyst expands it into a single hash aggregate with map-side
    * partials (per-source AND grand-total rows from the same pass, no
    * second scan, no self-join of aggregates); the grand-total row
    * then broadcasts back onto the |sources|-row frame. */
  def q365LooAblation(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import graft.functions.TextFunctions._
    val metr = Tables.documents(spark, sfDir)
      .select($"source",
        tokenCount($"text").cast("long").as("wc"),
        (langId($"text") === "en").cast("long").as("en"),
        (qualityScore($"text") >= 0.5).cast("long").as("hq"))
      .rollup($"source")
      .agg(count(lit(1)).as("docs"), sum($"wc").as("toks"),
        sum($"en").as("en"), sum($"hq").as("hq"))
    val total = metr.filter($"source".isNull)
      .select($"docs".as("t_docs"), $"toks".as("t_toks"),
        $"en".as("t_en"), $"hq".as("t_hq"))
    TempIo.materialize(spark,
      metr.filter($"source".isNotNull)
        .crossJoin(broadcast(total))
        .select($"source",
          ($"t_docs" - $"docs").as("loo_docs"),
          ($"t_toks" - $"toks").as("loo_toks"),
          expr("1000 * (t_en - en) div (t_docs - docs)")
            .as("loo_en_permille"),
          expr("1000 * (t_hq - hq) div (t_docs - docs)")
            .as("loo_q_permille"))
        .orderBy($"source"))
  }

  def q365Sql: String = {
    import graft.functions.TextFunctions._
    s"""WITH m AS (
         SELECT source,
           CAST(count(*) AS BIGINT) AS docs,
           CAST(sum(${tokenCountSql("text")}) AS BIGINT) AS toks,
           CAST(count(*) FILTER (WHERE (${langIdSql("text")}) = 'en')
             AS BIGINT) AS en,
           CAST(count(*) FILTER (WHERE (${qualityScoreSql("text")}) >= 0.5)
             AS BIGINT) AS hq
         FROM documents GROUP BY source),
       t AS (
         SELECT sum(docs) AS t_docs, sum(toks) AS t_toks,
           sum(en) AS t_en, sum(hq) AS t_hq FROM m)
       SELECT source,
         CAST(t_docs - docs AS BIGINT) AS loo_docs,
         CAST(t_toks - toks AS BIGINT) AS loo_toks,
         CAST(1000 * (t_en - en) // (t_docs - docs) AS BIGINT)
           AS loo_en_permille,
         CAST(1000 * (t_hq - hq) // (t_docs - docs) AS BIGINT)
           AS loo_q_permille
       FROM m, t ORDER BY source"""
  }
}
