package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Sixty-first query wave: the corpus DATASHEET (one wide row a data
  * card embeds, from two passes), the HYBRID skew join (hot keys ride
  * a broadcast, cold keys shuffle — the production mitigation when
  * salting alone wastes memory), and distribution-matching
  * downsampling (carve the largest balanced-by-language subcorpus).
  */
object Relational43 {

  /** q324 — CORPUS DATASHEET: the single-row summary a dataset card
    * publishes — documents, token mass, vocabulary size, language
    * count, exact-duplicate share, mean quality (permille), and
    * median token length. One scan computes everything except
    * vocabulary and the median (each needs its own distinct/grouped
    * fold); the three frames cross-join into one row.
    *
    * Scale: the scan aggregate is map-side combinable; vocabulary is
    * a distinct-token count (token-keyed shuffle); the median comes
    * from the length-cell frame (value-domain-bounded). */
  def q324Datasheet(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val base = Tables.documents(spark, sfDir)
      .select($"doc_id", $"lang", $"text",
        TextFunctions.tokenCount($"text").cast("long").as("wc"),
        TextFunctions.fingerprint($"text").as("fp"),
        expr("(1000 * length(regexp_replace(text, '[^a-zA-Z]', ''))) " +
          "div greatest(length(text), 1)").as("qp"))
    val scan = base.agg(
      count(lit(1)).as("n_docs"),
      sum($"wc").as("n_tokens"),
      countDistinct($"lang").as("n_langs"),
      (count(lit(1)) - countDistinct($"fp")).as("n_exact_dups"),
      expr("sum(qp) div count(1)").as("mean_quality_permille"))
    val vocab = base
      .select(explode(TextFunctions.tokens($"text")).as("t"))
      .filter($"t" =!= "")
      .agg(countDistinct($"t").as("vocab"))
    val cells = base.groupBy($"wc").agg(count(lit(1)).as("cnt"))
    val medLen = DistRank.withRunningSums(cells, "wc", "wc",
        Seq("cnt" -> "cum"))
      .crossJoin(broadcast(cells.agg(sum($"cnt").as("n"))))
      .agg(min(when($"cum" * 2 >= $"n", $"wc")).as("median_len"))
    scan.crossJoin(broadcast(vocab)).crossJoin(broadcast(medLen))
      .select($"n_docs", $"n_tokens", $"vocab", $"n_langs",
        $"n_exact_dups", $"mean_quality_permille", $"median_len")
  }

  def q324Sql: String = {
    val wc = TextFunctions.tokenCountSql("text")
    s"""WITH base AS (
         SELECT doc_id, lang, text, CAST($wc AS BIGINT) AS wc,
           md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fp,
           (1000 * length(regexp_replace(text, '[^a-zA-Z]', '', 'g')))
             // greatest(length(text), 1) AS qp
         FROM documents),
       scan AS (
         SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(wc) AS BIGINT) AS n_tokens,
           CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
           CAST(count(*) - count(DISTINCT fp) AS BIGINT) AS n_exact_dups,
           CAST(sum(qp) AS BIGINT) // CAST(count(*) AS BIGINT)
             AS mean_quality_permille
         FROM base),
       voc AS (
         SELECT CAST(count(DISTINCT t.token) AS BIGINT) AS vocab
         FROM documents,
           unnest(regexp_split_to_array(trim(text), '\\s+')) AS t(token)
         WHERE t.token <> ''),
       cells AS (SELECT wc, CAST(count(*) AS BIGINT) AS cnt
                 FROM base GROUP BY 1),
       med AS (
         SELECT CAST(min(CASE WHEN cum * 2 >= n THEN wc END) AS BIGINT)
           AS median_len
         FROM (SELECT wc,
                 sum(cnt) OVER (ORDER BY wc ROWS UNBOUNDED PRECEDING) AS cum
               FROM cells),
              (SELECT sum(cnt) AS n FROM cells))
       SELECT n_docs, n_tokens, vocab, n_langs, n_exact_dups,
         mean_quality_permille, median_len
       FROM scan, voc, med"""
  }

  /** q325 — HYBRID SKEW JOIN: orders join customers, but the build
    * side is split by observed key frequency — custkeys hotter than a
    * threshold join via BROADCAST (tiny hot dimension slice), the
    * cold tail joins via the normal shuffle; the union is the exact
    * join. This is the production skew mitigation when AQE's
    * partition-splitting isn't enough and full salting would
    * replicate the whole dimension: only the hot slice is replicated,
    * and the cold shuffle stays skew-free BY CONSTRUCTION (no key
    * above the threshold).
    *
    * The oracle is the plain join — the split is proven
    * result-invisible. The spec asserts the plan shape: exactly one
    * BroadcastHashJoin AND one SortMergeJoin/ShuffledHashJoin. */
  def q325HybridSkewJoin(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val Hot = 15L // orders-per-customer threshold
    val o = Tables.orders(spark, sfDir)
      .select($"o_custkey", Exact.cents($"o_totalprice").as("cents"))
    val freq = o.groupBy($"o_custkey").agg(count(lit(1)).as("f"))
    val hotKeys = freq.filter($"f" > Hot).select($"o_custkey".as("hk"))
    val cust = Tables.customer(spark, sfDir)
      .select($"c_custkey", $"c_mktsegment")
    val hotDim = cust.join(broadcast(hotKeys), $"c_custkey" === $"hk")
      .select($"c_custkey", $"c_mktsegment")
    val hotSide = o.join(broadcast(hotKeys.select($"hk")), $"o_custkey" === $"hk")
      .drop("hk")
      .join(broadcast(hotDim), $"o_custkey" === $"c_custkey")
    val coldSide = o.join(broadcast(hotKeys), $"o_custkey" === $"hk", "left_anti")
      .join(cust.hint("merge"), $"o_custkey" === $"c_custkey")
    hotSide.unionByName(coldSide)
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_orders"), sum($"cents").as("cents"))
      .orderBy($"c_mktsegment")
  }

  def q325Sql: String =
    """SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_orders,
         CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
           AS BIGINT) AS cents
       FROM orders JOIN customer ON o_custkey = c_custkey
       GROUP BY 1 ORDER BY c_mktsegment"""

  /** q326 — DISTRIBUTION-MATCHING DOWNSAMPLE: the largest subcorpus
    * with a UNIFORM language distribution — every language keeps
    * exactly min-language-count docs, chosen deterministically by
    * md5 rank within the language (id-bias-free). Reports per
    * language the kept count, kept token mass, and the drop count
    * the balance cost.
    *
    * Scale: the rank window partitions by language; the quota scalar
    * rides a broadcast. (For a language holding half the corpus the
    * per-language partition is corpus-scale — the grouped-rank
    * DistRank generalization is the documented upgrade path; at this
    * fixture's 5-language balance the window form is the right
    * plan.) */
  def q326BalancedDownsample(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
      .select($"doc_id", $"lang",
        TextFunctions.tokenCount($"text").cast("long").as("wc"),
        md5($"doc_id".cast("string")).as("mk"))
    val quota = docs.groupBy($"lang").agg(count(lit(1)).as("n"))
      .agg(min($"n").as("q"))
    val byLang = Window.partitionBy($"lang").orderBy($"mk", $"doc_id")
    docs
      .withColumn("rk", row_number().over(byLang).cast("long"))
      .crossJoin(broadcast(quota))
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"),
        max($"q").as("quota"),
        sum(when($"rk" <= $"q", 1L).otherwise(0L)).as("kept"),
        sum(when($"rk" <= $"q", $"wc").otherwise(0L)).as("kept_tokens"),
        sum(when($"rk" > $"q", 1L).otherwise(0L)).as("dropped"))
      .orderBy($"lang")
  }

  def q326Sql: String = {
    val wc = TextFunctions.tokenCountSql("text")
    s"""WITH d AS (
         SELECT doc_id, lang, CAST($wc AS BIGINT) AS wc,
           md5(CAST(doc_id AS VARCHAR)) AS mk
         FROM documents),
       quota AS (
         SELECT CAST(min(n) AS BIGINT) AS q FROM (
           SELECT lang, count(*) AS n FROM d GROUP BY 1)),
       ranked AS (
         SELECT lang, wc,
           CAST(row_number() OVER (PARTITION BY lang ORDER BY mk, doc_id)
             AS BIGINT) AS rk
         FROM d)
       SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         max(q) AS quota,
         CAST(sum(CASE WHEN rk <= q THEN 1 ELSE 0 END) AS BIGINT) AS kept,
         CAST(sum(CASE WHEN rk <= q THEN wc ELSE 0 END) AS BIGINT)
           AS kept_tokens,
         CAST(sum(CASE WHEN rk > q THEN 1 ELSE 0 END) AS BIGINT) AS dropped
       FROM ranked, quota GROUP BY lang ORDER BY lang"""
  }
}
