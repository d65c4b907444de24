package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sixty-second query wave: q327 completes the TPC-H shape sweep —
  * with Q6 in place every one of the 22 reference decision-support
  * shapes now has an adapted, oracle-gated twin in the engine — and
  * two economics audits: Herfindahl concentration bands per part
  * market, and the marginal compression value of the BPE vocabulary's
  * tail (what pruning half the merges costs, per source).
  */
object Relational44 {

  /** q327 — FORECAST REVENUE CHANGE (TPC-H Q6): the pure scan-
    * aggregate — revenue that would be recovered by eliminating
    * discounts in a band, for one ship-year and small quantities. No
    * join, one row out; ALL THREE predicates must reach the parquet
    * scan (PushedFilters — spec-asserted), which is the entire point
    * of the shape: at 100 TB this query is I/O-bound and lives or
    * dies on row-group pruning.
    *
    * Exactness: revenue = Σ extendedprice·discount on the
    * cents×percent integer grid (discounts are exact hundredths in
    * the fixture), so the sum is an exact BIGINT in micro-money
    * units. */
  def q327ForecastRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, sfDir)
      .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
        $"l_shipdate" < lit("1997-01-01").cast("timestamp") &&
        $"l_discount" >= 0.04 && $"l_discount" <= 0.07 &&
        $"l_quantity" < 24)
      .select(Exact.cents($"l_extendedprice").as("epc"),
        Exact.cents($"l_discount").as("dpc"))
      .agg(count(lit(1)).as("n_lines"),
        sum($"epc" * $"dpc").as("revenue_micro"))
  }

  def q327Sql: String =
    """SELECT CAST(count(*) AS BIGINT) AS n_lines,
         CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
           * CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT))
           AS BIGINT) AS revenue_micro
       FROM lineitem
       WHERE l_shipdate >= TIMESTAMP '1996-01-01'
         AND l_shipdate <  TIMESTAMP '1997-01-01'
         AND l_discount >= 0.04 AND l_discount <= 0.07
         AND l_quantity < 24"""

  /** q328 — HERFINDAHL CONCENTRATION BANDS: per part, the HHI of its
    * supplier quantity shares in parts-per-million (10⁶·Σq² / T²),
    * bucketed into the classic bands (<0.15 competitive, <0.25
    * moderate, else concentrated) — which part markets does one
    * supplier dominate, aggregated to a fixed-size report. The
    * integer HHI needs no division per supplier: one multiply-out per
    * part.
    *
    * Scale: same co-partitioned pair→total fold as q296 (one shuffle
    * on partkey); the band rollup is 3 rows. */
  def q328HhiBands(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val pairs = Tables.lineitem(spark, sfDir)
      .groupBy($"l_partkey", $"l_suppkey")
      .agg(sum($"l_quantity".cast("long")).as("q"))
    val hhi = pairs.groupBy($"l_partkey")
      .agg(sum($"q" * $"q").as("sq2"), sum($"q").as("t"))
      .select($"l_partkey",
        expr("(1000000 * sq2) div (t * t)").as("hhi_ppm"))
    hhi
      .withColumn("band",
        when($"hhi_ppm" < 150000L, "competitive")
          .when($"hhi_ppm" < 250000L, "moderate")
          .otherwise("concentrated"))
      .groupBy($"band")
      .agg(count(lit(1)).as("n_parts"),
        min($"hhi_ppm").as("min_hhi"), max($"hhi_ppm").as("max_hhi"))
      .orderBy($"band")
  }

  def q328Sql: String =
    """WITH pairs AS (
         SELECT l_partkey, l_suppkey,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
         FROM lineitem GROUP BY 1, 2),
       hhi AS (
         SELECT l_partkey,
           (1000000 * CAST(sum(q * q) AS BIGINT))
             // (CAST(sum(q) AS BIGINT) * CAST(sum(q) AS BIGINT))
             AS hhi_ppm
         FROM pairs GROUP BY 1),
       banded AS (
         SELECT CASE WHEN hhi_ppm < 150000 THEN 'competitive'
                     WHEN hhi_ppm < 250000 THEN 'moderate'
                     ELSE 'concentrated' END AS band, hhi_ppm
         FROM hhi)
       SELECT band, CAST(count(*) AS BIGINT) AS n_parts,
         CAST(min(hhi_ppm) AS BIGINT) AS min_hhi,
         CAST(max(hhi_ppm) AS BIGINT) AS max_hhi
       FROM banded GROUP BY band ORDER BY band"""

  /** q329 — BPE VOCABULARY PRUNING COST: encoded character mass per
    * source under the full 8-merge table vs the 4-merge prefix — the
    * marginal compression the vocabulary TAIL buys, which is exactly
    * the number a tokenizer-pruning decision needs. Both encodes run
    * in ONE corpus pass (two left-fold projections over prefixes of
    * the same broadcast merge array — q253's sequential-replace
    * fold, which is the honest BPE contract: merge k applies to the
    * output of merge k−1).
    *
    * Scale: merge table is a broadcast scalar array; the corpus scans
    * once; output is |sources| rows. */
  def q329PruningCost(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val K = Relational27.BpeEncodeK
    val symArr = (1 to K)
      .map(r => s"'${(0xE000 + r - 1).toChar}'").mkString("array(", ", ", ")")
    val merges = Relational9.q137BpePairs(spark, sfDir)
      .limit(K)
      .withColumn("rnk", row_number().over( // K-row frame
        Window.orderBy($"cnt".desc, $"pair")))
      .withColumn("m3", concat($"pair", expr(s"element_at($symArr, rnk)")))
    val ms = merges.agg(expr(
      "transform(array_sort(collect_list(struct(rnk, m3))), x -> x.m3)")
      .as("ms"))
    def encLen(arr: String): org.apache.spark.sql.Column =
      expr(s"length(aggregate($arr, text, (acc, m) -> " +
        "replace(acc, substring(m, 1, 2), substring(m, 3, 1))))")
    Tables.documents(spark, sfDir)
      .select($"source", $"text")
      .crossJoin(broadcast(ms))
      .select($"source", length($"text").as("raw"),
        encLen("ms").as("full"),
        encLen(s"slice(ms, 1, ${K / 2})").as("half"))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        sum($"raw".cast("long")).as("raw_chars"),
        sum($"full".cast("long")).as("full_chars"),
        sum($"half".cast("long")).as("half_chars"))
      .withColumn("tail_value_chars", $"half_chars" - $"full_chars")
      .orderBy($"source")
  }

  def q329Sql: String = {
    val K = Relational27.BpeEncodeK
    val syms = (1 to K)
      .map(r => s"'${(0xE000 + r - 1).toChar}'").mkString("[", ", ", "]")
    s"""WITH pc AS (
          SELECT unnest(list_transform(range(1, length(text)),
            i -> substr(text, i, 2))) AS pair
          FROM documents WHERE length(text) >= 2),
        top AS (
          SELECT pair, count(*) AS cnt FROM pc GROUP BY pair
          ORDER BY cnt DESC, pair LIMIT $K),
        ranked AS (
          SELECT pair, row_number() OVER (ORDER BY cnt DESC, pair) AS rnk
          FROM top),
        ms AS (
          SELECT list(pair || ($syms)[rnk] ORDER BY rnk) AS ms FROM ranked),
        enc AS (
          SELECT d.source, length(d.text) AS raw,
            length(list_reduce(list_prepend(d.text, ms.ms),
              (acc, m) -> replace(acc, substr(m, 1, 2), substr(m, 3, 1))))
              AS fullc,
            length(list_reduce(list_prepend(d.text, ms.ms[1:${K / 2}]),
              (acc, m) -> replace(acc, substr(m, 1, 2), substr(m, 3, 1))))
              AS halfc
          FROM documents d, ms)
        SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
          CAST(sum(raw) AS BIGINT) AS raw_chars,
          CAST(sum(fullc) AS BIGINT) AS full_chars,
          CAST(sum(halfc) AS BIGINT) AS half_chars,
          CAST(sum(halfc) - sum(fullc) AS BIGINT) AS tail_value_chars
        FROM enc GROUP BY source ORDER BY source"""
  }
}
