package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Thirty-sixth query wave — operational data-engineering audits:
  * probabilistic record linkage with Fellegi–Sunter agreement weights
  * (q255), shuffle-partitioner skew diagnosis (q256), and a sampling-
  * design audit quantifying block-sampling bias on clustered metrics
  * (q257). Conventions as ever: md5-derived determinism instead of RNG,
  * integer grids, blocked equi joins instead of all-pairs.
  */
object Relational28 {

  /** Fellegi–Sunter integer log-odds weights ×10 (agree / disagree) and
    * the decision thresholds. A clean same-entity pair scores
    * 24+8+5+7 = 44; a single recorded-wrong field keeps it ≥ 30
    * (link); chance name-collisions between different entities (serial
    * numbers one digit apart) land in [9, 32] — the gray zone the
    * `possible` class exists for. */
  private val (wName, wNation, wSeg, wBal) = ((24, -12), (8, -6), (5, -4), (7, -5))
  private val (thLink, thPossible) = (30, 10)

  /** q255 — probabilistic record linkage (Fellegi–Sunter): match a
    * customer registry against a DETERMINISTICALLY DIRTIED copy of
    * itself — the entity-resolution task every warehouse faces when two
    * systems disagree on spelling, codes, and rounding. The dirty copy
    * perturbs, keyed by custkey (no RNG, bit-reproducible): every 3rd
    * name loses one character, every 11th nationality is mis-keyed,
    * every 5th balance is rounded to whole dollars. The pipeline is the
    * classic three stages:
    *
    *  1. BLOCKING — candidates share the last 2 name characters: an
    *     equi join (the only fact-scale shuffle), chosen because the
    *     perturbation never touches the digit tail, so recall is 100%
    *     by construction while each block stays ~1% of the registry.
    *  2. COMPARISON — a per-field agreement vector: name within
    *     Levenshtein 1 (the bounded-threshold DP), nation/segment
    *     equality, balance within $1 on the cents grid.
    *  3. DECISION — integer agreement weights summed and thresholded
    *     into link / possible / non_link.
    *
    * Output: per decision class, pair volume, how many are truly the
    * same entity (custkey equality — the fixture gives us ground
    * truth), and precision in ppm; the `possible` band is exactly the
    * clerical-review queue FS theory prescribes. Balance rounding is
    * shift-then-divide so the floor is engine-identical on negative
    * balances.
    *
    * Scale note (honest): a FIXED block count keeps pair volume
    * quadratic (n²/|blocks|). Production linkage grows blocks with n —
    * lengthen the tail key (right-3, right-4… keeps recall here by the
    * same never-touched-tail argument) or union multiple disjoint
    * blocking passes; the compare/decide stages are unchanged. */
  def q255RecordLinkage(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val a = Tables.customer(spark, sfDir).select(
      $"c_custkey".as("a_key"), $"c_name".as("a_nm"),
      $"c_nationkey".as("a_nat"), $"c_mktsegment".as("a_seg"),
      Exact.cents($"c_acctbal").as("a_cents"))
    val b = Tables.customer(spark, sfDir).select(
      $"c_custkey".as("b_key"),
      expr("CASE WHEN c_custkey % 3 = 0 THEN concat(" +
        "substr(c_name, 1, CAST(c_custkey % 7 + 1 AS INT)), " +
        "substr(c_name, CAST(c_custkey % 7 + 3 AS INT))) " +
        "ELSE c_name END").as("b_nm"),
      expr("CASE WHEN c_custkey % 11 = 0 THEN CAST((c_nationkey + 1) % 25 AS INT) " +
        "ELSE c_nationkey END").as("b_nat"),
      $"c_mktsegment".as("b_seg"),
      expr("CASE WHEN c_custkey % 5 = 0 THEN " +
        "((CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) + 100000) " +
        "div 100) * 100 - 100000 " +
        "ELSE CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) END")
        .as("b_cents"))
    // the registry arrives as ONE input split, and with the dirty copy
    // broadcast the whole quadratic compare stage would run inside that
    // single probe task — spread the probe side across the cluster by
    // block key first. The partition count is EXPLICIT (cluster
    // parallelism, not a constant) because byte-based AQE coalescing
    // would fold the small probe input back to one partition: the
    // per-row join fan-out (×|block|) and per-pair edit-distance cost
    // are invisible to advisory byte sizing.
    val cand = a.withColumn("blk", expr("right(a_nm, 2)"))
      .repartition(spark.sparkContext.defaultParallelism, col("blk"))
      .join(b.withColumn("blk", expr("right(b_nm, 2)")), "blk")
    val scored = cand
      .withColumn("score",
        when(levenshtein($"a_nm", $"b_nm", 1) >= 0, wName._1).otherwise(wName._2)
          + when($"a_nat" === $"b_nat", wNation._1).otherwise(wNation._2)
          + when($"a_seg" === $"b_seg", wSeg._1).otherwise(wSeg._2)
          + when(abs($"a_cents" - $"b_cents") <= 100, wBal._1).otherwise(wBal._2))
      .withColumn("cls",
        when($"score" >= thLink, "link")
          .when($"score" >= thPossible, "possible")
          .otherwise("non_link"))
    scored.groupBy($"cls")
      .agg(count(lit(1)).as("n_pairs"),
        sum(when($"a_key" === $"b_key", 1L).otherwise(0L)).as("n_true"))
      .withColumn("precision_ppm",
        expr("n_true * 1000000 div n_pairs"))
      .orderBy($"cls")
  }

  def q255Sql: String =
    s"""WITH a AS (
          SELECT c_custkey AS a_key, c_name AS a_nm, c_nationkey AS a_nat,
            c_mktsegment AS a_seg,
            CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS a_cents
          FROM customer),
        b AS (
          SELECT c_custkey AS b_key,
            CASE WHEN c_custkey % 3 = 0 THEN
              substr(c_name, 1, CAST(c_custkey % 7 + 1 AS INT))
                || substr(c_name, CAST(c_custkey % 7 + 3 AS INT))
            ELSE c_name END AS b_nm,
            CASE WHEN c_custkey % 11 = 0 THEN CAST((c_nationkey + 1) % 25 AS INT)
              ELSE c_nationkey END AS b_nat,
            c_mktsegment AS b_seg,
            CASE WHEN c_custkey % 5 = 0 THEN
              ((CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
                + 100000) // 100) * 100 - 100000
            ELSE CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
            END AS b_cents
          FROM customer),
        scored AS (
          SELECT a_key, b_key,
            (CASE WHEN levenshtein(a_nm, b_nm) <= 1
               THEN ${wName._1} ELSE ${wName._2} END
             + CASE WHEN a_nat = b_nat THEN ${wNation._1} ELSE ${wNation._2} END
             + CASE WHEN a_seg = b_seg THEN ${wSeg._1} ELSE ${wSeg._2} END
             + CASE WHEN abs(a_cents - b_cents) <= 100
                 THEN ${wBal._1} ELSE ${wBal._2} END) AS score
          FROM a JOIN b ON right(a_nm, 2) = right(b_nm, 2)),
        cl AS (
          SELECT CASE WHEN score >= $thLink THEN 'link'
                      WHEN score >= $thPossible THEN 'possible'
                      ELSE 'non_link' END AS cls,
            CASE WHEN a_key = b_key THEN 1 ELSE 0 END AS t
          FROM scored)
        SELECT cls, CAST(count(*) AS BIGINT) AS n_pairs,
          CAST(sum(t) AS BIGINT) AS n_true,
          CAST(sum(t) AS BIGINT) * 1000000 // CAST(count(*) AS BIGINT)
            AS precision_ppm
        FROM cl GROUP BY cls ORDER BY cls"""

  val SkewPartitions = 32

  /** q256 — shuffle-partitioner skew audit: BEFORE a 100 TB job runs,
    * score each candidate shuffle key by the partition histogram it
    * would induce. Four schemes over events, all hashed into
    * [[SkewPartitions]] buckets by the md5 grid (deterministic, both
    * engines): `event_type` (cardinality 5 — the classic skew trap:
    * ≤ 5 of 32 tasks do all the work), `user_id` (moderate
    * cardinality), `event_id` (unique — the uniform baseline), and
    * `event_type` SALTED ×8 (q45's remedy, spreading each hot key
    * over 8 buckets at the cost of a second merge). Reported per
    * scheme: buckets actually used, the largest bucket, and skew in
    * ppm of the uniform ideal (max_rows · P · 10⁶ / n). One scan
    * (the four schemes fan out as an inline projection), one shuffle
    * keyed by (scheme, bucket), 4-row result. */
  def q256SkewAudit(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    def bucket(keyExpr: String): String =
      s"CAST(conv(substring(md5($keyExpr), 1, 8), 16, 10) AS BIGINT) % $SkewPartitions"
    val ev = Tables.events(spark, sfDir)
    val schemes = Seq(
      "1_event_type" -> "event_type",
      "2_user_id" -> "CAST(user_id AS STRING)",
      "3_event_id" -> "CAST(event_id AS STRING)",
      "4_type_salted" -> "concat(event_type, '#', CAST(event_id % 8 AS STRING))")
    val fan = ev.select(inline(array(schemes.map { case (label, k) =>
      struct(lit(label).as("scheme"),
        expr(bucket(k)).cast("long").as("bucket"))
    }: _*)))
    val nRow = ev.agg(count(lit(1)).as("n"))
    fan.groupBy($"scheme", $"bucket").agg(count(lit(1)).as("nr"))
      .groupBy($"scheme")
      .agg(count(lit(1)).as("n_used"), max($"nr").as("max_rows"))
      .crossJoin(broadcast(nRow))
      .withColumn("skew_ppm",
        expr(s"max_rows * $SkewPartitions * 1000000 div n"))
      .drop("n")
      .orderBy($"scheme")
  }

  def q256Sql: String = {
    def bucket(k: String): String =
      s"CAST(('0x' || substr(md5($k), 1, 8)) AS BIGINT) % $SkewPartitions"
    s"""WITH fan AS (
          SELECT '1_event_type' AS scheme, ${bucket("event_type")} AS bucket
          FROM events
          UNION ALL SELECT '2_user_id', ${bucket("CAST(user_id AS VARCHAR)")}
          FROM events
          UNION ALL SELECT '3_event_id', ${bucket("CAST(event_id AS VARCHAR)")}
          FROM events
          UNION ALL SELECT '4_type_salted',
            ${bucket("(event_type || '#' || CAST(event_id % 8 AS VARCHAR))")}
          FROM events),
        h AS (
          SELECT scheme, bucket, CAST(count(*) AS BIGINT) AS nr
          FROM fan GROUP BY 1, 2),
        n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM events)
        SELECT scheme, CAST(count(*) AS BIGINT) AS n_used,
          CAST(max(nr) AS BIGINT) AS max_rows,
          max(nr) * $SkewPartitions * 1000000 // (SELECT n FROM n)
            AS skew_ppm
        FROM h GROUP BY scheme ORDER BY scheme"""
  }

  /** q257 — sampling-design audit: row-level vs block-level 2% samples
    * of lineitem, scored against the exact answer for two metrics with
    * opposite clustering: `quantity` (independent of physical order)
    * and `ship_day` (correlated with orderkey, i.e. with the blocks).
    * Block sampling reads ~2% of FILES — at 100 TB that is the only
    * affordable kind — but inherits the blocks' clustering bias:
    * sampling whole orderkey ranges samples whole TIME ranges, so the
    * clustered metric's error blows up while the unclustered metric
    * stays comparable to the row design. The audit quantifies exactly
    * that trade (est vs truth, error in ppm, all on integer grids;
    * membership md5-keyed, no RNG). One scan computes truth and both
    * designs' estimates (the selections are projections); output is
    * 4 rows. */
  def q257SamplingAudit(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, sfDir).select(
      $"l_orderkey", $"l_linenumber",
      Exact.cents($"l_quantity").as("qty_c"),
      expr("CAST(datediff(to_date(l_shipdate), DATE '1995-01-01') AS BIGINT)")
        .as("day"))
      .withColumn("rowSel",
        expr("CAST(conv(substring(md5(CAST(l_orderkey * 8 + l_linenumber AS STRING)), 1, 8), 16, 10) AS BIGINT) % 50 = 0"))
      .withColumn("blkSel",
        expr("CAST(conv(substring(md5(concat('b', CAST(l_orderkey div 10 AS STRING))), 1, 8), 16, 10) AS BIGINT) % 50 = 0"))
    val agg = li.agg(
      count(lit(1)).as("n"),
      sum($"qty_c").as("sq"), sum($"day").as("sd"),
      count(when($"rowSel", 1)).as("rn"),
      sum(when($"rowSel", $"qty_c")).as("rq"),
      sum(when($"rowSel", $"day")).as("rd"),
      count(when($"blkSel", 1)).as("bn"),
      sum(when($"blkSel", $"qty_c")).as("bq"),
      sum(when($"blkSel", $"day")).as("bd"))
    agg.select(inline(array(
      struct(lit("row_2pct").as("design"), lit("qty_cents").as("metric"),
        $"rn".as("n_sampled"),
        expr("rq * 1000 div rn").as("est_milli"),
        expr("sq * 1000 div n").as("true_milli")),
      struct(lit("row_2pct").as("design"), lit("ship_day").as("metric"),
        $"rn".as("n_sampled"),
        expr("rd * 1000 div rn").as("est_milli"),
        expr("sd * 1000 div n").as("true_milli")),
      struct(lit("block_2pct").as("design"), lit("qty_cents").as("metric"),
        $"bn".as("n_sampled"),
        expr("bq * 1000 div bn").as("est_milli"),
        expr("sq * 1000 div n").as("true_milli")),
      struct(lit("block_2pct").as("design"), lit("ship_day").as("metric"),
        $"bn".as("n_sampled"),
        expr("bd * 1000 div bn").as("est_milli"),
        expr("sd * 1000 div n").as("true_milli")))))
      .withColumn("err_ppm",
        expr("abs(est_milli - true_milli) * 1000000 div true_milli"))
      .orderBy($"design", $"metric")
  }

  def q257Sql: String =
    s"""WITH li AS (
          SELECT l_orderkey, l_linenumber,
            CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) AS qty_c,
            CAST(date_diff('day', DATE '1995-01-01',
              CAST(l_shipdate AS DATE)) AS BIGINT) AS day,
            CAST(('0x' || substr(md5(
              CAST(l_orderkey * 8 + l_linenumber AS VARCHAR)), 1, 8)) AS BIGINT)
              % 50 = 0 AS rowSel,
            CAST(('0x' || substr(md5(
              'b' || CAST(l_orderkey // 10 AS VARCHAR)), 1, 8)) AS BIGINT)
              % 50 = 0 AS blkSel
          FROM lineitem),
        agg AS (
          SELECT CAST(count(*) AS BIGINT) AS n,
            CAST(sum(qty_c) AS BIGINT) AS sq, CAST(sum(day) AS BIGINT) AS sd,
            CAST(count(CASE WHEN rowSel THEN 1 END) AS BIGINT) AS rn,
            CAST(sum(CASE WHEN rowSel THEN qty_c END) AS BIGINT) AS rq,
            CAST(sum(CASE WHEN rowSel THEN day END) AS BIGINT) AS rd,
            CAST(count(CASE WHEN blkSel THEN 1 END) AS BIGINT) AS bn,
            CAST(sum(CASE WHEN blkSel THEN qty_c END) AS BIGINT) AS bq,
            CAST(sum(CASE WHEN blkSel THEN day END) AS BIGINT) AS bd
          FROM li),
        m AS (
          SELECT 'row_2pct' AS design, 'qty_cents' AS metric, rn AS n_sampled,
            rq * 1000 // rn AS est_milli, sq * 1000 // n AS true_milli FROM agg
          UNION ALL SELECT 'row_2pct', 'ship_day', rn,
            rd * 1000 // rn, sd * 1000 // n FROM agg
          UNION ALL SELECT 'block_2pct', 'qty_cents', bn,
            bq * 1000 // bn, sq * 1000 // n FROM agg
          UNION ALL SELECT 'block_2pct', 'ship_day', bn,
            bd * 1000 // bn, sd * 1000 // n FROM agg)
        SELECT design, metric, n_sampled, est_milli, true_milli,
          abs(est_milli - true_milli) * 1000000 // true_milli AS err_ppm
        FROM m ORDER BY design, metric"""
}
