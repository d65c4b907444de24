package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Fifty-eighth query wave: NEAREST-direction as-of matching (the
  * pandas merge_asof direction='nearest' contract the backward-only
  * q46/q61/q208 family doesn't cover), the one-pass PAIRWISE KS drift
  * matrix (all segment pairs from a single cumulative frame — the
  * many-statistics-one-scan pattern), and the quantile-normalization
  * mapping table (batch-effect correction across sources).
  */
object Relational40 {

  /** q315 — NEAREST AS-OF: each error event matched to its nearest
    * purchase by the SAME user within ±1 hour — backward candidate
    * from a running last_value, forward candidate from a first_value
    * over the following frame (both windows partitioned by user — no
    * global sort), nearest by |Δt| with ties to the backward side
    * (the merge_asof convention). Events sort by (ts, event_id), so
    * same-timestamp neighbors resolve deterministically.
    *
    * Scale: one shuffle by user_id; state per row is two scalar
    * candidates — contrast with an interval join, which would fan out
    * every in-window pair just to keep one. */
  def q315NearestAsof(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, sfDir)
      .filter($"event_type".isin("purchase", "error"))
      .select($"user_id", $"ts", $"event_id", $"event_type",
        unix_micros($"ts").as("us"))
    val byUser = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val back = byUser.rowsBetween(Window.unboundedPreceding, -1)
    val fwd = byUser.rowsBetween(1, Window.unboundedFollowing)
    val pid = when($"event_type" === "purchase", $"event_id")
    val pus = when($"event_type" === "purchase", $"us")
    val enriched = ev
      .withColumn("b_id", last(pid, ignoreNulls = true).over(back))
      .withColumn("b_us", last(pus, ignoreNulls = true).over(back))
      .withColumn("f_id", first(pid, ignoreNulls = true).over(fwd))
      .withColumn("f_us", first(pus, ignoreNulls = true).over(fwd))
      .filter($"event_type" === "error")
    val Tol = 3600000000L // 1 h in µs
    enriched
      .withColumn("b_d", $"us" - $"b_us")
      .withColumn("f_d", $"f_us" - $"us")
      .withColumn("b_ok", $"b_d".isNotNull && $"b_d" <= Tol)
      .withColumn("f_ok", $"f_d".isNotNull && $"f_d" <= Tol)
      .filter($"b_ok" || $"f_ok")
      .select($"user_id", $"event_id".as("error_id"),
        when($"b_ok" && (!$"f_ok" || $"b_d" <= $"f_d"), $"b_id")
          .otherwise($"f_id").as("purchase_id"),
        // magnitudes are non-negative, so `div` (truncate) == `//`
        // (floor) — the cross-engine division rule
        when($"b_ok" && (!$"f_ok" || $"b_d" <= $"f_d"),
          -expr("b_d div 1000000"))
          .otherwise(expr("f_d div 1000000")).cast("long").as("delta_s"),
        when($"b_ok" && (!$"f_ok" || $"b_d" <= $"f_d"), "backward")
          .otherwise("forward").as("direction"))
      .orderBy($"user_id", $"error_id")
  }

  def q315Sql: String =
    """WITH ev AS (
         SELECT user_id, ts, event_id, event_type, epoch_us(ts) AS us
         FROM events WHERE event_type IN ('purchase', 'error')),
       enriched AS (
         SELECT user_id, event_id, event_type, us,
           last_value(CASE WHEN event_type = 'purchase' THEN event_id END
             IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS b_id,
           last_value(CASE WHEN event_type = 'purchase' THEN us END
             IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS b_us,
           first_value(CASE WHEN event_type = 'purchase' THEN event_id END
             IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS f_id,
           first_value(CASE WHEN event_type = 'purchase' THEN us END
             IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS f_us
         FROM ev),
       err AS (
         SELECT user_id, event_id, us,
           us - b_us AS b_d, f_us - us AS f_d,
           b_us IS NOT NULL AND us - b_us <= 3600000000 AS b_ok,
           f_us IS NOT NULL AND f_us - us <= 3600000000 AS f_ok,
           b_id, f_id
         FROM enriched WHERE event_type = 'error')
       SELECT user_id, event_id AS error_id,
         CASE WHEN b_ok AND (NOT f_ok OR b_d <= f_d) THEN b_id
              ELSE f_id END AS purchase_id,
         CAST(CASE WHEN b_ok AND (NOT f_ok OR b_d <= f_d)
              THEN -(b_d // 1000000) ELSE f_d // 1000000 END AS BIGINT)
           AS delta_s,
         CASE WHEN b_ok AND (NOT f_ok OR b_d <= f_d) THEN 'backward'
              ELSE 'forward' END AS direction
       FROM err WHERE b_ok OR f_ok
       ORDER BY user_id, error_id"""

  private val Segs = Seq("AUTOMOBILE", "BUILDING", "FURNITURE",
    "HOUSEHOLD", "MACHINERY")

  /** q316 — PAIRWISE KS DRIFT MATRIX: the exact two-sample KS
    * numerator for EVERY pair of the five market segments, from ONE
    * cumulative pass — the order-value grid pivots to five count
    * columns, a single [[DistRank.withRunningSums]] call lifts all
    * five CDFs together, and the 10 pair maxima fold in one aggregate
    * before an inline reshape to rows. Running q298 ten times would
    * cost ten shuffled passes; this costs one.
    *
    * Scale: the pooled distinct-value frame is row-scale (the
    * two-level prefix sum is mandatory); everything after is
    * arithmetic on that frame. */
  def q316KsMatrix(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val cells = Tables.orders(spark, sfDir)
      .join(Tables.customer(spark, sfDir), $"o_custkey" === $"c_custkey")
      .select(Exact.cents($"o_totalprice").as("v"), $"c_mktsegment".as("seg"))
      .groupBy($"v").pivot("seg", Segs).agg(count(lit(1)))
      .na.fill(0L, Segs)
    val cum = DistRank.withRunningSums(cells, "v", "v",
      Segs.map(s => s -> s"cum_$s"))
    val totals = cells.agg(
      Segs.map(s => sum(col(s)).as(s"n_$s")).head,
      Segs.map(s => sum(col(s)).as(s"n_$s")).tail: _*)
    val pairs = for {
      i <- Segs.indices; j <- Segs.indices if i < j
    } yield (Segs(i), Segs(j))
    val folded = cum.crossJoin(broadcast(totals)).agg(
      pairs.map { case (a, b) =>
        max(abs(col(s"cum_$a") * col(s"n_$b") -
          col(s"cum_$b") * col(s"n_$a"))).as(s"ks_${a}_$b") }.head,
      pairs.tail.map { case (a, b) =>
        max(abs(col(s"cum_$a") * col(s"n_$b") -
          col(s"cum_$b") * col(s"n_$a"))).as(s"ks_${a}_$b") }: _*)
    val structs = pairs.map { case (a, b) =>
      s"struct('$a' AS seg_a, '$b' AS seg_b, ks_${a}_$b AS ks_num)"
    }.mkString(", ")
    folded.crossJoin(broadcast(totals))
      .select((expr(s"inline(array($structs))") +:
        Segs.map(s => col(s"n_$s"))): _*)
      .select($"seg_a", $"seg_b",
        Segs.foldLeft(lit(0L)) { (acc, s) =>
          when($"seg_a" === s, col(s"n_$s")).otherwise(acc) }.as("n_a"),
        Segs.foldLeft(lit(0L)) { (acc, s) =>
          when($"seg_b" === s, col(s"n_$s")).otherwise(acc) }.as("n_b"),
        $"ks_num")
      .withColumn("ks_permille", expr("(1000 * ks_num) div (n_a * n_b)"))
      .orderBy($"seg_a", $"seg_b")
  }

  def q316Sql: String = {
    val cnts = Segs.map(s =>
      s"CAST(sum(CASE WHEN seg = '$s' THEN 1 ELSE 0 END) AS BIGINT) AS c_$s")
      .mkString(", ")
    val cums = Segs.map(s =>
      s"CAST(sum(c_$s) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_$s")
      .mkString(", ")
    val tots = Segs.map(s => s"CAST(sum(c_$s) AS BIGINT) AS n_$s")
      .mkString(", ")
    val pairs = for {
      i <- Segs.indices; j <- Segs.indices if i < j
    } yield (Segs(i), Segs(j))
    val arms = pairs.map { case (a, b) =>
      s"""SELECT '$a' AS seg_a, '$b' AS seg_b, n_$a AS n_a, n_$b AS n_b,
            CAST(max(abs(cum_$a * n_$b - cum_$b * n_$a)) AS BIGINT) AS ks_num
          FROM cum, tot GROUP BY n_$a, n_$b"""
    }.mkString(" UNION ALL ")
    s"""WITH j AS (
         SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
           AS v, c_mktsegment AS seg
         FROM orders JOIN customer ON o_custkey = c_custkey),
       cells AS (SELECT v, $cnts FROM j GROUP BY v),
       cum AS (SELECT v, $cums FROM cells),
       tot AS (SELECT $tots FROM cells),
       arms AS ($arms)
       SELECT seg_a, seg_b, n_a, n_b, ks_num,
         (1000 * ks_num) // (n_a * n_b) AS ks_permille
       FROM arms ORDER BY seg_a, seg_b"""
  }

  /** q317 — QUANTILE NORMALIZATION TABLE: for each source and decile
    * d ∈ 1..9, the source's decile document length and the POOLED
    * corpus decile it should map to — the batch-effect correction
    * lookup (replace a value at source-quantile q with the pooled
    * value at the same q). Grouped deciles come from the grouped
    * prefix-sum primitive; pooled deciles from the ungrouped one; the
    * mapping joins on the 9-row decile domain.
    *
    * Scale: cell folds first (|source|·|distinct length| and
    * |distinct length| frames), prefix sums bucket-local, decile
    * extraction is 9 conditional mins per group. */
  def q317QuantileNorm(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val base = Tables.documents(spark, sfDir)
      .select($"source",
        TextFunctions.tokenCount($"text").cast("long").as("wc"))
    val srcCells = base.groupBy($"source", $"wc")
      .agg(count(lit(1)).as("cnt"))
    val srcCum = DistRank.withGroupedRunningSums(srcCells, Seq("source"),
      "wc", "wc", Seq("cnt" -> "cum"))
    val srcTot = srcCells.groupBy($"source").agg(sum($"cnt").as("n"))
    val deciles = (1 to 9).toSeq
    val srcDec = srcCum.join(broadcast(srcTot), Seq("source"))
      .groupBy($"source")
      .agg(deciles.map(d =>
          min(when($"cum" * 10 >= $"n" * d, $"wc")).as(s"d_$d")).head,
        deciles.tail.map(d =>
          min(when($"cum" * 10 >= $"n" * d, $"wc")).as(s"d_$d")): _*)
      .select($"source", expr("inline(array(" + deciles.map(d =>
        s"struct($d AS decile, d_$d AS src_val)").mkString(", ") + "))"))
    val poolCells = base.groupBy($"wc").agg(count(lit(1)).as("cnt"))
    val poolCum = DistRank.withRunningSums(poolCells, "wc", "wc",
      Seq("cnt" -> "cum"))
    val poolTot = poolCells.agg(sum($"cnt").as("n"))
    val poolDec = poolCum.crossJoin(broadcast(poolTot))
      .agg(deciles.map(d =>
          min(when($"cum" * 10 >= $"n" * d, $"wc")).as(s"p_$d")).head,
        deciles.tail.map(d =>
          min(when($"cum" * 10 >= $"n" * d, $"wc")).as(s"p_$d")): _*)
      .select(expr("inline(array(" + deciles.map(d =>
        s"struct($d AS decile, p_$d AS pooled_val)").mkString(", ") + "))"))
    srcDec.join(broadcast(poolDec), Seq("decile"))
      .select($"source", $"decile", $"src_val", $"pooled_val")
      .orderBy($"source", $"decile")
  }

  def q317Sql: String = {
    val wc = TextFunctions.tokenCountSql("text")
    s"""WITH base AS (
         SELECT source, CAST($wc AS BIGINT) AS wc FROM documents),
       src_cells AS (
         SELECT source, wc, CAST(count(*) AS BIGINT) AS cnt
         FROM base GROUP BY 1, 2),
       src_cum AS (
         SELECT source, wc,
           CAST(sum(cnt) OVER (PARTITION BY source ORDER BY wc
             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
         FROM src_cells),
       src_tot AS (
         SELECT source, CAST(sum(cnt) AS BIGINT) AS n
         FROM src_cells GROUP BY 1),
       d AS (SELECT unnest(range(1, 10)) AS decile),
       src_dec AS (
         SELECT source, d.decile,
           CAST(min(CASE WHEN cum * 10 >= n * d.decile THEN wc END)
             AS BIGINT) AS src_val
         FROM src_cum JOIN src_tot USING (source) CROSS JOIN d
         GROUP BY 1, 2),
       pool_cum AS (
         SELECT wc,
           CAST(sum(cnt) OVER (ORDER BY wc ROWS UNBOUNDED PRECEDING)
             AS BIGINT) AS cum
         FROM (SELECT wc, CAST(sum(cnt) AS BIGINT) AS cnt
               FROM src_cells GROUP BY wc)),
       pool_tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM base),
       pool_dec AS (
         SELECT d.decile,
           CAST(min(CASE WHEN cum * 10 >= n * d.decile THEN wc END)
             AS BIGINT) AS pooled_val
         FROM pool_cum, pool_tot CROSS JOIN d GROUP BY 1)
       SELECT s.source, CAST(s.decile AS INT) AS decile, s.src_val,
         p.pooled_val
       FROM src_dec s JOIN pool_dec p USING (decile)
       ORDER BY s.source, s.decile"""
  }
}
