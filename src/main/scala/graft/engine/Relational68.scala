package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Eighty-seventh query wave: q393 cross-modal dedup agreement
  * (text-shingle near-dups vs embedding cosine — do the two
  * modalities see the same duplicates?), q394 split-conformal
  * prediction coverage (exact rank-quantile calibration), and q395
  * interpolation-search epsilon (the learned-index error bound on
  * the order-total key space).
  */
object Relational68 {

  /** q393 cosine agreement threshold (doubles are bit-identical
    * across engines — the order-fixed fold). */
  private val Q393CosHigh = 0.8

  /** q393 — CROSS-MODAL DEDUP AGREEMENT: the exact 3-shingle
    * near-dup pairs (q390's truth set, Jaccard ≥ 600‰) versus a
    * deterministic baseline pairing (doc d with doc d+250), each
    * scored by embedding cosine (doc_id ≡ vec_id in the fixture).
    * If the corpus' embeddings are any good, the near-dup group's
    * cosine mass sits far above the baseline's — and a gap that
    * CLOSES is the signal to stop trusting embedding-only dedup
    * (q26) for this corpus. Emits per group: pair count, share with
    * cosine ≥ 0.8, and the min/max cosine band.
    *
    * Scale: the truth side is [[Dedup.exactTruthPairs600]] — the
    * PPJoin prefix-filtered exact join (identical pair set) over the
    * memoized shingle index, shared with q390 and already
    * checkpointed for multi-action reuse; cosines are two
    * broadcast-free equi joins into the embedding table keyed by doc
    * id; output is 2 rows. */
  def q393CrossModalAgreement(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val neardup = Dedup.exactTruthPairs600(spark, sfDir)
      .select($"da", $"db", lit("neardup").as("grp"))
    val n = Tables.documents(spark, sfDir).count()
    val half = n / 2
    val baseline = Tables.documents(spark, sfDir)
      .select($"doc_id".as("da"))
      .filter($"da" < half)
      .select($"da", ($"da" + half).as("db"), lit("baseline").as("grp"))
    val emb = Tables.embeddings(spark, sfDir)
      .select($"vec_id", $"embedding")
    val pairs = neardup.unionByName(baseline)
      .join(emb.select($"vec_id".as("da"), $"embedding".as("ea")),
        Seq("da"))
      .join(emb.select($"vec_id".as("db"), $"embedding".as("eb")),
        Seq("db"))
    val dot = graft.functions.VectorExpressions.dot_product _
    val cosCol = dot($"ea", $"eb") /
      sqrt(dot($"ea", $"ea") * dot($"eb", $"eb"))
    pairs.select($"grp", cosCol.as("cos"))
      .groupBy($"grp")
      .agg(count(lit(1)).as("n_pairs"),
        sum(($"cos" >= Q393CosHigh).cast("long")).as("n_high"),
        round(min($"cos"), 6).as("min_cos"),
        round(max($"cos"), 6).as("max_cos"))
      .select($"grp", $"n_pairs",
        expr("(1000 * n_high) div n_pairs").as("high_permille"),
        $"min_cos", $"max_cos")
      .orderBy($"grp")
  }

  def q393Sql: String = {
    import Similarity.dotSql
    def cosN(a: String, b: String): String =
      s"(${dotSql(a, b)} / sqrt(${dotSql(a, a)} * ${dotSql(b, b)}))"
    s"""WITH toks AS (
         SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
         FROM documents),
       sh AS (
         SELECT DISTINCT doc_id,
           t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS g
         FROM toks, unnest(range(1, len(t) - 1)) AS r(i)),
       sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS s
              FROM sh GROUP BY 1),
       neardup AS (
         SELECT x.doc_id AS da, y.doc_id AS db, 'neardup' AS grp
         FROM sh x JOIN sh y ON x.g = y.g AND x.doc_id < y.doc_id
         GROUP BY 1, 2
         HAVING (1000 * count(*)) //
           ((SELECT s FROM sz WHERE doc_id = x.doc_id) +
            (SELECT s FROM sz WHERE doc_id = y.doc_id) - count(*))
           >= ${Relational67.Q390Tau}),
       half AS (SELECT count(*) // 2 AS h FROM documents),
       baseline AS (
         SELECT doc_id AS da, doc_id + h AS db, 'baseline' AS grp
         FROM documents, half WHERE doc_id < h),
       pairs AS (
         SELECT p.grp, ${cosN("ea.embedding", "eb.embedding")} AS cos
         FROM (SELECT * FROM neardup UNION ALL
               SELECT * FROM baseline) p
           JOIN embeddings ea ON ea.vec_id = p.da
           JOIN embeddings eb ON eb.vec_id = p.db)
       SELECT grp, CAST(count(*) AS BIGINT) AS n_pairs,
         CAST((1000 * sum(CASE WHEN cos >= $Q393CosHigh
           THEN 1 ELSE 0 END)) // count(*) AS BIGINT) AS high_permille,
         round(min(cos), 6) AS min_cos,
         round(max(cos), 6) AS max_cos
       FROM pairs GROUP BY grp ORDER BY grp"""
  }

  /** q394 split boundaries: fit < 1997-01-01 ≤ calibrate
    * < 1999-01-01 ≤ test. */
  val Q394Fit = "1997-01-01"
  val Q394Cal = "1999-01-01"

  /** q394 — SPLIT-CONFORMAL COVERAGE: the distribution-free
    * prediction-interval recipe, run exactly — fit a trivial
    * predictor (per-priority mean order total) on the fit years,
    * take the ceil(0.9·(n+1))-th smallest absolute residual on the
    * CALIBRATION years as the conformal radius, and measure empirical
    * coverage on the TEST years. Conformal theory promises ≥ ~90%
    * coverage under exchangeability; the emitted coverage permille is
    * the audit of that promise under the fixture's real drift.
    * Everything is exact: cents, integer means, and an exact
    * rank-quantile via one [[DistRank.withRunningSums]] pass.
    *
    * Scale: three filtered aggregates plus a value-grouped quantile
    * frame (distinct residuals — bounded by the cents grid), no
    * global windows, broadcast model join. */
  def q394ConformalCoverage(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, sfDir).select(
      $"o_orderpriority".as("pri"),
      Exact.cents($"o_totalprice").as("y"),
      to_date($"o_orderdate").as("d"))
    val model = o.filter($"d" < lit(Q394Fit))
      .groupBy($"pri").agg(expr("sum(y) div count(1)").as("yhat"))
    val cal = o.filter($"d" >= lit(Q394Fit) && $"d" < lit(Q394Cal))
      .join(broadcast(model), Seq("pri"))
      .select(abs($"y" - $"yhat").as("r"))
    val grouped = cal.groupBy($"r").agg(count(lit(1)).as("cnt"))
    val cum = DistRank.withRunningSums(grouped, "r", "r",
      Seq("cnt" -> "cum"))
    val nCal = cal.count()
    val rank = (9L * (nCal + 1L) + 9L) / 10L
    val q = cum.filter($"cum" >= rank && $"cum" - $"cnt" < rank)
      .agg(min($"r")).head().getLong(0)
    val test = o.filter($"d" >= lit(Q394Cal))
      .join(broadcast(model), Seq("pri"))
      .select((abs($"y" - $"yhat") <= q).cast("long").as("cov"))
    TempIo.materialize(spark,
      test.agg(count(lit(1)).as("n_test"), sum($"cov").as("covered"))
        .select(lit(nCal).as("n_cal"), lit(q).as("q90_cents"),
          $"n_test", $"covered",
          expr("(1000 * covered) div n_test").as("coverage_permille")))
  }

  def q394Sql: String =
    s"""WITH o AS (
         SELECT o_orderpriority AS pri,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
             AS y,
           CAST(o_orderdate AS DATE) AS d
         FROM orders),
       model AS (
         SELECT pri, CAST(sum(y) // count(*) AS BIGINT) AS yhat
         FROM o WHERE d < DATE '$Q394Fit' GROUP BY 1),
       cal AS (
         SELECT abs(y - yhat) AS r
         FROM o JOIN model USING (pri)
         WHERE d >= DATE '$Q394Fit' AND d < DATE '$Q394Cal'),
       nc AS (SELECT CAST(count(*) AS BIGINT) AS n_cal FROM cal),
       rk AS (SELECT (9 * (n_cal + 1) + 9) // 10 AS r FROM nc),
       cum AS (
         SELECT r AS v, CAST(count(*) AS BIGINT) AS cnt,
           sum(count(*)) OVER (ORDER BY r ROWS UNBOUNDED PRECEDING)
             AS cum
         FROM cal GROUP BY r),
       q AS (
         SELECT min(v) AS q90 FROM cum, rk
         WHERE cum >= rk.r AND cum - cnt < rk.r),
       test AS (
         SELECT CASE WHEN abs(y - yhat) <= q90 THEN 1 ELSE 0 END AS cov
         FROM o JOIN model USING (pri) CROSS JOIN q
         WHERE d >= DATE '$Q394Cal')
       SELECT nc.n_cal, CAST(q.q90 AS BIGINT) AS q90_cents,
         CAST(count(*) AS BIGINT) AS n_test,
         CAST(sum(cov) AS BIGINT) AS covered,
         CAST((1000 * sum(cov)) // count(*) AS BIGINT)
           AS coverage_permille
       FROM test, nc, q GROUP BY nc.n_cal, q.q90"""

  /** q395 — INTERPOLATION-SEARCH EPSILON (the learned-index error
    * bound): predict each order's rank in the totalprice key space by
    * LINEAR INTERPOLATION between the min and max key, and measure
    * the exact error against the true rank — the ε that decides how
    * wide a learned/interpolated index probe must be. Emits n, max
    * error, the exact p99 error, and the mean error in permille.
    *
    * Scale: true ranks are ONE [[DistRank.withRank]] pass; the p99
    * comes from an error-grouped [[DistRank.withRunningSums]] frame —
    * no global sort of the row frame anywhere. */
  def q395InterpolationEpsilon(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val keys = Tables.orders(spark, sfDir).select(
      $"o_orderkey".as("ok"), Exact.cents($"o_totalprice").as("k"))
    val ranked = DistRank.withRank(keys, "k", "ok", "rk", desc = false)
    val bounds = keys.agg(min($"k").as("mn"), max($"k").as("mx"),
      count(lit(1)).as("n"))
    // errs feeds the error histogram AND the total aggregate —
    // checkpoint so the second consumer doesn't re-run the whole rank
    // pipeline (the q170/q359 multiply-consumed-frame discipline)
    val errs = ranked.crossJoin(broadcast(bounds))
      .select(abs(expr("(k - mn) * (n - 1) div (mx - mn) + 1") - $"rk")
        .as("e"), $"n")
      .localCheckpoint()
    val grouped = errs.groupBy($"e").agg(count(lit(1)).as("cnt"))
    val cum = DistRank.withRunningSums(grouped, "e", "e",
      Seq("cnt" -> "cum"))
    val tot = errs.agg(max($"n").as("n"), sum($"e").as("se"))
    TempIo.materialize(spark,
      cum.crossJoin(broadcast(tot))
        .select($"e", $"cnt", $"cum", $"n", $"se",
          expr("(99 * n + 99) div 100").as("p99rk"))
        .groupBy($"n", $"se", $"p99rk")
        .agg(max($"e").as("max_err"),
          min(when($"cum" >= $"p99rk", $"e")).as("p99_err"))
        .select($"n", $"max_err", $"p99_err",
          expr("(1000 * se) div n").as("mean_err_permille")))
  }

  def q395Sql: String =
    """WITH keys AS (
         SELECT o_orderkey AS ok,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
             AS k
         FROM orders),
       ranked AS (
         SELECT k, row_number() OVER (ORDER BY k, ok) AS rk FROM keys),
       bounds AS (SELECT min(k) AS mn, max(k) AS mx,
                    CAST(count(*) AS BIGINT) AS n FROM keys),
       errs AS (
         SELECT abs((k - mn) * (n - 1) // (mx - mn) + 1 - rk) AS e, n
         FROM ranked, bounds),
       grouped AS (SELECT e, CAST(count(*) AS BIGINT) AS cnt
                   FROM errs GROUP BY e),
       cum AS (
         SELECT e, cnt,
           sum(cnt) OVER (ORDER BY e ROWS UNBOUNDED PRECEDING) AS cum
         FROM grouped),
       tot AS (SELECT max(n) AS n, CAST(sum(e) AS BIGINT) AS se
               FROM errs)
       SELECT tot.n,
         CAST(max(cum.e) AS BIGINT) AS max_err,
         CAST(min(CASE WHEN cum.cum >= (99 * tot.n + 99) // 100
           THEN cum.e END) AS BIGINT) AS p99_err,
         CAST((1000 * tot.se) // tot.n AS BIGINT) AS mean_err_permille
       FROM cum, tot GROUP BY tot.n, tot.se"""
}
