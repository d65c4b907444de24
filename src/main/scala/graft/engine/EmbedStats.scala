package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fifty-fifth query wave: embedding-geometry statistics beyond q246's
  * covariance screen — the spectral and class-separation summaries an
  * embedding-quality audit reports. Both queries quantize coordinates
  * to an integer grid first (the q246 discipline) so every aggregate
  * is shuffle-order-proof and the oracle gate bites bit-for-bit, and
  * both respect the cross-engine division rule: any floor-division of
  * a possibly-NEGATIVE value goes through an additive offset (making
  * the operand non-negative, where truncation == floor in both
  * engines) — never a bare `div`/`//`.
  */
object EmbedStats {

  private val Dim = 64

  /** q308 — POWER-ITERATION top principal component, MATRIX-FREE: two
    * power iterations of the (uncentered) second-moment matrix G =
    * ΣqqT starting from the all-ones vector, without ever
    * materializing G: G·x = Σ_n q_n·(q_n·x), so each iteration is one
    * corpus scan with the current 64-vector riding a broadcast —
    * the formulation that survives d where a d² Gram (or its d²·n
    * expansion) would not, and the contrast to q246 which SHIPS the
    * pair expansion because its deliverable is the full matrix.
    *
    * Fixed-point ladder (exact, engine-portable): coordinates on a
    * 10³ grid (|q| ≤ 500); v1 = G·1 bounded by 64·2000·500² ≈ 3·10¹⁰,
    * offset-floor-scaled by 2¹⁶ → |v1s| ≤ 5·10⁵; v2 = G·v1s ≤ 1.6·10¹⁶,
    * scaled by 2²⁰ → |v2s| ≤ 1.6·10¹⁰; Rayleigh numerator v1s·v2s ≤
    * 5·10¹⁷ and denominator v1s·v1s ≤ 1.6·10¹³ — all inside long
    * range (audited against sf0.1's n=2000; at 10⁸ vectors re-audit
    * shifts one scan earlier, same ladder).
    *
    * Output: the v2s direction vector (64 rows) with the Rayleigh
    * quotient pieces as constant columns — λ₁ ≈ num·2²⁰/den recovers
    * the top eigenvalue of the quantized moment matrix downstream. */
  def q308PowerIteration(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val q = Tables.embeddings(spark, sfDir)
      .select($"vec_id", posexplode($"embedding").as(Seq("dim", "x")))
      .select($"vec_id", $"dim",
        floor($"x".cast("double") * 1000).cast("long").as("qv"))
    val rowSums = q.groupBy($"vec_id").agg(sum($"qv").as("rs"))
    val v1 = q.join(rowSums, Seq("vec_id"))
      .groupBy($"dim").agg(sum($"qv" * $"rs").as("v"))
    // offset floor-scale: floor(v / 2^16) with OFF = 2^46 (v can be negative)
    val v1s = v1.select($"dim",
      (expr("(v + 70368744177664) div 65536") - 1073741824L).as("vs"))
    val pn = q.join(broadcast(v1s), Seq("dim"))
      .groupBy($"vec_id").agg(sum($"qv" * $"vs").as("pn"))
    val v2 = q.join(pn, Seq("vec_id"))
      .groupBy($"dim").agg(sum($"qv" * $"pn").as("v2"))
    // floor(v2 / 2^20) with OFF = 2^60
    val v2s = v2.select($"dim",
      (expr("(v2 + 1152921504606846976) div 1048576") - 1099511627776L)
        .as("v2s"))
    val ray = v1s.join(v2s, Seq("dim"))
      .agg(sum($"vs" * $"v2s").as("rayleigh_num"),
        sum($"vs" * $"vs").as("rayleigh_den"))
    v2s.crossJoin(broadcast(ray))
      .select($"dim", $"v2s", $"rayleigh_num", $"rayleigh_den")
      .orderBy($"dim")
  }

  def q308Sql: String =
    """WITH q AS (
         SELECT vec_id, i - 1 AS dim,
           CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000) AS BIGINT) AS qv
         FROM (SELECT vec_id, embedding,
                 unnest(range(1, len(embedding) + 1)) AS i
               FROM embeddings)),
       r AS (SELECT vec_id, CAST(sum(qv) AS BIGINT) AS rs FROM q GROUP BY 1),
       v1 AS (
         SELECT dim, CAST(sum(qv * rs) AS BIGINT) AS v
         FROM q JOIN r USING (vec_id) GROUP BY dim),
       v1s AS (
         SELECT dim,
           ((v + 70368744177664) // 65536) - 1073741824 AS vs
         FROM v1),
       p AS (
         SELECT q.vec_id, CAST(sum(q.qv * v1s.vs) AS BIGINT) AS pn
         FROM q JOIN v1s USING (dim) GROUP BY 1),
       v2 AS (
         SELECT q.dim, CAST(sum(q.qv * p.pn) AS BIGINT) AS v2
         FROM q JOIN p USING (vec_id) GROUP BY 1),
       v2s AS (
         SELECT dim,
           ((v2 + 1152921504606846976) // 1048576) - 1099511627776 AS v2s
         FROM v2),
       ray AS (
         SELECT CAST(sum(a.vs * b.v2s) AS BIGINT) AS rayleigh_num,
           CAST(sum(a.vs * a.vs) AS BIGINT) AS rayleigh_den
         FROM v1s a JOIN v2s b USING (dim))
       SELECT CAST(dim AS INT) AS dim, CAST(v2s AS BIGINT) AS v2s,
         rayleigh_num, rayleigh_den
       FROM v2s, ray ORDER BY dim"""

  /** q309 — per-label ANOVA decomposition of the embedding cloud:
    * within-class scatter numerator W_c = Σ_i (n_c·ΣSS_ci − S_ci²)
    * (= n_c²·Σ_i σ²_ci) and between-class separation numerator
    * B_c = Σ_i (S_ci·n − S_i·n_c)² (= n_c²·n²·‖μ_c − μ‖²) — the
    * exact-integer pieces of the Fisher/Calinski–Harabasz class
    * separability ratio, one row per label. Coordinates on a 10²
    * grid here (|q| ≤ 50): the B_c cross-difference is the overflow
    * driver (≤ 64·(2·n·n_c·50·…)² — audited ≤ 10¹⁷ at sf0.1's n=2000;
    * a coarser grid is the knob at larger n).
    *
    * Scale: one scan → per-(label, dim) partials (|labels|·64 rows) →
    * broadcast-joined rollups. Nothing row-scale ever reshuffles. */
  def q309AnovaSeparation(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val q = Tables.embeddings(spark, sfDir)
      .select($"label", posexplode($"embedding").as(Seq("dim", "x")))
      .select($"label", $"dim",
        floor($"x".cast("double") * 100).cast("long").as("qv"))
    val perLD = q.groupBy($"label", $"dim")
      .agg(count(lit(1)).as("nc"), sum($"qv").as("s"),
        sum($"qv" * $"qv").as("ss"))
    val perD = perLD.groupBy($"dim")
      .agg(sum($"nc").as("n"), sum($"s").as("st"))
    perLD.join(broadcast(perD), Seq("dim"))
      .groupBy($"label")
      .agg(max($"nc").as("n_vecs"),
        sum($"nc" * $"ss" - $"s" * $"s").as("within_num"),
        sum(($"s" * $"n" - $"st" * $"nc") *
          ($"s" * $"n" - $"st" * $"nc")).as("between_num"))
      .orderBy($"label")
  }

  def q309Sql: String =
    """WITH q AS (
         SELECT label, i - 1 AS dim,
           CAST(floor(CAST(embedding[i] AS DOUBLE) * 100) AS BIGINT) AS qv
         FROM (SELECT label, embedding,
                 unnest(range(1, len(embedding) + 1)) AS i
               FROM embeddings)),
       per_ld AS (
         SELECT label, dim, CAST(count(*) AS BIGINT) AS nc,
           CAST(sum(qv) AS BIGINT) AS s,
           CAST(sum(qv * qv) AS BIGINT) AS ss
         FROM q GROUP BY 1, 2),
       per_d AS (
         SELECT dim, CAST(sum(nc) AS BIGINT) AS n,
           CAST(sum(s) AS BIGINT) AS st
         FROM per_ld GROUP BY 1)
       SELECT label, CAST(max(nc) AS BIGINT) AS n_vecs,
         CAST(sum(nc * ss - s * s) AS BIGINT) AS within_num,
         CAST(sum((s * n - st * nc) * (s * n - st * nc)) AS BIGINT)
           AS between_num
       FROM per_ld JOIN per_d USING (dim)
       GROUP BY label ORDER BY label"""
}
