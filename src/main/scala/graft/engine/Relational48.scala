package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Sixty-seventh query wave: featurization infrastructure — bulk
  * sparse linear scoring (the SpMM shape: term-frequency vectors ×
  * a term→topic weight matrix, weights derived hash-deterministically
  * so no model file is needed) and the hashing-trick collision audit
  * (what 2¹² feature buckets cost in collided vocabulary and mass).
  */
object Relational48 {

  /** q337 — SPARSE LINEAR SCORING (SpMM): score every document
    * against a 4-topic linear model whose weight w(term, k) ∈ [−3, 3]
    * derives from md5 hex chars — the sparse-matrix × dense-matrix
    * product shape of bulk model inference (doc×term TF matrix times
    * term×topic weights), rolled up per (source, topic).
    *
    * Scale: one tokenize pass folds to (source, term) TF cells; the
    * ×4 topic fan-out is a projection (weights are EXPRESSIONS of the
    * term — a real model would broadcast-join the weight table, same
    * plan shape); the rollup is |sources|×4. No dense matrix ever
    * materializes. */
  def q337SparseScoring(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val tf = Tables.documents(spark, sfDir)
      .select($"source", explode(TextFunctions.tokens($"text")).as("t"))
      .filter($"t" =!= "")
      .groupBy($"source", $"t").agg(count(lit(1)).as("tf"))
    tf.select($"source", $"t", $"tf",
        explode(sequence(lit(0), lit(3))).as("k"))
      .withColumn("w",
        expr("ascii(substr(md5(t), k + 1, 1)) % 7") - 3)
      .groupBy($"source", $"k")
      .agg(sum($"tf" * $"w").as("score"),
        sum(when($"w" > 0, $"tf" * $"w").otherwise(0L)).as("pos_mass"),
        sum(when($"w" < 0, -$"tf" * $"w").otherwise(0L)).as("neg_mass"))
      .select($"source", $"k".cast("long").as("topic"), $"score",
        $"pos_mass", $"neg_mass")
      .orderBy($"source", $"topic")
  }

  def q337Sql: String =
    """WITH tf AS (
         SELECT source, t.token AS t, CAST(count(*) AS BIGINT) AS tf
         FROM documents,
           unnest(regexp_split_to_array(trim(text), '\s+')) AS t(token)
         WHERE t.token <> ''
         GROUP BY 1, 2),
       scored AS (
         SELECT source, t, tf, k,
           CAST(ascii(substr(md5(t), CAST(k + 1 AS INT), 1)) % 7 - 3
             AS BIGINT) AS w
         FROM tf, (SELECT unnest(range(0, 4)) AS k))
       SELECT source, CAST(k AS BIGINT) AS topic,
         CAST(sum(tf * w) AS BIGINT) AS score,
         CAST(sum(CASE WHEN w > 0 THEN tf * w ELSE 0 END) AS BIGINT)
           AS pos_mass,
         CAST(sum(CASE WHEN w < 0 THEN -tf * w ELSE 0 END) AS BIGINT)
           AS neg_mass
       FROM scored GROUP BY 1, 2 ORDER BY source, topic"""

  /** q338 — HASHING-TRICK COLLISION AUDIT: terms hash into 2¹²
    * feature buckets (the featurization that caps model width without
    * a vocabulary file); report the vocabulary size, buckets used,
    * terms sharing a bucket with a DIFFERENT term, and the permille
    * of token MASS sitting in collided buckets — the exact price of
    * the width cap.
    *
    * Scale: distinct-term frame → bucket fold; mass join-back is
    * term-keyed against the TF cells. */
  def q338HashingCollisions(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val tf = Tables.documents(spark, sfDir)
      .select(explode(TextFunctions.tokens($"text")).as("t"))
      .filter($"t" =!= "")
      .groupBy($"t").agg(count(lit(1)).as("tf"))
      .withColumn("bucket",
        expr("CAST(conv(substr(md5(t), 1, 8), 16, 10) AS BIGINT) % 4096"))
    val perBucket = tf.groupBy($"bucket")
      .agg(count(lit(1)).as("n_terms"), sum($"tf").as("mass"))
    perBucket.agg(
        sum($"n_terms").as("vocab"),
        count(lit(1)).as("buckets_used"),
        coalesce(sum(when($"n_terms" > 1, $"n_terms")), lit(0L))
          .as("collided_terms"),
        sum($"mass").as("total_mass"),
        coalesce(sum(when($"n_terms" > 1, $"mass")), lit(0L))
          .as("collided_mass"))
      .select($"vocab", $"buckets_used", $"collided_terms",
        expr("(1000 * collided_mass) div total_mass")
          .as("collided_mass_permille"))
  }

  def q338Sql: String =
    """WITH tf AS (
         SELECT t.token AS t, CAST(count(*) AS BIGINT) AS tf
         FROM documents,
           unnest(regexp_split_to_array(trim(text), '\s+')) AS t(token)
         WHERE t.token <> ''
         GROUP BY 1),
       b AS (
         SELECT CAST('0x' || substr(md5(t), 1, 8) AS BIGINT) % 4096
           AS bucket, t, tf
         FROM tf),
       per_bucket AS (
         SELECT bucket, CAST(count(*) AS BIGINT) AS n_terms,
           CAST(sum(tf) AS BIGINT) AS mass
         FROM b GROUP BY 1)
       SELECT CAST(sum(n_terms) AS BIGINT) AS vocab,
         CAST(count(*) AS BIGINT) AS buckets_used,
         CAST(coalesce(sum(CASE WHEN n_terms > 1 THEN n_terms END), 0)
           AS BIGINT) AS collided_terms,
         (1000 * CAST(coalesce(sum(CASE WHEN n_terms > 1 THEN mass END), 0)
           AS BIGINT)) // CAST(sum(mass) AS BIGINT)
           AS collided_mass_permille
       FROM per_bucket"""
}
