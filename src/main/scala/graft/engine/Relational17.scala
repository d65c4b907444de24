package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Twenty-fourth query wave: day-of-week seasonality, k-NN label
  * evaluation, contrastive negative sampling, and PSI drift — the
  * model-evaluation and training-pair layer.
  */
object Relational17 {

  /** q182 — day-of-week seasonality indices: per event type, each
    * weekday's mean spend relative to the type's overall mean (index
    * > 1 = that weekday runs hot). The multiplicative seasonal profile
    * a forecast baseline divides out BEFORE modeling (and the
    * captain's-eye check that a "trend" isn't just weekday mix). Exact
    * integer (sum, count) moments per (type, weekday) roll up to the
    * type totals WITHOUT rescanning (sum of sums), so the log is read
    * once; indices are two divisions on the 7×|types| frame in
    * identical op order. */
  def q182Seasonality(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val wd = Tables.events(spark, sfDir)
      .select($"event_type",
        date_format($"ts", "E").as("weekday"),
        dayofweek($"ts").as("dow"),
        Exact.cents($"value").as("c"))
      .groupBy($"event_type", $"weekday", $"dow")
      .agg(count(lit(1)).as("n"), sum($"c").as("s"))
    val tot = wd.groupBy($"event_type")
      .agg(sum($"n").as("nt"), sum($"s").as("st"))
    wd.join(tot, "event_type")
      .withColumn("day_mean", $"s".cast("double") / $"n".cast("double"))
      .withColumn("type_mean", $"st".cast("double") / $"nt".cast("double"))
      .select($"event_type", $"dow", $"weekday", $"n",
        round($"day_mean", 6).as("mean_cents"),
        round($"day_mean" / $"type_mean", 6).as("seasonal_index"))
      .orderBy($"event_type", $"dow")
  }

  def q182Sql: String =
    """WITH wd AS (
         SELECT event_type, strftime(ts, '%a') AS weekday,
           CAST(dayofweek(ts) + 1 AS BIGINT) AS dow,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
             AS BIGINT) AS s
         FROM events GROUP BY 1, 2, 3),
       tot AS (
         SELECT event_type, CAST(sum(n) AS BIGINT) AS nt,
           CAST(sum(s) AS BIGINT) AS st
         FROM wd GROUP BY 1)
       SELECT event_type, dow, weekday, n,
         round(CAST(s AS DOUBLE) / CAST(n AS DOUBLE), 6) AS mean_cents,
         round((CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
           / (CAST(st AS DOUBLE) / CAST(nt AS DOUBLE)), 6) AS seasonal_index
       FROM wd JOIN tot USING (event_type)
       ORDER BY event_type, dow"""

  /** Neighbor count for the label vote. */
  val Knn = 5

  /** q183 — k-NN label evaluation: every 25th vector is a held-out
    * query; its label is predicted by majority vote of its 5 nearest
    * corpus neighbors (cosine), and accuracy is reported per true
    * label — the standard embedding-quality probe (q166 calibrates
    * against ONE anchor; this evaluates the whole space). Scores are
    * rounded to the 6-dp grid BEFORE ranking (q166's ulp discipline),
    * votes are integer counts with ties broken toward the smaller
    * label id — every step engine-reproducible. Scale: same
    * broadcast-queries × corpus scan as q24, map-side WindowGroupLimit
    * for the top-k; the vote and accuracy frames are |queries| and
    * |labels| sized. (q25/q73/q146 are the sub-linear candidate paths
    * when the corpus outgrows brute force.) */
  def q183KnnEval(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sfDir)
    val queries = emb.filter($"vec_id" % 25 === 0)
      .select($"vec_id".as("qid"), $"embedding".as("q_emb"),
        $"label".as("true_label"))
    val scored = emb.filter($"vec_id" % 25 =!= 0)
      .crossJoin(broadcast(queries))
      .select($"qid", $"true_label", $"vec_id", $"label",
        round(Similarity.dot($"embedding", $"q_emb")
          / sqrt(Similarity.dot($"embedding", $"embedding")
            * Similarity.dot($"q_emb", $"q_emb")), 6).as("cos"))
    val w = Window.partitionBy($"qid").orderBy($"cos".desc, $"vec_id")
    val votes = scored
      .withColumn("rk", row_number().over(w))
      .filter($"rk" <= Knn)
      .groupBy($"qid", $"true_label", $"label")
      .agg(count(lit(1)).as("v"))
    // scalar vote key: v·100 − label is a total order (labels < 100),
    // max picks the highest vote, ties the smaller label id
    val pred = votes
      .groupBy($"qid", $"true_label")
      .agg(max_by($"label", $"v" * 100L - $"label").as("pred_label"))
    pred.groupBy($"true_label")
      .agg(count(lit(1)).as("n_queries"),
        sum(when($"pred_label" === $"true_label", 1L).otherwise(0L))
          .as("n_correct"))
      .withColumn("accuracy",
        round($"n_correct".cast("double") / $"n_queries".cast("double"), 6))
      .orderBy($"true_label")
  }

  def q183Sql: String = {
    val cos = Similarity.cosineSql("e.embedding", "q.q_emb")
    s"""WITH q AS (
          SELECT vec_id AS qid, embedding AS q_emb, label AS true_label
          FROM embeddings WHERE vec_id % 25 = 0),
        scored AS (
          SELECT qid, true_label, e.vec_id, e.label,
            round($cos, 6) AS cos
          FROM embeddings e CROSS JOIN q WHERE e.vec_id % 25 <> 0),
        ranked AS (
          SELECT qid, true_label, label,
            row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id)
              AS rk
          FROM scored),
        votes AS (
          SELECT qid, true_label, label, CAST(count(*) AS BIGINT) AS v
          FROM ranked WHERE rk <= 5 GROUP BY 1, 2, 3),
        pred AS (
          SELECT qid, true_label,
            max_by(label, v * 100 - label) AS pred_label
          FROM votes GROUP BY 1, 2)
        SELECT true_label, CAST(count(*) AS BIGINT) AS n_queries,
          CAST(sum(CASE WHEN pred_label = true_label THEN 1 ELSE 0 END)
            AS BIGINT) AS n_correct,
          round(CAST(sum(CASE WHEN pred_label = true_label THEN 1 ELSE 0 END)
            AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS accuracy
        FROM pred GROUP BY 1 ORDER BY true_label"""
  }

  /** Probe offsets for negative candidates (distinct primes, coprime
    * to any corpus size we meet, so each probe is a bijection). */
  val NegProbes: Seq[Long] = Seq(101L, 211L, 307L)
  /** Negatives kept per anchor. */
  val NegPerAnchor = 2

  /** q184 — contrastive negative sampling: each document (anchor)
    * gets 2 deterministic negatives drawn from OTHER sources — the
    * (anchor, negative) pair stream a contrastive/embedding trainer
    * consumes. Probing: candidate j for anchor a is doc (a + p_j) mod n
    * (ids are 0-based and contiguous) with prime offsets p_j — a
    * bijection, so every doc serves as a candidate exactly once per probe
    * (balanced negative usage, no hot docs); candidates sharing the
    * anchor's source are rejected and the first 2 survivors kept
    * (probe order = priority). The audit reports, per source, the
    * anchor count, kept-pair count, and the rejection rate — the
    * quantity that says whether 3 probes suffice. Scale: the probe
    * join is |docs|×3 rows equi-joined on doc id (no similarity
    * scoring — negatives are random-by-construction), shuffled once;
    * everything else is |sources|-sized. */
  def q184NegativeSampling(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
      .select($"doc_id", $"source")
    val n = docs.agg((max($"doc_id") + 1L).as("n"))
    val probes = docs.crossJoin(broadcast(n))
      .withColumn("j", explode(array(NegProbes.zipWithIndex.map {
        case (p, i) => struct(lit(i).as("pri"), lit(p).as("p"))
      }: _*)))
      .select($"doc_id", $"source", $"j.pri".as("pri"),
        expr(s"(doc_id + j.p) % n").as("cand_id"))
    val cands = probes.join(
      docs.select($"doc_id".as("cand_id"), $"source".as("cand_source")),
      "cand_id")
    val kept = cands.filter($"source" =!= $"cand_source")
      .withColumn("rk", row_number().over(
        Window.partitionBy($"doc_id").orderBy($"pri")))
      .filter($"rk" <= NegPerAnchor)
    kept.groupBy($"source")
      .agg(countDistinct($"doc_id").as("n_anchors"),
        count(lit(1)).as("n_pairs"),
        countDistinct($"cand_source").as("n_neg_sources"))
      .withColumn("fill_rate",
        round($"n_pairs".cast("double")
          / ($"n_anchors" * NegPerAnchor).cast("double"), 6))
      .orderBy($"source")
  }

  def q184Sql: String =
    """WITH nn AS (SELECT max(doc_id) + 1 AS n FROM documents),
       probes AS (
         SELECT d.doc_id, d.source, pr.pri,
           (d.doc_id + pr.p) % n AS cand_id
         FROM documents d CROSS JOIN nn
         CROSS JOIN (VALUES (0, 101), (1, 211), (2, 307)) AS pr(pri, p)),
       cands AS (
         SELECT p.doc_id, p.source, p.pri, c.source AS cand_source
         FROM probes p JOIN documents c ON c.doc_id = p.cand_id),
       kept AS (
         SELECT doc_id, source, cand_source,
           row_number() OVER (PARTITION BY doc_id ORDER BY pri) AS rk
         FROM cands WHERE source <> cand_source)
       SELECT source,
         CAST(count(DISTINCT doc_id) AS BIGINT) AS n_anchors,
         CAST(count(*) AS BIGINT) AS n_pairs,
         CAST(count(DISTINCT cand_source) AS BIGINT) AS n_neg_sources,
         round(CAST(count(*) AS DOUBLE)
           / CAST(count(DISTINCT doc_id) * 2 AS DOUBLE), 6) AS fill_rate
       FROM kept WHERE rk <= 2
       GROUP BY 1 ORDER BY source"""

  /** q185 — population stability index: how far has the spend
    * distribution drifted between the first and second half of the
    * period, per event type? PSI = Σ_bins (p − q)·ln(p/q) — THE
    * industry drift gauge (rule of thumb: > 0.2 = retrain). Bins are
    * fixed value-decades (integer edges — no quantile floats); both
    * halves' bin shares come from ONE aggregation with conditional
    * counts; Laplace-smoothed shares make empty bins finite. The
    * ordered fold over the ≤|bins| grid pins the float-sum order
    * (q152's discipline), ln ulp is absorbed at 6 dp. */
  def q185Psi(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val mid = Tables.events(spark, sfDir)
      .agg(expr("max(event_id) div 2").as("m"))
    val binned = Tables.events(spark, sfDir)
      .crossJoin(broadcast(mid))
      .select($"event_type", ($"event_id" <= $"m").as("first_half"),
        least(lit(5L), expr(
          "CAST(length(CAST(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS STRING)) AS BIGINT) - 1"))
          .as("bin"))
      .groupBy($"event_type", $"bin")
      .agg(sum(when($"first_half", 1L).otherwise(0L)).as("a"),
        sum(when(!$"first_half", 1L).otherwise(0L)).as("b"))
    val tot = binned.groupBy($"event_type")
      .agg(sum($"a").as("na"), sum($"b").as("nb"),
        count(lit(1)).as("nbins"))
    binned.join(tot, "event_type")
      .withColumn("p", ($"a" + 1L).cast("double")
        / ($"na" + $"nbins").cast("double"))
      .withColumn("q", ($"b" + 1L).cast("double")
        / ($"nb" + $"nbins").cast("double"))
      .withColumn("term", ($"p" - $"q") * log($"p" / $"q"))
      .groupBy($"event_type")
      .agg(aggregate(
        transform(array_sort(collect_list(struct($"bin", $"term"))),
          x => x.getField("term")),
        lit(0.0), (acc, v) => acc + v).as("psi_raw"),
        first($"na").as("n_first"), first($"nb").as("n_second"))
      .select($"event_type", $"n_first", $"n_second",
        round($"psi_raw", 6).as("psi"))
      .orderBy($"event_type")
  }

  def q185Sql: String =
    """WITH mid AS (SELECT max(event_id) // 2 AS m FROM events),
       binned AS (
         SELECT event_type,
           least(5, length(CAST(CAST(CAST(value AS DECIMAL(18,2)) * 100
             AS BIGINT) AS VARCHAR)) - 1) AS bin,
           CAST(sum(CASE WHEN event_id <= m THEN 1 ELSE 0 END) AS BIGINT)
             AS a,
           CAST(sum(CASE WHEN event_id > m THEN 1 ELSE 0 END) AS BIGINT)
             AS b
         FROM events CROSS JOIN mid GROUP BY 1, 2),
       tot AS (
         SELECT event_type, CAST(sum(a) AS BIGINT) AS na,
           CAST(sum(b) AS BIGINT) AS nb,
           CAST(count(*) AS BIGINT) AS nbins
         FROM binned GROUP BY 1),
       terms AS (
         SELECT event_type, bin, na, nb,
           (CAST(a + 1 AS DOUBLE) / CAST(na + nbins AS DOUBLE)
             - CAST(b + 1 AS DOUBLE) / CAST(nb + nbins AS DOUBLE))
           * ln((CAST(a + 1 AS DOUBLE) / CAST(na + nbins AS DOUBLE))
               / (CAST(b + 1 AS DOUBLE) / CAST(nb + nbins AS DOUBLE)))
             AS term
         FROM binned JOIN tot USING (event_type)),
       folded AS (
         SELECT event_type, max(na) AS n_first, max(nb) AS n_second,
           list_reduce(list_prepend(0.0, list(term ORDER BY bin)),
             (acc, v) -> acc + v) AS psi_raw
         FROM terms GROUP BY 1)
       SELECT event_type, CAST(n_first AS BIGINT) AS n_first,
         CAST(n_second AS BIGINT) AS n_second,
         round(psi_raw, 6) AS psi
       FROM folded ORDER BY event_type"""
}
