package graft.engine

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Sixty-eighth query wave: q339 change-point detection (the binary-
  * segmentation split step, exact integer mean-shift argmax over the
  * calendar frame) and q340 greedy set cover (the submodular
  * shard-selection loop — which corpus shards must ship to cover 90% of an
  * eval vocabulary), with the q230-style unrolled-CTE oracle.
  */
object Relational49 {

  /** q339 — CHANGE-POINT SPLIT: per event type, the day boundary that
    * maximizes the exact mean-shift statistic |S₁·n₂ − S₂·n₁| (S =
    * cent mass, n = event count on each side) — the argmax step of
    * binary segmentation, on an integer statistic so the argmax is
    * engine-exact (the SSE-gain form needs S² products that overflow;
    * the cross-multiplied mean difference is the bounded equivalent
    * contract). Ties resolve to the earliest day.
    *
    * Scale: events fold to the (type × day) calendar frame; prefix
    * sums and the argmax run per type over that bounded frame. */
  def q339ChangePoint(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val day = Tables.events(spark, sfDir)
      .select($"event_type",
        expr("unix_micros(ts) div 86400000000").as("day"),
        Exact.cents($"value").as("c"))
      .groupBy($"event_type", $"day")
      .agg(count(lit(1)).as("n"), sum($"c").as("s"))
    val byType = Window.partitionBy($"event_type").orderBy($"day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.partitionBy($"event_type")
    val scored = day
      .withColumn("n1", sum($"n").over(byType))
      .withColumn("s1", sum($"s").over(byType))
      .withColumn("nt", sum($"n").over(tot))
      .withColumn("st", sum($"s").over(tot))
      .withColumn("metric",
        abs($"s1" * ($"nt" - $"n1") - ($"st" - $"s1") * $"n1"))
    scored
      .withColumn("rk", row_number().over(
        Window.partitionBy($"event_type").orderBy($"metric".desc, $"day")))
      .filter($"rk" === 1)
      .select($"event_type", $"day".as("split_day"),
        $"n1", ($"nt" - $"n1").as("n2"), $"s1".as("s1_cents"),
        ($"st" - $"s1").as("s2_cents"), $"metric")
      .orderBy($"event_type")
  }

  def q339Sql: String =
    """WITH day AS (
         SELECT event_type, epoch_us(ts) // 86400000000 AS day,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
             AS BIGINT) AS s
         FROM events GROUP BY 1, 2),
       scored AS (
         SELECT event_type, day, n, s,
           CAST(sum(n) OVER (PARTITION BY event_type ORDER BY day
             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n1,
           CAST(sum(s) OVER (PARTITION BY event_type ORDER BY day
             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS s1,
           CAST(sum(n) OVER (PARTITION BY event_type) AS BIGINT) AS nt,
           CAST(sum(s) OVER (PARTITION BY event_type) AS BIGINT) AS st
         FROM day),
       ranked AS (
         SELECT event_type, day, n1, s1, nt, st,
           abs(s1 * (nt - n1) - (st - s1) * n1) AS metric,
           row_number() OVER (PARTITION BY event_type
             ORDER BY abs(s1 * (nt - n1) - (st - s1) * n1) DESC, day)
             AS rk
         FROM scored)
       SELECT event_type, day AS split_day, n1,
         CAST(nt - n1 AS BIGINT) AS n2, s1 AS s1_cents,
         CAST(st - s1 AS BIGINT) AS s2_cents,
         CAST(metric AS BIGINT) AS metric
       FROM ranked WHERE rk = 1 ORDER BY event_type"""

  private val CoverSteps = 6

  /** q340 — GREEDY SET COVER: which 6 source/lang shards, chosen greedily by
    * marginal vocabulary coverage, cover the most of the eval set's
    * (doc_id ≡ 0 mod 10) token vocabulary — the submodular selection
    * loop behind "which crawls do we actually need". Each step is one
    * anti-join + grouped count + a 1-row driver argmax (6 bounded
    * scalars total, the q230 k-center discipline); covered tokens
    * localCheckpoint between steps.
    *
    * Oracle: the same greedy unrolled as chained CTEs (q230's
    * pattern), bit-exact because ties break on shard name. */
  def q340GreedyCover(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val toks = Tables.documents(spark, sfDir)
      .select($"doc_id", concat($"source", lit("/"), $"lang").as("shard"),
        TextFunctions.tokens($"text").as("tk"))
      .select($"doc_id", $"shard", explode(Dedup.shinglesOf($"tk")).as("t"))
    val u = toks.filter($"doc_id" % 10 === 0).select($"t").distinct()
      .transform(Loops.cut)
    val m = toks.select($"shard", $"t").distinct()
      .join(u, Seq("t")).transform(Loops.cut)
    val uTotal = u.count()
    var covered = spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row], u.schema)
    val picks = Seq.newBuilder[(Int, String, Long, Long)]
    var step = 1
    var done = false
    while (step <= CoverSteps && !done) {
      // one 1-row driver argmax per step; empty means U is fully
      // covered — the loop ends exactly where the oracle's unrolled
      // LIMIT-1 arms go empty
      val bestRows = m.join(covered, Seq("t"), "left_anti")
        .groupBy($"shard").agg(count(lit(1)).as("gain"))
        .orderBy($"gain".desc, $"shard").limit(1).collect()
      if (bestRows.isEmpty) done = true
      else {
        val best = bestRows.head
        val src = best.getAs[String]("shard")
        covered = covered
          .union(m.filter($"shard" === src).select($"t"))
          .distinct().transform(Loops.cut)
        picks += ((step, src, best.getAs[Long]("gain"), covered.count()))
        step += 1
      }
    }
    import spark.implicits._
    picks.result().toDF("step", "shard", "gain", "cum_covered")
      .select($"step".cast("long").as("step"), $"shard", $"gain",
        $"cum_covered",
        expr(s"(1000 * cum_covered) div $uTotal").as("covered_permille"))
      .orderBy($"step")
  }

  def q340Sql: String = {
    val sh = s"unnest(${Dedup.shinglesSqlN("text", 3)}) AS tk(t)"
    val sb = new StringBuilder
    // every CTE is MATERIALIZED: c_i references c_{i-1} more than once
    // and the tail references every c_i again — plain CTEs re-inline
    // exponentially in CoverSteps (the q368/q383 oracle class; found
    // live by the x10-carve full-catalog compare)
    sb ++= s"""WITH u AS MATERIALIZED (
          SELECT DISTINCT t FROM documents, $sh
          WHERE doc_id % 10 = 0),
        m AS MATERIALIZED (
          SELECT DISTINCT d.source || '/' || d.lang AS shard, tk.t
          FROM documents d, $sh
          WHERE t IN (SELECT t FROM u)),
        s1 AS MATERIALIZED (
          SELECT shard, CAST(count(*) AS BIGINT) AS gain
          FROM m GROUP BY 1 ORDER BY gain DESC, shard LIMIT 1),
        c1 AS MATERIALIZED (SELECT DISTINCT m.t FROM m JOIN s1 USING (shard))"""
    for (i <- 2 to CoverSteps) {
      sb ++= s""",
        s$i AS MATERIALIZED (
          SELECT m.shard, CAST(count(*) AS BIGINT) AS gain
          FROM m WHERE m.t NOT IN (SELECT t FROM c${i - 1})
          GROUP BY 1 ORDER BY gain DESC, shard LIMIT 1),
        c$i AS MATERIALIZED (SELECT t FROM c${i - 1}
                UNION SELECT m.t FROM m JOIN s$i USING (shard))"""
    }
    sb ++= s"""
        SELECT CAST(1 AS BIGINT) AS step, shard, gain,
          (SELECT CAST(count(*) AS BIGINT) FROM c1) AS cum_covered,
          (1000 * (SELECT CAST(count(*) AS BIGINT) FROM c1))
            // (SELECT CAST(count(*) AS BIGINT) FROM u) AS covered_permille
        FROM s1"""
    for (i <- 2 to CoverSteps) sb ++= s"""
        UNION ALL SELECT CAST($i AS BIGINT), shard, gain,
          (SELECT CAST(count(*) AS BIGINT) FROM c$i),
          (1000 * (SELECT CAST(count(*) AS BIGINT) FROM c$i))
            // (SELECT CAST(count(*) AS BIGINT) FROM u)
        FROM s$i"""
    sb ++= "\n        ORDER BY step"
    sb.toString
  }
}
