package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}

/** Twentieth query wave: attribution, collocation mining, model
  * calibration, data-skipping statistics, and event-time disorder — the
  * diagnostics layer over the same tables. The common thread is that
  * each reduces the data in ONE pass (a window over an existing
  * partitioning, or a combinable aggregate) and every verdict the query
  * emits is integer- or fixed-op-tree-deterministic across engines.
  */
object Relational13 {

  /** q164 — first-touch / last-touch revenue attribution: every
    * purchase's cents are credited to the user's earliest (first-touch)
    * and most recent (last-touch) PRECEDING non-purchase event type —
    * the two classic marketing-attribution models, computed in one
    * pass. Both touches come from IGNORE-NULLS windows over the
    * user-sequence partitioning (strictly `1 PRECEDING`, so a purchase
    * never credits itself — the same no-leakage frame discipline as
    * q109/q151), then one posexplode-style unpivot emits (model, touch)
    * pairs and a |types|²-bounded aggregate sums credit. Scale: one
    * shuffle on user_id — the partitioning every per-user window in the
    * engine already shares — then a tiny grouped sum. */
  def q164Attribution(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val seq = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val touch = when($"event_type" =!= "purchase", $"event_type")
    Tables.events(spark, sfDir)
      .select($"user_id", $"ts", $"event_id", $"event_type",
        Exact.cents($"value").as("cents"))
      .withColumn("first_touch", first(touch, ignoreNulls = true).over(seq))
      .withColumn("last_touch", last(touch, ignoreNulls = true).over(seq))
      .filter($"event_type" === "purchase")
      .select($"cents", expr(
        "stack(2, 'first', first_touch, 'last', last_touch) AS (model, touch)"))
      .filter($"touch".isNotNull)
      .groupBy($"model", $"touch")
      .agg(count(lit(1)).as("n_purchases"), sum($"cents").as("cents"))
      .orderBy($"model", $"touch")
  }

  def q164Sql: String =
    """WITH seq AS (
         SELECT user_id, event_id, event_type,
           CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
           first_value(CASE WHEN event_type <> 'purchase' THEN event_type END
             IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS first_touch,
           last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
             IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_touch
         FROM events),
       credited AS (
         SELECT model, touch, cents FROM (
           SELECT 'first' AS model, first_touch AS touch, cents
           FROM seq WHERE event_type = 'purchase'
           UNION ALL
           SELECT 'last' AS model, last_touch AS touch, cents
           FROM seq WHERE event_type = 'purchase') u
         WHERE touch IS NOT NULL)
       SELECT model, touch, CAST(count(*) AS BIGINT) AS n_purchases,
         CAST(sum(cents) AS BIGINT) AS cents
       FROM credited GROUP BY 1, 2 ORDER BY model, touch"""

  /** q165 — collocation strength: pointwise mutual information for the
    * 20 most frequent bigrams. PMI = ln(p(ab) / (p(a)·p(b))) with p(ab)
    * over the bigram population and p(a), p(b) over unigrams — high PMI
    * separates true collocations from pairs that co-occur because both
    * words are common (exactly what raw q94 counts cannot tell apart).
    *
    * All populations are integer counts off ONE tokenized scan (unigram
    * and bigram aggregates are both map-side combinable); PMI itself is
    * computed on the 20-row head, as one division chain in a fixed
    * order and a final ln whose last-ulp wobble round(…,6) absorbs (the
    * q44 tf-idf discipline). The unigram side meets the head by
    * broadcast — at 100 TB the vocabulary is still million-scale, the
    * broadcast degrades to a shuffle join on word, and nothing else
    * moves. */
  def q165Pmi(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val toks = Tables.documents(spark, sfDir)
      .select(TF.tokens($"text").as("toks"))
    val uni = toks.select(explode($"toks").as("w"))
      .groupBy($"w").agg(count(lit(1)).as("nw"))
    val nUni = uni.agg(sum($"nw").as("n_uni"))
    val bi = toks
      .select(graft.functions.Generators.wordShingles($"toks", 2))
      .groupBy($"shingle").agg(count(lit(1)).as("n_ab"))
    val nBi = bi.agg(sum($"n_ab").as("n_bi"))
    bi.orderBy($"n_ab".desc, $"shingle").limit(20)
      .withColumn("w1", split($"shingle", " ").getItem(0))
      .withColumn("w2", split($"shingle", " ").getItem(1))
      .join(broadcast(uni.select($"w".as("w1"), $"nw".as("n_a"))), "w1")
      .join(broadcast(uni.select($"w".as("w2"), $"nw".as("n_b"))), "w2")
      .crossJoin(broadcast(nUni)).crossJoin(broadcast(nBi))
      .select($"shingle".as("bigram"), $"n_ab", $"n_a", $"n_b",
        round(log(
          ($"n_ab".cast("double") / $"n_bi".cast("double"))
            / (($"n_a".cast("double") / $"n_uni".cast("double"))
              * ($"n_b".cast("double") / $"n_uni".cast("double")))), 6)
          .as("pmi"))
      .orderBy($"n_ab".desc, $"bigram")
  }

  def q165Sql: String =
    s"""WITH uni AS (
          SELECT unnest(string_split_regex(trim(text), '\\s+')) AS w
          FROM documents),
        uc AS (SELECT w, CAST(count(*) AS BIGINT) AS nw FROM uni GROUP BY 1),
        nu AS (SELECT CAST(sum(nw) AS BIGINT) AS n_uni FROM uc),
        bi AS (
          SELECT unnest(${Dedup.shinglesSqlN("text", 2)}) AS shingle
          FROM documents),
        bc AS (SELECT shingle, CAST(count(*) AS BIGINT) AS n_ab
               FROM bi GROUP BY 1),
        nb AS (SELECT CAST(sum(n_ab) AS BIGINT) AS n_bi FROM bc),
        head AS (
          SELECT shingle, n_ab,
            string_split(shingle, ' ')[1] AS w1,
            string_split(shingle, ' ')[2] AS w2
          FROM bc ORDER BY n_ab DESC, shingle LIMIT 20)
        SELECT shingle AS bigram, n_ab, a.nw AS n_a, b.nw AS n_b,
          round(ln(
            (CAST(n_ab AS DOUBLE) / CAST(n_bi AS DOUBLE))
              / ((CAST(a.nw AS DOUBLE) / CAST(n_uni AS DOUBLE))
                * (CAST(b.nw AS DOUBLE) / CAST(n_uni AS DOUBLE)))), 6) AS pmi
        FROM head
        JOIN uc a ON a.w = w1
        JOIN uc b ON b.w = w2
        CROSS JOIN nu CROSS JOIN nb
        ORDER BY n_ab DESC, bigram"""

  /** q166 — similarity calibration by decile: does cosine similarity to
    * an anchor vector actually predict same-class membership? Every
    * embedding scores against the anchor (vec_id 1, broadcast), scores
    * are rounded to the 6-decimal grid and deciled, and each decile
    * reports its mean score and the same-label rate — the calibration
    * table an ANN index is validated with (a well-behaved embedding
    * space shows match_rate monotone in the decile).
    *
    * Determinism: the cosine fold is the shared [[Similarity]] op tree
    * (left fold, IEEE-identical in DuckDB's list_reduce); scores enter
    * ranking only AFTER the 6-decimal rounding, so the decile boundary
    * can never hinge on a final-ulp disagreement; the decile mean is an
    * exact decimal sum ([[Exact.sumExact]]) over the rounded grid.
    * Scale: one corpus scan against a broadcast anchor; the global
    * decile rank is [[DistRank]]'s bucketed two-level row_number (exact,
    * parallel), not a single-partition window — the approximate path is
    * q126's sketch percentiles. */
  def q166Calibration(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sfDir)
    val anchor = emb.filter($"vec_id" === 1)
      .select($"embedding".as("a_emb"), $"label".as("a_label"))
    val scored = emb.filter($"vec_id" =!= 1)
      .crossJoin(broadcast(anchor))
      .select($"vec_id", $"label", $"a_label",
        round(Similarity.dot($"embedding", $"a_emb")
          / sqrt(Similarity.dot($"embedding", $"embedding")
            * Similarity.dot($"a_emb", $"a_emb")), 6).as("cos"))
    val n = scored.agg(count(lit(1)).as("n_total"))
    // Global rank via DistRank's bucketed two-level row_number (exact —
    // see DistRank scaladoc), not Window.orderBy: the whole scored corpus
    // never funnels through a single partition.
    DistRank.withRank(scored.crossJoin(broadcast(n)), "cos", "vec_id",
        "rn", desc = true)
      .withColumn("decile", expr("(rn - 1) * 10 div n_total"))
      .groupBy($"decile")
      .agg(count(lit(1)).as("n"),
        Exact.sumExact($"cos", 6).as("sum_cos"),
        sum(when($"label" === $"a_label", 1L).otherwise(0L)).as("n_match"))
      .select($"decile", $"n",
        round($"sum_cos" / $"n".cast("double"), 6).as("mean_cos"),
        $"n_match",
        round($"n_match".cast("double") / $"n".cast("double"), 6)
          .as("match_rate"))
      .orderBy($"decile")
  }

  def q166Sql: String = {
    val cos = Similarity.cosineSql("e.embedding", "a.embedding")
    s"""WITH a AS (SELECT embedding, label FROM embeddings WHERE vec_id = 1),
        scored AS (
          SELECT e.vec_id, e.label, a.label AS a_label,
            round($cos, 6) AS cos
          FROM embeddings e CROSS JOIN a WHERE e.vec_id <> 1),
        ranked AS (
          SELECT vec_id, label, a_label, cos,
            row_number() OVER (ORDER BY cos DESC, vec_id) AS rn,
            count(*) OVER () AS n_total
          FROM scored),
        g AS (
          SELECT CAST((rn - 1) * 10 // n_total AS BIGINT) AS decile,
            CAST(count(*) AS BIGINT) AS n,
            CAST(sum(CAST(CAST(cos AS DECIMAL(18,6)) * 1000000 AS BIGINT))
              AS BIGINT) / 1000000.0 AS sum_cos,
            CAST(sum(CASE WHEN label = a_label THEN 1 ELSE 0 END) AS BIGINT)
              AS n_match
          FROM ranked GROUP BY 1)
        SELECT decile, n,
          round(sum_cos / CAST(n AS DOUBLE), 6) AS mean_cos,
          n_match,
          round(CAST(n_match AS DOUBLE) / CAST(n AS DOUBLE), 6) AS match_rate
        FROM g ORDER BY decile"""
  }

  /** Rows per simulated file chunk (the row-group proxy). */
  val ZoneChunkRows = 400L

  /** q167 — zone-map audit: simulated file chunks each carry (min, max)
    * shipdate statistics — the parquet row-group / lakehouse file-stats
    * model — and a one-year predicate classifies every chunk as PRUNED
    * (stats disjoint from the range), FULL (stats contained — rows
    * qualify without evaluating the predicate), or PARTIAL (must be
    * read and filtered). The SAME predicate is audited under TWO
    * layouts: `arrival` (chunks cut along l_orderkey — the order data
    * lands in) and `clustered` (chunks cut along the shipdate sort —
    * what a clustering rewrite like q92's z-order produces). The output
    * is the data-skipping effectiveness table: an arrival layout leaves
    * every chunk PARTIAL (each spans the full date range), the
    * clustered layout prunes almost everything — at 100 TB that is the
    * difference between reading the month you asked for and reading
    * the lake. Stats building is one combinable aggregate per layout
    * (the clustered layout pays a one-off global rank — the write-time
    * clustering cost, simulated here with [[DistRank]]'s bucketed
    * two-level row_number rather than a single-partition window); the
    * classification is arithmetic on |chunks| rows. */
  def q167ZoneMap(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val lo = lit("1997-01-01").cast("timestamp")
    val hi = lit("1998-01-01").cast("timestamp")
    val li = Tables.lineitem(spark, sfDir)
      .select($"l_orderkey", $"l_linenumber", $"l_shipdate")
    val arrival = li
      .select(lit("arrival").as("layout"),
        expr("l_orderkey div 1000").as("chunk"), $"l_shipdate")
    // The clustering sort (shipdate, orderkey, linenumber) collapses to a
    // DistRank (key, tie) pair: key = shipdate in epoch-micros, tie =
    // orderkey*100 + linenumber (linenumber is 1..7, so the composite is
    // lexicographically faithful). Rank is consumed only as
    // `rn div ZoneChunkRows`, which the exact two-level rank preserves —
    // no single-partition window over all of lineitem.
    val clustered = DistRank.withRank(
        li.withColumn("__sd_us",
            unix_micros($"l_shipdate".cast("timestamp")))
          .withColumn("__tie", $"l_orderkey" * 100 + $"l_linenumber"),
        "__sd_us", "__tie", "rn", desc = false)
      .select(lit("clustered").as("layout"),
        expr(s"(rn - 1) div $ZoneChunkRows").as("chunk"), $"l_shipdate")
    arrival.unionByName(clustered)
      .groupBy($"layout", $"chunk")
      .agg(count(lit(1)).as("nr"), min($"l_shipdate").as("mn"),
        max($"l_shipdate").as("mx"))
      .withColumn("cls",
        when($"mx" < lo || $"mn" >= hi, lit("pruned"))
          .when($"mn" >= lo && $"mx" < hi, lit("full"))
          .otherwise(lit("partial")))
      .groupBy($"layout", $"cls")
      .agg(count(lit(1)).as("n_chunks"), sum($"nr").as("n_rows"))
      .orderBy($"layout", $"cls")
  }

  def q167Sql: String =
    """WITH arrival AS (
         SELECT 'arrival' AS layout, l_orderkey // 1000 AS chunk, l_shipdate
         FROM lineitem),
       clustered AS (
         SELECT 'clustered' AS layout,
           (row_number() OVER (ORDER BY l_shipdate, l_orderkey, l_linenumber)
             - 1) // 400 AS chunk,
           l_shipdate
         FROM lineitem),
       stats AS (
         SELECT layout, chunk, count(*) AS nr,
           min(l_shipdate) AS mn, max(l_shipdate) AS mx
         FROM (SELECT * FROM arrival UNION ALL SELECT * FROM clustered) u
         GROUP BY 1, 2),
       cls AS (
         SELECT layout, CASE
             WHEN mx < TIMESTAMP '1997-01-01' OR mn >= TIMESTAMP '1998-01-01'
               THEN 'pruned'
             WHEN mn >= TIMESTAMP '1997-01-01' AND mx < TIMESTAMP '1998-01-01'
               THEN 'full'
             ELSE 'partial' END AS cls,
           nr
         FROM stats)
       SELECT layout, cls, CAST(count(*) AS BIGINT) AS n_chunks,
         CAST(sum(nr) AS BIGINT) AS n_rows
       FROM cls GROUP BY 1, 2 ORDER BY layout, cls"""

  /** q168 — event-time disorder audit: how late do events arrive,
    * relative to the furthest event time already seen in arrival order?
    * lateness = running_max(ts) − ts over the arrival sequence — the
    * exact quantity a Structured Streaming watermark delay must
    * dominate (`withWatermark` drops anything later than the bound), so
    * this table IS the sizing input for every watermark in the
    * streaming layer (q27/q28/q40/q42…).
    *
    * The generated log is perfectly time-ordered, so arrival is
    * simulated with a bounded deterministic jitter: each event's
    * arrival key is its position displaced by a quadratic-residue
    * offset in [−48, 48] — the multi-partition transport interleaving a
    * real ingest exhibits, reproducible in both engines with pure
    * integer arithmetic (a real deployment orders by ingest offset
    * instead). Lateness lands in integer-decade buckets via a CASE
    * ladder — integer compares only, no float log near bucket edges.
    * The running max over the global arrival order is computed with the
    * two-level [[DistRank.withRunningMax]] discipline (bucketed local
    * running maxima + a tiny exclusive-prefix bounds frame), so no
    * WindowExec sees more than one bucket's rows — the same plan shape
    * a production run gets from PARTITION BY kafka_partition, derived
    * here from a deterministic synthetic ingest-partition key. */
  def q168OooAudit(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val arrived = Tables.events(spark, sfDir)
      .select($"event_id", unix_micros($"ts").as("us"))
      .withColumn("ak", expr("event_id + (event_id * event_id) % 97 - 48"))
    DistRank.withRunningMax(arrived, "ak", "event_id", "us", "run_max", 32)
      .withColumn("late_min", expr("(run_max - us) div 60000000"))
      .withColumn("bucket",
        when($"late_min" === 0, 0)
          .when($"late_min" < 10, 1)
          .when($"late_min" < 100, 2)
          .when($"late_min" < 1000, 3)
          .when($"late_min" < 10000, 4)
          .otherwise(5).cast("long"))
      .groupBy($"bucket")
      .agg(count(lit(1)).as("n"), max($"late_min").as("max_late_min"))
      .orderBy($"bucket")
  }

  def q168Sql: String =
    """WITH a AS (
         SELECT event_id, epoch_us(ts) AS us,
           event_id + (event_id * event_id) % 97 - 48 AS ak
         FROM events),
       lat AS (
         SELECT (max(us) OVER (ORDER BY ak, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - us)
             // 60000000 AS late_min
         FROM a),
       b AS (
         SELECT CASE WHEN late_min = 0 THEN 0
                     WHEN late_min < 10 THEN 1
                     WHEN late_min < 100 THEN 2
                     WHEN late_min < 1000 THEN 3
                     WHEN late_min < 10000 THEN 4
                     ELSE 5 END AS bucket,
           late_min
         FROM lat)
       SELECT CAST(bucket AS BIGINT) AS bucket,
         CAST(count(*) AS BIGINT) AS n,
         CAST(max(late_min) AS BIGINT) AS max_late_min
       FROM b GROUP BY 1 ORDER BY bucket"""
}
