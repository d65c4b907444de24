package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Tenth query wave: frequency sketches with self-checked bounds,
  * correlated LATERAL joins, exact-integer regression, inverted-index
  * construction, and BM25 term weighting.
  *
  * The unifying theme is the QUERY surface a retrieval/curation stack
  * adds on top of the corpus: estimate frequencies without a second
  * scan (count-min), rank per group without a self-join (lateral),
  * fit per-key trends without a float ever crossing engines until the
  * final division (regression), and build the index structures
  * (postings, BM25 weights) that power retrieval over the corpus.
  */
object Relational8 {

  /** Count-min-sketch frequency bounds: one pass builds a CMS over
    * `user_id` (Spark's own `count_min_sketch` aggregate — mergeable
    * partials, so the same sketch is maintainable incrementally at
    * ingest like q114's HLL), then the exact top-20 users' counts are
    * probed against it. CMS guarantees est >= exact always (no
    * deletions) and est <= exact + eps*N with confidence 0.99; both
    * sides of that sandwich are emitted as an oracle-checked boolean —
    * the oracle can't run the sketch, so it emits `true` literally and
    * a drifting estimate hash-mismatches the gate (q114's pattern).
    *
    * Scale: the sketch is a fixed (depth x width) integer grid
    * regardless of key cardinality — the heavy-hitter shortlist costs
    * one aggregation of the key space, the sketch costs one map-side
    * pass, and probing is O(shortlist). */
  val CmsEps = 0.001
  val CmsConfidence = 0.99
  val CmsSeed = 42
  def q117CmsBounds(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val events = Tables.events(spark, sfDir)
    val sketch = events.agg(
      count_min_sketch($"user_id", lit(CmsEps), lit(CmsConfidence), lit(CmsSeed))
        .as("sk"),
      count(lit(1)).as("n_total"))
    val top = events.groupBy($"user_id").agg(count(lit(1)).as("n_exact"))
      .orderBy($"n_exact".desc, $"user_id").limit(20)
    val estimate = udf { (sk: Array[Byte], key: Long) =>
      org.apache.spark.util.sketch.CountMinSketch
        .readFrom(new java.io.ByteArrayInputStream(sk)).estimateCount(key)
    }
    top.crossJoin(sketch)
      .withColumn("est", estimate($"sk", $"user_id"))
      .select($"user_id", $"n_exact",
        ($"est" >= $"n_exact" &&
          $"est" <= $"n_exact" + ceil($"n_total" * CmsEps)).as("within_bound"))
      .orderBy($"n_exact".desc, $"user_id")
  }

  def q117Sql: String =
    """SELECT user_id, count(*) AS n_exact, true AS within_bound
       FROM events GROUP BY user_id
       ORDER BY n_exact DESC, user_id LIMIT 20"""

  /** Correlated LATERAL join: per-nation top-3 customers by account
    * balance, written as the SQL LATERAL form (the per-group-top-k
    * shape analysts reach for first). Catalyst decorrelates the
    * correlated LIMIT subquery into a join + per-key limit — the same
    * physical family as the window formulation (q13/q54) but declared
    * point-wise. Decimal balances exit through the integral-BIGINT /
    * one-division recipe (Exact.decToDouble's SQL twin) for bit-exact
    * cross-engine hashing.
    *
    * Scale: the decorrelated plan shuffles customer once by nation key
    * with a per-key limit — no driver loop over groups, no N+1
    * subquery execution. */
  def q118LateralTopk(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.nation(spark, sfDir).createOrReplaceTempView("graft_nation")
    Tables.customer(spark, sfDir).createOrReplaceTempView("graft_customer")
    spark.sql(q118Text("graft_nation", "graft_customer"))
  }

  private def q118Text(nation: String, customer: String): String =
    s"""SELECT n.n_name, t.c_name, t.c_acctbal
       FROM $nation n,
       LATERAL (
         SELECT c_name,
           -- 100.0 would parse as DECIMAL in Spark (decimal result) but
           -- float in DuckDB; the explicit DOUBLE keeps one IEEE division
           CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
             / CAST(100 AS DOUBLE) AS c_acctbal
         FROM $customer c
         WHERE c.c_nationkey = n.n_nationkey
         ORDER BY CAST(c_acctbal AS DECIMAL(18,2)) DESC, c_custkey
         LIMIT 3) t
       ORDER BY n.n_name, t.c_acctbal DESC, t.c_name"""

  def q118Sql: String = q118Text("nation", "customer")

  /** Per-type linear trend of the hourly event rate, with every moment
    * (n, Σx, Σy, Σxy, Σx², Σy²) an exact 64-bit integer: x is the hour
    * index rebased to each type's first hour, y the hourly count. Slope
    * and intercept are then ONE IEEE division of exact operands each,
    * and r² is one multiply per side of one division — deterministic
    * cross-engine because every float op sees bit-identical inputs
    * (q95/q108's integer-moments discipline applied to regression;
    * `regr_slope`-style float accumulation would drift under shuffle
    * reordering).
    *
    * Scale: the fact scan reduces to |types|·|hours| rows in one
    * map-side-combined aggregation; the regression itself runs on that
    * tiny grid. Rebasing uses a per-type window over the grid, not the
    * fact table. */
  def q121LinearTrend(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val hourly = Tables.events(spark, sfDir)
      .groupBy($"event_type", expr("unix_micros(ts) div 3600000000").as("h_abs"))
      .agg(count(lit(1)).as("y"))
    val rebased = hourly.withColumn("x",
      $"h_abs" - min($"h_abs").over(Window.partitionBy($"event_type")))
    val m = rebased.groupBy($"event_type").agg(
      count(lit(1)).as("n"),
      sum($"x").as("sx"), sum($"y").as("sy"),
      sum($"x" * $"y").as("sxy"),
      sum($"x" * $"x").as("sxx"),
      sum($"y" * $"y").as("syy"))
    m.select($"event_type", $"n",
        round(($"n" * $"sxy" - $"sx" * $"sy").cast("double")
          / ($"n" * $"sxx" - $"sx" * $"sx").cast("double"), 6).as("slope"),
        round(($"sy" * $"sxx" - $"sx" * $"sxy").cast("double")
          / ($"n" * $"sxx" - $"sx" * $"sx").cast("double"), 6).as("intercept"),
        round(
          (($"n" * $"sxy" - $"sx" * $"sy").cast("double")
            * ($"n" * $"sxy" - $"sx" * $"sy").cast("double"))
          / (($"n" * $"sxx" - $"sx" * $"sx").cast("double")
            * ($"n" * $"syy" - $"sy" * $"sy").cast("double")), 6).as("r2"))
      .orderBy($"event_type")
  }

  def q121Sql: String =
    """WITH hourly AS (
         SELECT event_type, epoch_us(ts) // 3600000000 AS h_abs,
           count(*) AS y
         FROM events GROUP BY 1, 2),
       rebased AS (
         SELECT event_type,
           h_abs - min(h_abs) OVER (PARTITION BY event_type) AS x, y
         FROM hourly),
       m AS (
         SELECT event_type, count(*) AS n,
           CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
           CAST(sum(x * y) AS BIGINT) AS sxy,
           CAST(sum(x * x) AS BIGINT) AS sxx,
           CAST(sum(y * y) AS BIGINT) AS syy
         FROM rebased GROUP BY 1)
       SELECT event_type, n,
         round(CAST(n * sxy - sx * sy AS DOUBLE)
           / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS slope,
         round(CAST(sy * sxx - sx * sxy AS DOUBLE)
           / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS intercept,
         round((CAST(n * sxy - sx * sy AS DOUBLE)
             * CAST(n * sxy - sx * sy AS DOUBLE))
           / (CAST(n * sxx - sx * sx AS DOUBLE)
             * CAST(n * syy - sy * sy AS DOUBLE)), 6) AS r2
       FROM m ORDER BY event_type"""

  /** Inverted-index construction: per token, the exact document
    * frequency plus the HEAD of its posting list (first 20 doc_ids,
    * sorted) emitted as one comma-joined string — arrays don't hash
    * portably across the gate, and the bounded head keeps every output
    * row a fixed width no matter how common the token is (an unbounded
    * `collect_set` on a stop-word would hold one entry per matching
    * document — millions at 100 TB). The distinct (token, doc_id) pass
    * is the standard index-build reduction; df and the packed head come
    * from the same single aggregation.
    *
    * Scale: one shuffle keyed by token with map-side distinct partials.
    * A full index build shards by token hash and spills whole lists to
    * the shard files — same plan with the slice removed; the df column
    * here is what decides which tokens even get materialized lists
    * (stop-words get skipped, rare tokens get exact postings). */
  val PostingHead = 20
  def q122InvertedIndex(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val dt = Tables.documents(spark, sfDir)
      .select($"doc_id", explode(graft.functions.TextFunctions.tokens($"text")).as("token"))
      .filter($"token" =!= "")
      .distinct()
    // rank-then-collect, NOT collect-then-slice: a collect_set over a
    // stop-word token would buffer one doc_id per matching document on
    // a single reducer before the slice trims it — the window keeps
    // per-token state in a spillable sort and only the <=20 surviving
    // rows ever reach the collect. df comes from the same partition
    // pass; the follow-up groupBy reuses the window's hash partitioning
    // (no second exchange).
    val w = Window.partitionBy($"token")
    val headed = dt
      .withColumn("rn", row_number().over(w.orderBy($"doc_id")))
      .withColumn("df", count(lit(1)).over(w))
      .filter($"rn" <= PostingHead)
    headed.groupBy($"token")
      .agg(first($"df").as("df"),
        array_join(
          transform(sort_array(collect_list($"doc_id")), _.cast("string")),
          ",").as("postings_head"))
      .orderBy($"token")
  }

  def q122Sql: String =
    s"""WITH dt AS (
         SELECT DISTINCT doc_id,
           unnest(regexp_split_to_array(trim(text), '\\s+')) AS token
         FROM documents)
       SELECT token, count(*) AS df,
         array_to_string(
           list_slice(list_sort(list(doc_id)), 1, $PostingHead),
           ',') AS postings_head
       FROM dt WHERE token <> ''
       GROUP BY token
       ORDER BY token"""

  /** BM25 term weighting (k1=1.2, b=0.75) over q44's document sample —
    * TF-IDF plus the two things retrieval actually needs: term-frequency
    * saturation (tf/(tf+k1·…) caps repeated-term influence) and document
    * -length normalization (b·dl/avgdl discounts long docs). The idf is
    * the non-negative (+1) variant, so weights never go negative on
    * ubiquitous terms. Every input to the float chain (tf, dl, df, n)
    * is an exact integer and both engines evaluate the identical
    * expression tree, so the only cross-engine hazard is `ln`'s last
    * ulp — absorbed by round(…,6) exactly as q44's log does.
    *
    * Scale: same shape as q44 — tf/df/dl are map-side-combined
    * aggregations of the token stream, the corpus stats are a 1-row
    * broadcast, and the final top-5-per-doc is a WindowGroupLimit
    * (map-side truncation, see PLANS.md q24). */
  def q123Bm25(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val toks = Tables.documents(spark, sfDir)
      .filter($"doc_id" % 10 === 0)
      .select($"doc_id", explode(graft.functions.TextFunctions.tokens($"text")).as("token"))
      .filter($"token" =!= "")
    val tf = toks.groupBy($"doc_id", $"token").agg(count(lit(1)).as("tf"))
    val dl = tf.groupBy($"doc_id").agg(sum($"tf").as("dl"))
    val dft = tf.groupBy($"token").agg(count(lit(1)).as("df"))
    val st = dl.agg(count(lit(1)).as("n"), sum($"dl").as("sum_dl"))
    val scored = tf.join(dl, Seq("doc_id")).join(dft, Seq("token")).crossJoin(st)
      .withColumn("bm25",
        round(
          log(($"n" - $"df" + lit(0.5)) / ($"df" + lit(0.5)) + lit(1.0))
            * ($"tf" * lit(2.2))
            / ($"tf" + lit(1.2) * (lit(0.25)
              + lit(0.75) * $"dl" / ($"sum_dl".cast("double") / $"n".cast("double")))),
          6))
    val w = Window.partitionBy($"doc_id").orderBy($"bm25".desc, $"token")
    scored.withColumn("rank", row_number().over(w))
      .filter($"rank" <= 5)
      .select($"doc_id", $"rank", $"token", $"bm25")
      .orderBy($"doc_id", $"rank")
  }

  def q123Sql: String =
    """WITH toks AS (
         SELECT doc_id,
           unnest(regexp_split_to_array(trim(text), '\s+')) AS token
         FROM documents WHERE doc_id % 10 = 0),
       tf AS (
         SELECT doc_id, token, count(*) AS tf
         FROM toks WHERE token <> '' GROUP BY 1, 2),
       dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY 1),
       dft AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
       st AS (SELECT count(*) AS n, CAST(sum(dl) AS BIGINT) AS sum_dl FROM dl),
       scored AS (
         SELECT tf.doc_id, tf.token,
           round(ln((st.n - dft.df + 0.5) / (dft.df + 0.5) + 1.0)
             * (tf.tf * 2.2)
             / (tf.tf + 1.2 * (0.25
               + 0.75 * dl.dl / (CAST(st.sum_dl AS DOUBLE) / CAST(st.n AS DOUBLE)))),
             6) AS bm25
         FROM tf JOIN dl USING (doc_id) JOIN dft USING (token) CROSS JOIN st),
       ranked AS (
         SELECT doc_id, token, bm25,
           row_number() OVER (PARTITION BY doc_id ORDER BY bm25 DESC, token)
             AS rank
         FROM scored)
       SELECT doc_id, rank, token, bm25 FROM ranked
       WHERE rank <= 5 ORDER BY doc_id, rank"""

  /** Approximate-percentile rank bound, self-checked: q113 notes that
    * at 100 TB its exact per-group percentiles swap to
    * `percentile_approx` — this query VALIDATES that swap. Per type,
    * the GK-sketch median (accuracy 1000 → rank error ≤ n/1000) is
    * probed by counting, exactly, how many values sit at or below it;
    * the guarantee `rank(est) ∈ [n/2 − n/1000, n/2 + n/1000]` is
    * emitted as an oracle-checked boolean (q114/q117's pattern — the
    * oracle can't run the sketch, so it emits `true` and a sketch
    * whose estimate ever leaves the band hash-mismatches the gate).
    * The band check is integer arithmetic (×1000 through), with one
    * row of slack each side for rank-ceiling ambiguity — no float
    * compare decides the flag.
    *
    * Scale: the sketch pass is one map-side-combined aggregation
    * (bounded GK summary per partition); the probe is a second scan
    * with the 5-row estimate frame broadcast back. */
  def q126ApproxPercentileBounds(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val events = Tables.events(spark, sfDir).select($"event_type", $"value")
    val est = events.groupBy($"event_type")
      .agg(count(lit(1)).as("n"),
        percentile_approx($"value", lit(0.5), lit(1000)).as("est"))
    events.join(broadcast(est), Seq("event_type"))
      .groupBy($"event_type")
      .agg(first($"n").as("n"),
        count(when($"value" <= $"est", 1)).as("rank_le"),
        count(when($"value" < $"est", 1)).as("rank_lt"))
      .select($"event_type", $"n",
        ($"rank_le" * 1000L >= $"n" * 500L - $"n" - 1000L &&
         $"rank_lt" * 1000L <= $"n" * 500L + $"n" + 1000L).as("within_bound"))
      .orderBy($"event_type")
  }

  def q126Sql: String =
    """SELECT event_type, count(*) AS n, true AS within_bound
       FROM events GROUP BY event_type ORDER BY event_type"""

  /** KMV distinct-count sketch ([[graft.functions.KmvSketch]], a
    * TypedImperativeAggregate — the third aggregate extension tier
    * after the codegen'd scalar Expression and the typed Aggregator).
    * Per type, the k=32 smallest distinct 32-bit hashes of user_id
    * yield the estimate (k−1)·2³²/h_k. A min-k set is completely
    * order-independent under update AND merge, so unlike the HLL/CMS
    * self-checks (q114/q117) the oracle recomputes the ESTIMATE ITSELF
    * bit-for-bit: rank the same hashes in SQL, take the 32nd, apply
    * the same integer division. The hash (first 8 md5 hex chars) is
    * computed outside the aggregate so both engines share it.
    *
    * Scale: partials ship k longs per partition regardless of input
    * size; the estimate column is maintainable per ingest batch and
    * re-mergeable later, like q114's sketch column. */
  val KmvK = 32
  def q127KmvDistinct(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, sfDir)
      .select($"event_type", $"user_id",
        conv(substring(md5($"user_id".cast("string")), 1, 8), 16, 10)
          .cast("long").as("hv"))
      .groupBy($"event_type")
      .agg(
        graft.functions.KmvAggregate.kmvDistinct($"hv", KmvK).as("kmv_est"),
        countDistinct($"user_id").as("n_exact"))
      .orderBy($"event_type")
  }

  def q127Sql: String =
    s"""WITH h AS (
         SELECT DISTINCT event_type,
           list_reduce(list_transform(range(1, 9), i ->
             strpos('0123456789abcdef',
               substr(md5(CAST(user_id AS VARCHAR)), CAST(i AS INT), 1)) - 1),
             (a, b) -> a * 16 + b) AS hv
         FROM events),
       kth AS (
         SELECT event_type, hv FROM (
           SELECT event_type, hv,
             row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rn
           FROM h)
         WHERE rn = $KmvK),
       cnt AS (SELECT event_type, count(*) AS nh FROM h GROUP BY 1),
       ex AS (
         SELECT event_type, count(DISTINCT user_id) AS n_exact
         FROM events GROUP BY 1)
       SELECT e.event_type,
         CAST(COALESCE((${KmvK - 1} * 4294967296) // kth.hv, cnt.nh) AS BIGINT)
           AS kmv_est,
         e.n_exact
       FROM ex e
       JOIN cnt USING (event_type)
       LEFT JOIN kth USING (event_type)
       ORDER BY event_type"""

  /** Cross-stream correlation matrix: Pearson correlation of each pair
    * of event types' hourly count series — the co-movement diagnostic
    * (do error spikes track click spikes?). The hourly grid is pivoted
    * to one column per type (explicit value list, reference A4's
    * pivot), then every moment (n, Σx, Σy, Σxy, Σx², Σy²) is an exact
    * 64-bit integer per pair; corr = num / sqrt(dx·dy) with the two
    * variance factors cast to double BEFORE the product (dx·dy can
    * exceed int64) — multiply, sqrt, divide are each one correctly-
    * rounded IEEE op on identical operands, so round(…,6) matches
    * cross-engine (q121's moment discipline extended to covariance).
    *
    * Scale: the fact scan reduces to |hours| rows in one aggregation;
    * the 10-pair matrix math runs on that grid. */
  def q133CrossCorrelation(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val types = Seq("click", "error", "purchase", "signup", "view")
    val hourly = Tables.events(spark, sfDir)
      .groupBy(expr("unix_micros(ts) div 3600000000").as("h"))
      .pivot("event_type", types)
      .agg(count(lit(1)))
      .na.fill(0L)
    val pairs = for {
      i <- types.indices; j <- (i + 1) until types.length
    } yield (types(i), types(j))
    // ALL moments in one aggregation over the hourly grid, pinned to a
    // 1-row frame — a lazy per-pair union would rescan the fact table
    // once per matrix cell
    val m = graft.engine.TempIo.materialize(spark,
      hourly.agg(
        count(lit(1)).as("n"),
        types.map(t => sum(col(t)).as(s"sx_$t")) ++
        types.map(t => sum(col(t) * col(t)).as(s"sxx_$t")) ++
        pairs.map { case (a, b) => sum(col(a) * col(b)).as(s"sxy_${a}_$b") }: _*))
    pairs.map { case (a, b) =>
      m.select(lit(a).as("type_a"), lit(b).as("type_b"),
        round(($"n" * col(s"sxy_${a}_$b") - col(s"sx_$a") * col(s"sx_$b"))
          .cast("double")
          / sqrt(($"n" * col(s"sxx_$a") - col(s"sx_$a") * col(s"sx_$a"))
            .cast("double")
            * (($"n" * col(s"sxx_$b") - col(s"sx_$b") * col(s"sx_$b"))
              .cast("double"))), 6).as("corr"))
    }.reduce(_.unionAll(_)).orderBy($"type_a", $"type_b")
  }

  def q133Sql: String = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    val cols = types.map(t =>
      s"count(*) FILTER (WHERE event_type = '$t') AS $t").mkString(", ")
    val pairs = for {
      i <- types.indices; j <- (i + 1) until types.length
    } yield (types(i), types(j))
    val selects = pairs.map { case (a, b) =>
      s"""SELECT '$a' AS type_a, '$b' AS type_b,
          round(CAST(n * sxy_${a}_$b - sx_$a * sx_$b AS DOUBLE)
            / sqrt(CAST(n * sxx_$a - sx_$a * sx_$a AS DOUBLE)
              * CAST(n * sxx_$b - sx_$b * sx_$b AS DOUBLE)), 6) AS corr
          FROM m"""
    }.mkString(" UNION ALL ")
    val moments = types.map(t =>
      s"CAST(sum($t) AS BIGINT) AS sx_$t, CAST(sum($t * $t) AS BIGINT) AS sxx_$t")
      .mkString(", ") + ", " +
      pairs.map { case (a, b) =>
        s"CAST(sum($a * $b) AS BIGINT) AS sxy_${a}_$b" }.mkString(", ")
    s"""WITH hourly AS (
          SELECT epoch_us(ts) // 3600000000 AS h, $cols
          FROM events GROUP BY 1),
        m AS (SELECT count(*) AS n, $moments FROM hourly)
        SELECT * FROM ($selects) ORDER BY type_a, type_b"""
  }

  /** Ordered funnel — sequence-pattern matching, not stage counting
    * (q69/q75 count per-stage survivors; this requires the steps to
    * happen IN ORDER per user): first view, then the first click
    * strictly after it, then the first purchase strictly after that.
    * Three chained full-frame window minima over ONE user-keyed
    * shuffle — each step's timestamp references the previous step's
    * (itself a per-user window scalar) inside its filter, so K steps
    * cost K window passes over the SAME partitioning, never a
    * re-scan or a per-stage self-join of the fact table. Each min is
    * exact, so step membership is bit-stable.
    *
    * Scale: one Exchange on user_id; the three Window operators and
    * the per-user reduction all reuse it (a naive funnel joins the
    * event table once per stage, tripling scan and shuffle volume). */
  def q134OrderedFunnel(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val byUser = Window.partitionBy($"user_id")
    val steps = Tables.events(spark, sfDir)
      .select($"user_id", $"event_type", unix_micros($"ts").as("us"))
      .withColumn("t1",
        min(when($"event_type" === "view", $"us")).over(byUser))
      .withColumn("t2",
        min(when($"event_type" === "click" && $"us" > $"t1", $"us")).over(byUser))
      .withColumn("t3",
        min(when($"event_type" === "purchase" && $"us" > $"t2", $"us")).over(byUser))
      .groupBy($"user_id")
      .agg(max($"t1").as("t1"), max($"t2").as("t2"), max($"t3").as("t3"))
    steps.agg(
      count(lit(1)).as("n_users"),
      count($"t1").as("n_viewed"),
      count($"t2").as("n_clicked_after"),
      count($"t3").as("n_purchased_after"))
  }

  def q134Sql: String =
    """WITH ev AS (
         SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
       s1 AS (
         SELECT user_id,
           min(CASE WHEN event_type = 'view' THEN us END) AS t1
         FROM ev GROUP BY user_id),
       s2 AS (
         SELECT s1.user_id, s1.t1,
           min(CASE WHEN ev.event_type = 'click' AND ev.us > s1.t1
             THEN ev.us END) AS t2
         FROM s1 LEFT JOIN ev ON s1.user_id = ev.user_id
         GROUP BY s1.user_id, s1.t1),
       s3 AS (
         SELECT s2.user_id, s2.t1, s2.t2,
           min(CASE WHEN ev.event_type = 'purchase' AND ev.us > s2.t2
             THEN ev.us END) AS t3
         FROM s2 LEFT JOIN ev ON s2.user_id = ev.user_id
         GROUP BY s2.user_id, s2.t1, s2.t2)
       SELECT count(*) AS n_users,
         count(t1) AS n_viewed,
         count(t2) AS n_clicked_after,
         count(t3) AS n_purchased_after
       FROM s3"""
}
