package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Ninety-first query wave: q401 LSH band-configuration frontier (the
  * recall/cost curve a dedup pipeline tunes before a 100 TB run),
  * q402 TextRank keyword extraction (word-graph power iteration on
  * the integer grid), and q403 the threshold-algorithm scan-depth
  * audit (how much of two sorted score lists a top-k rank join must
  * actually read — Fagin/TA economics, computed exactly).
  */
object Relational71 {

  /** (config key, band count, rows per band) — 16 minhash components
    * partitioned three ways. More rows per band ⇒ fewer, stricter
    * bands ⇒ lower recall and fewer candidates; the frontier makes
    * the trade measurable before committing a cluster run. */
  val Q401Configs: Seq[(String, Int, Int)] =
    Seq(("b02", 2, 8), ("b04", 4, 4), ("b08", 8, 2))

  /** q401 — LSH BAND FRONTIER: empirical recall/precision of MinHash
    * banding at three (bands × rows) configurations over the SAME
    * 16-component signature, scored against the exact 3-shingle
    * Jaccard ≥ [[Relational67.Q390Tau]]‰ ground truth. Per config:
    * candidate-pair count (the cost a cluster pays in the bucket
    * join) plus hits/recall/precision against truth. The s-curve
    * tuning table every near-dup pipeline consults: r=8 bands are
    * nearly-free but blind, r=2 bands catch everything and flood the
    * verifier.
    *
    * Scale: signatures are one shingle scan (4 md5s per shingle);
    * candidates come from equi self-joins on (cfg, band_idx,
    * band_val) — bucketed, never all-pairs; truth verification runs
    * on shared-shingle pairs only. */
  def q401LshBandFrontier(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val sh = Tables.documents(spark, sfDir)
      .select($"doc_id", TextFunctions.tokens($"text").as("t"))
      .select($"doc_id", explode(expr(
        "transform(sequence(1, size(t) - 2), " +
          "i -> concat_ws(' ', slice(t, i, 3)))")).as("g"))
      .distinct().localCheckpoint()
    val hashed = sh.select(($"doc_id" +:
      (0 to 3).map(s => md5(concat($"g", lit(s"#$s"))).as(s"h$s"))): _*)
    val mins = for (s <- 0 to 3; j <- 0 to 3)
      yield min(substring(col(s"h$s"), 1 + 8 * j, 8)).as(s"m${4 * s + j}")
    val sig = hashed.groupBy($"doc_id").agg(mins.head, mins.tail: _*)
    val bandStructs = for {
      (cfg, _, r) <- Q401Configs
      (lo, bi) <- (0 until 16 by r).zipWithIndex
    } yield struct(lit(cfg).as("cfg"), lit(bi).as("bi"),
      concat((lo until lo + r).map(i => col(s"m$i")): _*).as("bv"))
    val bands = sig
      .select($"doc_id", explode(array(bandStructs: _*)).as("b"))
      .select($"doc_id", $"b.cfg".as("cfg"), $"b.bi".as("bi"),
        $"b.bv".as("bv"))
    // shuffle-hash (the Similarity.candidateJoin discipline): banded
    // candidate fan-out must parallelize by the key shuffle, never by
    // the probe side's split count
    val cand = bands.as("a").join(bands.as("b").hint("shuffle_hash"),
        $"a.cfg" === $"b.cfg" && $"a.bi" === $"b.bi" &&
          $"a.bv" === $"b.bv" && $"a.doc_id" < $"b.doc_id")
      .select($"a.cfg".as("cfg"), $"a.doc_id".as("da"),
        $"b.doc_id".as("db"))
      .distinct()
    // exact τ≥600‰ truth pairs — the PPJoin prefix-filtered shared
    // helper (identical pair set to the inline shingle self-join)
    val truth = Dedup.exactTruthPairs600(spark, sfDir)
    val nTruth = truth.agg(count(lit(1)).as("truth_pairs"))
    val perCfg = cand
      .join(truth.withColumn("isT", lit(1L)), Seq("da", "db"), "left_outer")
      .groupBy($"cfg")
      .agg(count(lit(1)).as("candidates"),
        sum(coalesce($"isT", lit(0L))).as("hits"))
    val cfgs = Q401Configs
      .map { case (c, b, r) => (c, b.toLong, r.toLong) }
      .toDF("cfg", "n_bands", "rows_per_band")
    cfgs
      .join(broadcast(perCfg), Seq("cfg"), "left_outer")
      .na.fill(0L, Seq("candidates", "hits"))
      .crossJoin(broadcast(nTruth))
      .select($"cfg", $"n_bands", $"rows_per_band", $"candidates",
        $"hits", $"truth_pairs",
        expr("CASE WHEN truth_pairs = 0 THEN 0 " +
          "ELSE (1000 * hits) div truth_pairs END").as("recall_permille"),
        expr("CASE WHEN candidates = 0 THEN 0 " +
          "ELSE (1000 * hits) div candidates END").as("precision_permille"))
      .orderBy($"cfg")
  }

  def q401Sql: String = {
    val minsSql = (for (s <- 0 to 3; j <- 0 to 3)
      yield s"min(substr(h$s, ${1 + 8 * j}, 8)) AS m${4 * s + j}")
      .mkString(", ")
    val bandsSql = (for {
      (cfg, _, r) <- Q401Configs
      (lo, bi) <- (0 until 16 by r).zipWithIndex
    } yield s"SELECT doc_id, '$cfg' AS cfg, $bi AS bi, " +
      (lo until lo + r).map(i => s"m$i").mkString(" || ") +
      " AS bv FROM sig").mkString("\n          UNION ALL ")
    val cfgRows = Q401Configs
      .map { case (c, b, r) => s"('$c', CAST($b AS BIGINT), CAST($r AS BIGINT))" }
      .mkString(", ")
    s"""WITH toks AS (
          SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
          FROM documents),
        sh AS (
          SELECT DISTINCT doc_id,
            t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS g
          FROM toks, unnest(range(1, len(t) - 1)) AS r(i)),
        hs AS (
          SELECT doc_id, md5(g || '#0') AS h0, md5(g || '#1') AS h1,
            md5(g || '#2') AS h2, md5(g || '#3') AS h3 FROM sh),
        sig AS (SELECT doc_id, $minsSql FROM hs GROUP BY doc_id),
        bands AS (
          $bandsSql),
        cand AS (
          SELECT DISTINCT a.cfg, a.doc_id AS da, b.doc_id AS db
          FROM bands a JOIN bands b
            ON a.cfg = b.cfg AND a.bi = b.bi AND a.bv = b.bv
            AND a.doc_id < b.doc_id),
        sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS s
               FROM sh GROUP BY 1),
        truth AS (
          SELECT x.doc_id AS da, y.doc_id AS db
          FROM sh x JOIN sh y ON x.g = y.g AND x.doc_id < y.doc_id
          GROUP BY 1, 2
          HAVING (1000 * count(*)) //
            ((SELECT s FROM sz WHERE doc_id = x.doc_id) +
             (SELECT s FROM sz WHERE doc_id = y.doc_id) - count(*))
            >= ${Relational67.Q390Tau}),
        nt AS (SELECT CAST(count(*) AS BIGINT) AS truth_pairs FROM truth),
        per_cfg AS (
          SELECT cfg, CAST(count(*) AS BIGINT) AS candidates,
            CAST(sum(CASE WHEN t.da IS NOT NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS hits
          FROM cand c LEFT JOIN truth t
            ON c.da = t.da AND c.db = t.db
          GROUP BY cfg),
        cfgs(cfg, n_bands, rows_per_band) AS (VALUES $cfgRows)
        SELECT c.cfg, c.n_bands, c.rows_per_band,
          coalesce(candidates, 0) AS candidates,
          coalesce(hits, 0) AS hits, truth_pairs,
          CASE WHEN truth_pairs = 0 THEN 0
            ELSE (1000 * coalesce(hits, 0)) // truth_pairs
            END AS recall_permille,
          CASE WHEN coalesce(candidates, 0) = 0 THEN 0
            ELSE (1000 * coalesce(hits, 0)) // candidates
            END AS precision_permille
        FROM cfgs c LEFT JOIN per_cfg p ON c.cfg = p.cfg
        CROSS JOIN nt ORDER BY c.cfg"""
  }

  /** Damped power-iteration rounds for q402 (and the unrolled oracle
    * CTE chain — each round referenced once, so no MATERIALIZED
    * hint is needed). */
  val Q402Iters = 3
  /** Keywords reported. */
  val Q402TopK = 10

  /** q402 — TEXTRANK KEYWORDS: undirected word-adjacency graph over
    * the corpus (edge weight = co-occurrence count, self-loops
    * dropped), damped PageRank on the 10⁶ integer grid for
    * [[Q402Iters]] rounds, top-[[Q402TopK]] words by final score —
    * keyword extraction as a graph query, the unsupervised tagger a
    * text pipeline runs where no model is allowed. Every step is
    * integer (per-edge contribution `(r·w) div wout`, damping
    * `150000 + (850·inmass) div 1000`), so both engines walk the
    * identical lattice.
    *
    * Scale: edges are a bigram count (one corpus scan, shuffle by
    * word pair — vocabulary-bounded); each round is |edges| join +
    * |vocab| aggregate with the rank frame localCheckpointed so plan
    * depth stays constant (the q242 loop discipline); top-k is
    * TakeOrderedAndProject. */
  def q402TextrankKeywords(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val big = Tables.documents(spark, sfDir)
      .select(TextFunctions.tokens($"text").as("t"))
      .select(explode(expr(
        "transform(sequence(1, size(t) - 1), " +
          "i -> struct(element_at(t, i) AS u, element_at(t, i + 1) AS v))"))
        .as("p"))
      .select($"p.u".as("u"), $"p.v".as("v"))
    val und = big.unionAll(big.select($"v".as("u"), $"u".as("v")))
    val edges = und.filter($"u" =!= $"v")
      .groupBy($"u", $"v").agg(count(lit(1)).as("w"))
      .localCheckpoint()
    val outw = edges.groupBy($"u").agg(sum($"w").as("wout"))
      .localCheckpoint()
    var ranks = outw.select($"u".as("node"), lit(1000000L).as("r"))
    for (_ <- 1 to Q402Iters) {
      ranks = edges
        .join(ranks.select($"node".as("u"), $"r"), Seq("u"))
        .join(outw, Seq("u"))
        .select($"v".as("node"), expr("(r * w) div wout").as("c"))
        .groupBy($"node").agg(sum($"c").as("inmass"))
        .select($"node",
          (lit(150000L) + expr("(850 * inmass) div 1000")).as("r"))
        .localCheckpoint()
    }
    ranks.select($"node".as("word"), $"r".as("score_grid"))
      .orderBy($"score_grid".desc, $"word")
      .limit(Q402TopK)
  }

  def q402Sql: String = {
    val rounds = (1 to Q402Iters).map { i =>
      s"""r$i AS (
           SELECT e.v AS node,
             CAST(150000 + (850 * sum((r.r * e.w) // o.wout)) // 1000
               AS BIGINT) AS r
           FROM edges e
             JOIN r${i - 1} r ON e.u = r.node
             JOIN outw o ON e.u = o.u
           GROUP BY e.v)"""
    }.mkString(",\n        ")
    s"""WITH toks AS (
          SELECT regexp_split_to_array(trim(text), '\\s+') AS t
          FROM documents),
        big AS (
          SELECT t[i] AS u, t[i+1] AS v
          FROM toks, unnest(range(1, len(t))) AS x(i)),
        und AS (SELECT u, v FROM big UNION ALL SELECT v AS u, u AS v FROM big),
        edges AS (
          SELECT u, v, CAST(count(*) AS BIGINT) AS w
          FROM und WHERE u <> v GROUP BY u, v),
        outw AS (SELECT u, sum(w) AS wout FROM edges GROUP BY u),
        r0 AS (SELECT u AS node, CAST(1000000 AS BIGINT) AS r FROM outw),
        $rounds
        SELECT node AS word, r AS score_grid FROM r$Q402Iters
        ORDER BY score_grid DESC, word LIMIT $Q402TopK"""
  }

  /** Top-k size for the q403 rank join. */
  val Q403K = 10
  /** Depth-grid bucket width for the distributed searchsorted. */
  val Q403Bucket = 64L

  /** q403 — THRESHOLD-ALGORITHM SCAN DEPTH: a top-[[Q403K]] rank join
    * over two sorted score lists (customers by account balance;
    * customers by their priciest order), scored total = s1 + s2.
    * Reports the EXACT depth at which Fagin's threshold algorithm
    * with random access terminates — the audit that tells you how
    * much of each 100 TB-scale sorted input a top-k join truly needs.
    * Computed closed-form: an object joins the stop-count at depth
    * q_o = max(min(r1,r2), dT_o) where dT_o is the first depth whose
    * threshold T(d) = s1(d)+s2(d) falls to its total; the TA stop
    * depth is the k-th smallest q_o. Also emitted: d_seen (depth
    * covering the true top-k) and d_stop (first depth with
    * T(d) ≤ t_k) whose max upper-bounds d_ta.
    *
    * Scale: both rank lists come from DistRank (no global windows);
    * the threshold inverse dT_o is a distributed searchsorted — a
    * [[Q403Bucket]]-wide zone-map frame broadcast against the
    * objects, then an equi-join refine inside the one matching
    * bucket. Balances shifted +10^5 cents so floor/truncate division
    * agree (all operands non-negative). */
  def q403TaDepth(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val cust = Tables.customer(spark, sfDir)
      .select($"c_custkey".cast("long").as("ck"),
        (Exact.cents($"c_acctbal") + 100000L).as("s1"))
    val ords = Tables.orders(spark, sfDir)
      .groupBy($"o_custkey".cast("long").as("ck"))
      .agg(max(Exact.cents($"o_totalprice")).as("s2"))
    val obj = cust.join(ords, Seq("ck"))
    // checkpoint between the two rank passes (the q170 discipline):
    // rank #2 consumes its input twice, which would re-run rank #1's
    // whole pipeline per branch
    val ranked0 = DistRank.withRank(obj, "s1", "ck", "r1", desc = true)
      .localCheckpoint()
    val ranked = DistRank.withRank(ranked0, "s2", "ck", "r2", desc = true)
      .select($"ck", $"s1", $"s2", ($"s1" + $"s2").as("total"),
        $"r1", $"r2", least($"r1", $"r2").as("dobj"))
      .localCheckpoint()
    val depth = ranked.select($"r1".as("d"), $"s1")
      .join(ranked.select($"r2".as("d"), $"s2"), Seq("d"))
      .select($"d", ($"s1" + $"s2").as("t"))
      .localCheckpoint()
    val top = ranked.orderBy($"total".desc, $"ck").limit(Q403K)
      .agg(max($"dobj").as("d_seen"), min($"total").as("tk"))
    val dStop = depth.crossJoin(broadcast(top))
      .filter($"t" <= $"tk")
      .agg(min($"d").as("d_stop"))
    val buck = depth.withColumn("bk", expr(s"(d - 1) div $Q403Bucket"))
    val bmin = buck.groupBy($"bk").agg(min($"t").as("tmin"))
    val firstBk = ranked.select($"ck", $"total", $"dobj")
      .join(broadcast(bmin), $"tmin" <= $"total")
      .groupBy($"ck", $"total", $"dobj").agg(min($"bk").as("bk"))
    val dt = firstBk
      .join(buck.select($"bk", $"d", $"t"), Seq("bk"))
      .filter($"t" <= $"total")
      .groupBy($"ck", $"dobj").agg(min($"d").as("dt"))
    val dTa = dt.select(greatest($"dobj", $"dt").as("qo"), $"ck")
      .orderBy($"qo".asc, $"ck").limit(Q403K)
      .agg(max($"qo").as("d_ta"))
    val n = ranked.agg(count(lit(1)).as("n_objects"))
    n.crossJoin(broadcast(top)).crossJoin(broadcast(dStop))
      .crossJoin(broadcast(dTa))
      .select($"n_objects", lit(Q403K.toLong).as("k"), $"tk",
        $"d_seen", $"d_stop", $"d_ta",
        expr("(1000 * d_ta) div n_objects").as("scanned_permille"))
  }

  def q403Sql: String =
    s"""WITH obj AS (
          SELECT c.c_custkey AS ck,
            CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
              + 100000 AS s1,
            o.s2
          FROM customer c JOIN (
            SELECT o_custkey,
              max(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
                AS s2
            FROM orders GROUP BY 1) o ON o.o_custkey = c.c_custkey),
        rk AS (
          SELECT ck, s1, s2, s1 + s2 AS total,
            row_number() OVER (ORDER BY s1 DESC, ck) AS r1,
            row_number() OVER (ORDER BY s2 DESC, ck) AS r2
          FROM obj),
        rk2 AS (SELECT *, least(r1, r2) AS dobj FROM rk),
        depth AS (
          SELECT a.r1 AS d, a.s1 + b.s2 AS t
          FROM rk2 a JOIN rk2 b ON b.r2 = a.r1),
        top AS (
          SELECT CAST(max(dobj) AS BIGINT) AS d_seen, min(total) AS tk
          FROM (SELECT dobj, total FROM rk2
                ORDER BY total DESC, ck LIMIT $Q403K)),
        dstop AS (
          SELECT CAST(min(d) AS BIGINT) AS d_stop
          FROM depth, top WHERE t <= tk),
        dts AS (
          SELECT ck, dobj,
            (SELECT min(d) FROM depth WHERE t <= rk2.total) AS dt
          FROM rk2),
        dta AS (
          SELECT CAST(max(qo) AS BIGINT) AS d_ta
          FROM (SELECT greatest(dobj, dt) AS qo, ck FROM dts
                ORDER BY qo ASC, ck LIMIT $Q403K)),
        n AS (SELECT CAST(count(*) AS BIGINT) AS n_objects FROM rk2)
        SELECT n_objects, CAST($Q403K AS BIGINT) AS k, tk, d_seen,
          d_stop, d_ta, (1000 * d_ta) // n_objects AS scanned_permille
        FROM n, top, dstop, dta"""
}
