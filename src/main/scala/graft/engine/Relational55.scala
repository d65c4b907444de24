package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Seventy-fourth query wave: q355 hierarchy subtree rollup via
  * closed-form ancestor explosion (the BOM/org-chart aggregation
  * shape, recursion-free), q356 D'Hondt highest-averages seat
  * allocation (the divisor-method counterpart to q312's Hamilton
  * largest-remainder), and q357 reciprocal-rank fusion of two
  * retrieval rankings (the standard hybrid-search list merger).
  */
object Relational55 {

  /** Radix of the synthetic customer hierarchy in [[q355TreeRollup]]:
    * node k reports to k div 7, chains terminating at virtual root 0. */
  val Q355Radix = 7L

  /** (level j, 7^j) pairs as shared literals — BOTH engines consume
    * the same integer table, so no pow()-returns-double parity risk. */
  val Q355Powers: Seq[(Long, Long)] =
    (1L to 9L).map(j => j -> Seq.fill(j.toInt)(Q355Radix).product)

  /** q355 — HIERARCHY SUBTREE ROLLUP, recursion-free: customers form
    * a radix-7 tree (parent = key div 7), and every subtree's size,
    * account-balance total, and height must roll up to each internal
    * node — the BOM-explosion / org-chart aggregation. Because the
    * tree is radix-structured, the ancestor at height j is the CLOSED
    * FORM key div 7^j, so instead of an iterate-to-fixpoint join loop
    * (the genuine-recursion discipline: bounded rounds +
    * localCheckpoint, as in q242/q302) each row EMITS its ≤9 ancestor
    * contributions in one projection and a single hash aggregate
    * finishes the job. A row's level-j contribution exists iff
    * key ≥ 7^(j-1) (the chain hasn't already passed the root), which
    * counts each customer exactly once per ancestor, root included —
    * plus the degenerate key-0 customer (the root IS a customer in
    * this fixture), which contributes to node 0 alone.
    *
    * Scale: fan-out ≤ 9× the input (then folds map-side); the powers
    * frame is a 9-row broadcast. No joins between row-scale frames,
    * no recursion, no driver loop. */
  def q355TreeRollup(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val powers = Q355Powers.toDF("j", "p")
    Tables.customer(spark, sfDir)
      .select($"c_custkey".as("k"), Exact.cents($"c_acctbal").as("bal"))
      .crossJoin(broadcast(powers))
      .filter(expr(s"k >= p div ${Q355Radix} OR (k = 0 AND j = 1)"))
      .select(expr("k div p").as("node"), $"j", $"bal")
      .groupBy($"node")
      .agg(count(lit(1)).as("subtree_size"),
        sum($"bal").as("subtree_cents"),
        max($"j").as("height"))
      .orderBy($"node")
  }

  def q355Sql: String = {
    val powers = Q355Powers
      .map { case (j, p) => s"($j, $p)" }.mkString(", ")
    s"""WITH powers AS (
         SELECT * FROM (VALUES $powers) AS p(j, p)),
       contrib AS (
         SELECT c.c_custkey // p.p AS node, p.j,
           CAST(CAST(c.c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS bal
         FROM customer c CROSS JOIN powers p
         WHERE c.c_custkey >= p.p // ${Q355Radix}
            OR (c.c_custkey = 0 AND p.j = 1))
       SELECT node, CAST(count(*) AS BIGINT) AS subtree_size,
         CAST(sum(bal) AS BIGINT) AS subtree_cents,
         CAST(max(j) AS BIGINT) AS height
       FROM contrib GROUP BY node ORDER BY node"""
  }

  /** Seats allocated by [[q356Dhondt]]. */
  val Q356Seats = 100L

  /** q356 — D'HONDT SEAT ALLOCATION: 100 "capacity slots" divided
    * across nations proportionally to their order counts by the
    * highest-averages method — every nation generates quotients
    * votes/1, votes/2, …, and the 100 largest quotients win a slot
    * (proportional quota assignment for shard capacity, ad slots,
    * parliament seats — same math). The quotient is ONE IEEE division
    * of exact integers, bit-identical across engines, and boundary
    * ties resolve deterministically by (nation, divisor). The
    * contrast with q312's Hamilton largest-remainder method (which
    * can suffer the Alabama paradox; D'Hondt cannot) is the point of
    * carrying both.
    *
    * Scale: the quotient frame is |nations|·S rows — bounded by the
    * S parameter, not the data — and the global top-S is a
    * TakeOrderedAndProject (map-side heads, never a full sort). The
    * vote count itself is the usual orders⋈customer fold with the
    * dimension broadcast. */
  def q356Dhondt(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val votes = Tables.orders(spark, sfDir)
      .join(broadcast(Tables.customer(spark, sfDir)
        .select($"c_custkey", $"c_nationkey")), $"o_custkey" === $"c_custkey")
      .groupBy($"c_nationkey".as("nk"))
      .agg(count(lit(1)).as("votes"))
    val quotients = votes
      .crossJoin(broadcast(
        spark.range(1, Q356Seats + 1).select($"id".as("i"))))
      .select($"nk", $"votes", $"i",
        ($"votes".cast("double") / $"i".cast("double")).as("q"))
    val winners = quotients
      .orderBy($"q".desc, $"nk".asc, $"i".asc)
      .limit(Q356Seats.toInt)
      .groupBy($"nk")
      .agg(count(lit(1)).as("seats"), min($"q").as("last_quotient"))
    Tables.nation(spark, sfDir)
      .select($"n_nationkey", $"n_name")
      .join(votes, $"n_nationkey" === $"nk", "left_outer")
      .join(winners.select($"nk".as("wnk"), $"seats", $"last_quotient"),
        $"n_nationkey" === $"wnk", "left_outer")
      .na.fill(0L, Seq("votes", "seats"))
      .na.fill(0.0, Seq("last_quotient"))
      .select($"n_name", $"votes", $"seats", $"last_quotient")
      .orderBy($"n_name")
  }

  def q356Sql: String =
    s"""WITH votes AS (
         SELECT c.c_nationkey AS nk, CAST(count(*) AS BIGINT) AS votes
         FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
         GROUP BY 1),
       quotients AS (
         SELECT v.nk, v.votes, i.i,
           CAST(v.votes AS DOUBLE) / CAST(i.i AS DOUBLE) AS q
         FROM votes v
         CROSS JOIN (SELECT unnest(generate_series(1, ${Q356Seats}))
           AS i) i),
       winners AS (
         SELECT nk, CAST(count(*) AS BIGINT) AS seats,
           min(q) AS last_quotient
         FROM (SELECT * FROM quotients
               ORDER BY q DESC, nk ASC, i ASC LIMIT ${Q356Seats})
         GROUP BY nk)
       SELECT n.n_name, coalesce(v.votes, 0) AS votes,
         coalesce(w.seats, 0) AS seats,
         coalesce(w.last_quotient, 0.0) AS last_quotient
       FROM nation n
       LEFT JOIN votes v ON n.n_nationkey = v.nk
       LEFT JOIN winners w ON n.n_nationkey = w.nk
       ORDER BY n.n_name"""

  /** RRF smoothing constant (the standard k=60) and result depth. */
  val Q357K = 60L
  val Q357Top = 20

  /** q357 — RECIPROCAL-RANK FUSION: merge two document rankings —
    * length (n_chars) and lexical diversity (distinct whitespace
    * tokens) — into one hybrid list by RRF: score(d) = Σ_sys
    * 1/(60 + rank_sys(d)), the standard zero-tuning list merger for
    * hybrid (lexical + vector) retrieval. Scores ride an exact
    * micro-unit integer grid (10^6 div (60+rank) — non-negative, so
    * floor and truncate agree) and the fused top-20 breaks residual
    * ties by doc_id — fully deterministic.
    *
    * Scale: both global rankings come from [[DistRank.withRank]]
    * (bucketed parallel rank, zero single-partition windows — the
    * plan-sweep contract); the fusion is a doc_id equi join of two
    * rank frames and the top-20 is a bounded TakeOrderedAndProject. */
  def q357RrfFusion(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
      .select($"doc_id", $"n_chars",
        size(array_distinct(split($"text", " "))).cast("long").as("n_vocab"))
    val byLen = DistRank.withRank(
      docs.select($"doc_id", $"n_chars"), "n_chars", "doc_id",
      "rank_len", desc = true)
    val byVocab = DistRank.withRank(
      docs.select($"doc_id", $"n_vocab"), "n_vocab", "doc_id",
      "rank_vocab", desc = true)
    byLen.select($"doc_id", $"rank_len")
      .join(byVocab.select($"doc_id", $"rank_vocab"), Seq("doc_id"))
      .select($"doc_id", $"rank_len", $"rank_vocab",
        (expr(s"1000000 div (${Q357K} + rank_len)") +
          expr(s"1000000 div (${Q357K} + rank_vocab)")).as("rrf_micro"))
      .orderBy($"rrf_micro".desc, $"doc_id".asc)
      .limit(Q357Top)
  }

  def q357Sql: String =
    s"""WITH docs AS (
         SELECT doc_id, n_chars,
           CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
             AS n_vocab
         FROM documents),
       by_len AS (
         SELECT doc_id, CAST(row_number() OVER
           (ORDER BY n_chars DESC, doc_id ASC) AS BIGINT) AS rank_len
         FROM docs),
       by_vocab AS (
         SELECT doc_id, CAST(row_number() OVER
           (ORDER BY n_vocab DESC, doc_id ASC) AS BIGINT) AS rank_vocab
         FROM docs)
       SELECT l.doc_id, l.rank_len, v.rank_vocab,
         (1000000 // (${Q357K} + l.rank_len))
           + (1000000 // (${Q357K} + v.rank_vocab)) AS rrf_micro
       FROM by_len l JOIN by_vocab v ON l.doc_id = v.doc_id
       ORDER BY rrf_micro DESC, l.doc_id ASC
       LIMIT ${Q357Top}"""
}
