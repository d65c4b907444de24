package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Thirty-third query wave — three operator shapes the engine had not
  * yet exercised: distributed weighted sampling without replacement
  * (q238), event-time RANGE window frames (q240), and fixed-point
  * iterative graph ranking (q242). Shared conventions: md5-derived
  * determinism (no RNG state), integer grids on every compared value,
  * and a total ORDER BY on each output.
  */
object Relational25 {

  val Q238SampleK = 100

  /** q238 — deterministic length-weighted sample WITHOUT replacement
    * (Efraimidis–Spirakis A-ES): each document draws priority
    * −ln(u)/w with u a doc_id-keyed md5 uniform and w = n_chars, and
    * the sample is the K smallest priorities — equivalent to the K
    * largest u^(1/w), the classic one-pass weighted reservoir. This is
    * the token-budget sampler a 100 TB curation pass uses to draw a
    * fixed-size corpus slice with inclusion probability ∝ document
    * length, with NO random state: re-running the pipeline reproduces
    * the same sample bit-for-bit (the q80/q104 md5-split discipline
    * applied to weighted selection).
    *
    * Determinism grid: u = (hv+1)/2^32 from the first 8 md5 hex digits
    * (exact IEEE division), ln(1/u) rounded to the 10⁻⁶ grid THEN
    * scaled to integer units, and the /w division is integer floor
    * division — so the ranking key is a BIGINT both engines compute
    * identically (the only cross-engine hazard, a final-ulp ln
    * disagreement flipping a 10⁻⁶ rounding boundary, has measure
    * ~4·10⁻⁹ per row). Ties break on doc_id.
    *
    * Scale: the plan is one corpus scan into TakeOrderedAndProject —
    * every task keeps its local top-K and ships K rows to the merge, so
    * the full priority column never shuffles and the global sort the
    * naive form would pay never exists. */
  def q238WeightedSample(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val hv = conv(substring(md5($"doc_id".cast("string")), 1, 8), 16, 10)
      .cast("long")
    Tables.documents(spark, sfDir)
      .filter($"n_chars" > 0)
      .withColumn("lnu_units",
        round(log(lit(4294967296.0) / (hv + 1)) * 1000000L).cast("long"))
      .withColumn("priority_units",
        expr("lnu_units * 1000000L div n_chars"))
      .select($"doc_id", $"lang", $"source", $"n_chars", $"priority_units")
      .orderBy($"priority_units", $"doc_id")
      .limit(Q238SampleK)
  }

  def q238Sql: String =
    s"""WITH h AS (
          SELECT doc_id, lang, source, n_chars,
            list_reduce(list_transform(range(1, 9), i ->
              strpos('0123456789abcdef',
                substr(md5(CAST(doc_id AS VARCHAR)), CAST(i AS INT), 1)) - 1),
              (a, b) -> a * 16 + b) AS hv
          FROM documents WHERE n_chars > 0),
        p AS (
          SELECT doc_id, lang, source, n_chars,
            CAST(round(ln(4294967296.0 / (hv + 1)) * 1000000) AS BIGINT)
              * 1000000 // n_chars AS priority_units
          FROM h)
        SELECT doc_id, lang, source, n_chars, priority_units
        FROM p ORDER BY priority_units, doc_id LIMIT $Q238SampleK"""

  val Q240TrailUs: Long = 3600000000L // 1 hour in microseconds

  /** q240 — event-time RANGE window frame: for every event, the count
    * and exact cents-sum of the SAME user's events in the trailing
    * hour of EVENT TIME (`rangeBetween(-1h, now]` over unix_micros) —
    * the per-entity trailing-window feature (velocity / spend-rate)
    * that fraud and engagement models consume. A ROWS frame counts
    * physical neighbors; only a RANGE frame answers "the last hour"
    * when per-user event spacing is irregular — and RANGE frames
    * handle equal-timestamp peers by including the whole peer group,
    * which is what makes the result order-deterministic under shuffle
    * (no tie-order dependence, unlike a ROWS frame over ties). The
    * per-event frame rows reduce to a compact audit: the distribution
    * of trailing-hour burst sizes per event type.
    *
    * Scale: ONE shuffle on user_id, then per-partition sorted sliding
    * frames — each user's timeline scans once with a two-pointer
    * window (WindowExec keyed by user, never global). The audit
    * re-aggregates map-side. */
  def q240RangeFrame(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"us")
      .rangeBetween(-Q240TrailUs, 0)
    Tables.events(spark, sfDir)
      .select($"user_id", $"event_type", unix_micros($"ts").as("us"),
        Exact.cents($"value").as("cents"))
      .withColumn("trailing_n", count(lit(1)).over(w))
      .withColumn("trailing_cents", sum($"cents").over(w))
      .groupBy($"event_type", $"trailing_n")
      .agg(count(lit(1)).as("n_events"),
        sum($"trailing_cents").as("sum_trailing_cents"))
      .orderBy($"event_type", $"trailing_n")
  }

  def q240Sql: String =
    s"""WITH f AS (
          SELECT event_type,
            count(*) OVER w AS trailing_n,
            sum(cents) OVER w AS trailing_cents
          FROM (
            SELECT user_id, event_type, epoch_us(ts) AS us,
              CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
            FROM events)
          WINDOW w AS (PARTITION BY user_id ORDER BY us
            RANGE BETWEEN $Q240TrailUs PRECEDING AND CURRENT ROW))
        SELECT event_type, trailing_n,
          CAST(count(*) AS BIGINT) AS n_events,
          CAST(sum(trailing_cents) AS BIGINT) AS sum_trailing_cents
        FROM f GROUP BY 1, 2 ORDER BY event_type, trailing_n"""

  val Q242Iters = 5
  val Q242TopN = 20

  /** q242 — PageRank (damping 0.85, [[Q242Iters]] fixed iterations) on
    * the bipartite customer↔supplier trade graph: nodes are 'c'-
    * prefixed custkeys and 's'-prefixed suppkeys, one undirected edge
    * (as two directed edges) per distinct trading pair from
    * orders⋈lineitem. All rank mass lives on the 10⁻⁶ integer grid:
    * contribution = rank div outdeg and the damped update is
    * 0.15 + 0.85·Σ as (150000 + 850·Σ div 1000) — exact 64-bit
    * arithmetic, so iteration order and shuffle order cannot move a
    * unit and the fixed-point trace is oracle-reproducible (floating
    * PageRank would drift per reduction order). Output: the [[Q242TopN]]
    * highest-ranked suppliers — the "most central counterparties" the
    * trade graph concentrates on.
    *
    * Scale: the canonical iterative join-agg — per iteration one
    * shuffle of |edges| contributions keyed by dst and one |nodes|
    * aggregate; edges and degrees build ONCE (lineage-truncated) and
    * re-join each pass. Spark's AQE handles the skewed high-degree
    * nodes; at graph scale the same loop runs over a bucketed edge
    * table so the dst shuffle is a bucket-local exchange. Every node
    * here has in/out degree ≥1 by construction (each edge enters both
    * directions), so no dangling-mass term is needed. */
  def q242PageRank(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // r14 shuffle diet: nodes are LONGS inside the loop (customer 2k,
    // supplier 2k+1 — half the shuffle bytes and cheaper hashing than
    // the 'c…'/'s…' strings, which only the 20 output rows need), the
    // sender's degree rides ON the edge list (one build-time join
    // instead of a ranks⋈deg join every iteration), and both loop
    // frames are checkpointed PRE-PARTITIONED on their join key — the
    // edge side by src, ranks by node (the groupBy(dst) output
    // partitioning carries through the checkpoint) — so each iteration
    // pays exactly ONE exchange: the contribution groupBy.
    val pairs = Tables.orders(spark, sfDir)
      .select($"o_orderkey", $"o_custkey")
      .join(Tables.lineitem(spark, sfDir).select($"l_orderkey", $"l_suppkey"),
        $"o_orderkey" === $"l_orderkey")
      .select(($"o_custkey" * 2).as("c"), ($"l_suppkey" * 2 + 1).as("s"))
      .distinct()
    val edges = pairs.select($"c".as("src"), $"s".as("dst"))
      .unionByName(pairs.select($"s".as("src"), $"c".as("dst")))
      .repartition(col("src"))
      .transform(Loops.cut)
    // downstream of the one edge shuffle, deg and the deg-carrying edge
    // list both reuse the src partitioning — no further edge-scale
    // exchange in the build either
    val deg = edges.groupBy($"src".as("node"))
      .agg(count(lit(1)).as("outdeg"))
      .transform(Loops.cut)
    val edgesDeg = edges
      .join(deg.select($"node".as("src"), $"outdeg"), Seq("src"))
      .transform(Loops.cut)
    var ranks = deg.select($"node", lit(1000000L).as("r"))
    (1 to Q242Iters).foreach { _ =>
      // localCheckpoint per iteration: plan depth stays constant across
      // the loop (one join-agg deep) instead of accreting the whole
      // iteration history — the discipline that lets the iteration
      // count grow without the optimizer re-planning an ever-taller
      // tree. (At cluster scale: checkpoint to storage instead.)
      ranks = ranks.join(edgesDeg, $"node" === $"src")
        .groupBy($"dst")
        .agg(sum(expr("r div outdeg")).as("in_sum"))
        .select($"dst".as("node"),
          (lit(150000L) + expr("850L * in_sum div 1000")).as("r"))
        .transform(Loops.cut)
    }
    ranks.filter($"node" % 2 === 1)
      .join(deg, "node")
      .select(concat(lit("s"), expr("node div 2")).as("node"),
        $"outdeg".as("n_partners"), $"r".as("rank_units"))
      .orderBy($"rank_units".desc, $"node")
      .limit(Q242TopN)
  }

  def q242Sql: String = {
    def step(prev: String, name: String) =
      s"""$name AS (
           SELECT e.dst AS node,
             150000 + 850 * sum(r.r // d.outdeg) // 1000 AS r
           FROM edges e
           JOIN $prev r ON e.src = r.node
           JOIN deg d ON d.node = r.node
           GROUP BY e.dst)"""
    s"""WITH pairs AS (
          SELECT DISTINCT 'c' || o_custkey AS c, 's' || l_suppkey AS s
          FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        edges AS (
          SELECT c AS src, s AS dst FROM pairs
          UNION ALL SELECT s AS src, c AS dst FROM pairs),
        deg AS (SELECT src AS node, count(*) AS outdeg FROM edges GROUP BY 1),
        r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM deg),
        ${(1 to Q242Iters).map(i => step(s"r${i - 1}", s"r$i")).mkString(",\n        ")}
        SELECT rf.node, CAST(d.outdeg AS BIGINT) AS n_partners,
          CAST(rf.r AS BIGINT) AS rank_units
        FROM r$Q242Iters rf JOIN deg d ON d.node = rf.node
        WHERE rf.node LIKE 's%'
        ORDER BY rank_units DESC, rf.node LIMIT $Q242TopN"""
  }
}
