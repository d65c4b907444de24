package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Thirty-fourth query wave — three shapes a 100 TB curation platform
  * needs that the engine had not yet exercised: privacy auditing over a
  * generalization lattice (q247 k-anonymity / l-diversity), an exact
  * edit-distance similarity join with PassJoin partition signatures
  * (q248), and a Hilbert space-filling-curve clustering audit measured
  * against z-order and arrival layouts (q249). Shared conventions:
  * every compared value lives on an integer grid, every output carries
  * a total ORDER BY, and every fact-scale shuffle is keyed by a
  * natural join/group key — never a global single-partition funnel.
  */
object Relational26 {

  /** q247 — k-anonymity / l-diversity audit over a generalization
    * lattice: the release-safety gate a training-data pipeline runs
    * before shipping user-adjacent records. Quasi-identifiers are
    * (nationality, account-balance) at four generalization levels —
    * L0 exact cents, L1 $100 bands, L2 $1000 bands, L3 $1000 bands
    * with nation generalized to region via the dimension hierarchy
    * (a broadcast join, the taxonomy step of Samarati's lattice) —
    * and c_mktsegment is the SENSITIVE attribute (never part of the
    * QI). Per level the audit reports the equivalence-class count,
    * the re-identifiable row mass under k ∈ {2, 5, 10} (rows in
    * classes smaller than k — what suppression would have to drop),
    * and the l-diversity floor (min distinct sensitive values per
    * class, plus how many classes a homogeneity attack defeats).
    *
    * Shape: ONE customer scan; the four lattice levels leave the scan
    * as an `inline(array(struct...))` fan-out (a projection, no
    * self-union rescans), so the plan is scan → broadcast-join the
    * nation hierarchy → explode ×4 → two cascaded partial-aggregable
    * groupBys (class frame, then 4-row level frame). The only
    * fact-scale shuffle keys by (level, g1, g2) — exactly the class
    * key. Balance cents are shifted +10^5 before banding so the floor
    * division is over non-negative values (Spark `div` truncates
    * toward zero, DuckDB `//` floors — they only agree on ≥ 0). */
  def q247KAnonymity(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val nat = Tables.nation(spark, sfDir)
      .select($"n_nationkey", $"n_regionkey")
    val qi = Tables.customer(spark, sfDir)
      .join(broadcast(nat), $"c_nationkey" === $"n_nationkey")
      .select($"c_nationkey".cast("long").as("nat"),
        $"n_regionkey".cast("long").as("region"),
        (Exact.cents($"c_acctbal") + 100000L).as("cents"),
        $"c_mktsegment".as("seg"))
    val leveled = qi.select(
      inline(array(
        struct(lit(0).as("level"), $"nat".as("g1"), $"cents".as("g2")),
        struct(lit(1).as("level"), $"nat".as("g1"),
          expr("cents div 10000").as("g2")),
        struct(lit(2).as("level"), $"nat".as("g1"),
          expr("cents div 100000").as("g2")),
        struct(lit(3).as("level"), $"region".as("g1"),
          expr("cents div 100000").as("g2")))),
      $"seg")
    leveled.groupBy($"level", $"g1", $"g2")
      .agg(count(lit(1)).as("cnt"), countDistinct($"seg").as("ndist"))
      .groupBy($"level")
      .agg(count(lit(1)).as("n_classes"),
        coalesce(sum(when($"cnt" < 2, $"cnt")), lit(0L)).as("k2_rows"),
        coalesce(sum(when($"cnt" < 5, $"cnt")), lit(0L)).as("k5_rows"),
        coalesce(sum(when($"cnt" < 10, $"cnt")), lit(0L)).as("k10_rows"),
        min($"ndist").as("min_l"),
        sum(when($"ndist" < 2, 1L).otherwise(0L)).as("l2_classes"))
      .orderBy($"level")
  }

  def q247Sql: String =
    """WITH qi AS (
         SELECT CAST(c_nationkey AS BIGINT) AS nat,
           CAST(n_regionkey AS BIGINT) AS region,
           CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
             + 100000 AS cents,
           c_mktsegment AS seg
         FROM customer JOIN nation ON c_nationkey = n_nationkey),
       lev AS (
         SELECT 0 AS level, nat AS g1, cents AS g2, seg FROM qi
         UNION ALL SELECT 1, nat, cents // 10000, seg FROM qi
         UNION ALL SELECT 2, nat, cents // 100000, seg FROM qi
         UNION ALL SELECT 3, region, cents // 100000, seg FROM qi),
       cls AS (
         SELECT level, g1, g2, CAST(count(*) AS BIGINT) AS cnt,
           CAST(count(DISTINCT seg) AS BIGINT) AS ndist
         FROM lev GROUP BY 1, 2, 3)
       SELECT level, CAST(count(*) AS BIGINT) AS n_classes,
         CAST(coalesce(sum(CASE WHEN cnt < 2 THEN cnt END), 0) AS BIGINT)
           AS k2_rows,
         CAST(coalesce(sum(CASE WHEN cnt < 5 THEN cnt END), 0) AS BIGINT)
           AS k5_rows,
         CAST(coalesce(sum(CASE WHEN cnt < 10 THEN cnt END), 0) AS BIGINT)
           AS k10_rows,
         CAST(min(ndist) AS BIGINT) AS min_l,
         CAST(sum(CASE WHEN ndist < 2 THEN 1 ELSE 0 END) AS BIGINT)
           AS l2_classes
       FROM cls GROUP BY level ORDER BY level"""

  /** Edit-distance threshold for q248 (PassJoin τ) and its chunk count
    * (τ + 1: by pigeonhole, ≤ τ edits leave at least one of τ+1
    * partition chunks untouched). */
  val EdTau = 3
  private val EdChunks = EdTau + 1

  /** 0-based start of chunk `i` when a length-`lb` string is evenly
    * partitioned into [[EdChunks]] pieces (first lb%c chunks get the
    * extra char) — shared SQL text so Spark and the oracle partition
    * identically. */
  private def chunkStart(i: String, lb: String) =
    s"($i * ($lb div $EdChunks) + least($i, $lb % $EdChunks))"
  private def chunkLen(i: String, lb: String) =
    s"(($lb div $EdChunks) + (CASE WHEN $i < $lb % $EdChunks THEN 1 ELSE 0 END))"

  /** q248 — exact edit-distance similarity join (PassJoin): all pairs
    * of part NAMES within Levenshtein distance ≤ [[EdTau]], the fuzzy
    * record-linkage primitive (catalog reconciliation, OCR/typo
    * clustering, alias resolution). The three-stage exact pipeline:
    *
    *  1. DEDUPE-BEFORE-VERIFY — the join runs over DISTINCT names with
    *     their multiplicities; row-level pair cardinality is recovered
    *     at the end as cnt_a·cnt_b. At 100 TB this is the difference
    *     between verifying |distinct|² candidates and |rows|².
    *  2. PARTITION SIGNATURES — each indexed name is split into τ+1
    *     even chunks; if ed(a,b) ≤ τ, pigeonhole leaves ≥ 1 chunk of b
    *     unedited, appearing in a at a position shifted ≤ τ. Each
    *     probing name therefore emits, for every hypothetical partner
    *     length lb ∈ [la−τ, la+τ] and chunk index, the substrings at
    *     the chunk's position ± τ. Candidates = equi-join on
    *     (chunk_idx, gram, lb) — the ONLY fact-scale shuffle, keyed by
    *     signature, no cross join anywhere.
    *  3. BOUNDED VERIFY — `levenshtein(a, b, τ)` (Spark's
    *     threshold form: the banded O(τ·L) DP that returns −1 above τ,
    *     not the full O(L²) table).
    *
    * The probe fan-out rides a 196-row broadcast combo frame
    * (chunk × length-offset × shift), so signature generation is a
    * projection, not a UDF. Oracle: brute-force distinct-name cross
    * join — the blocking must be result-invisible. */
  def q248EdJoin(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val names = Tables.part(spark, sfDir)
      .groupBy($"p_name".as("nm"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("la", length($"nm").cast("int"))
    // index side: the τ+1 partition chunks of every distinct name
    val idx = names
      .crossJoin(broadcast(spark.range(EdChunks).select($"id".cast("int").as("i"))))
      .select($"nm".as("nm_b"), $"la".as("lb"), $"i",
        expr(s"substring(nm, ${chunkStart("i", "la")} + 1, ${chunkLen("i", "la")})")
          .as("gram"))
    // probe side: substrings at each candidate (partner length, chunk,
    // shift) — combos = chunk idx × lbOff ∈ [−τ, τ] × shift ∈ [−τ, τ]
    val w = 2 * EdTau + 1
    val combos = spark.range(EdChunks.toLong * w * w).select(
      expr(s"CAST(id div ${w * w} AS INT)").as("i"),
      expr(s"CAST((id div $w) % $w - $EdTau AS INT)").as("lbOff"),
      expr(s"CAST(id % $w - $EdTau AS INT)").as("shift"))
    val probes = names.crossJoin(broadcast(combos))
      .withColumn("lb", $"la" + $"lbOff")
      .filter($"lb" >= EdChunks) // partner chunks must be non-empty
      .withColumn("p", expr(chunkStart("i", "lb")) + $"shift")
      .withColumn("glen", expr(chunkLen("i", "lb")))
      .filter($"p" >= 0 && $"p" + $"glen" <= $"la")
      .select($"nm".as("nm_a"), $"i", $"lb",
        expr("substring(nm, p + 1, glen)").as("gram"))
    // Short-string completion: the pigeonhole signatures only cover
    // partners of length ≥ τ+1 (the `lb >= EdChunks` guard — shorter
    // strings can't donate a non-empty chunk per piece), so any pair
    // involving a name with < τ+1 characters would silently never
    // become a candidate. Those names form a DOMAIN-bounded set (at
    // most |Σ|^τ strings exist below the cutoff; for this catalog it is
    // empty), so they pair directly against the length-proximate slice
    // via a broadcast — completeness restored without touching the
    // fact-scale signature join.
    val shorts = names.filter($"la" < EdChunks)
      .select($"nm".as("nm_s"), $"la".as("ls"))
    val shortPairs = names.select($"nm".as("nm_o"), $"la".as("lo"))
      .join(broadcast(shorts),
        abs($"lo" - $"ls") <= EdTau && $"nm_s" =!= $"nm_o")
      .select(least($"nm_s", $"nm_o").as("name_a"),
        greatest($"nm_s", $"nm_o").as("name_b"))
    val cand = probes.join(idx, Seq("i", "gram", "lb"))
      .filter($"nm_a" =!= $"nm_b")
      .select(least($"nm_a", $"nm_b").as("name_a"),
        greatest($"nm_a", $"nm_b").as("name_b"))
      .unionByName(shortPairs)
      .distinct()
    val verified = cand
      .withColumn("dist",
        levenshtein($"name_a", $"name_b", EdTau).cast("long"))
      .filter($"dist" >= 0)
    val cnts = names.select($"nm", $"cnt")
    verified
      .join(broadcast(cnts.withColumnRenamed("nm", "name_a")
        .withColumnRenamed("cnt", "cnt_a")), Seq("name_a"))
      .join(broadcast(cnts.withColumnRenamed("nm", "name_b")
        .withColumnRenamed("cnt", "cnt_b")), Seq("name_b"))
      .select($"name_a", $"name_b", $"dist",
        ($"cnt_a" * $"cnt_b").as("n_pairs"))
      .orderBy($"name_a", $"name_b")
  }

  def q248Sql: String =
    s"""WITH names AS (
          SELECT p_name AS nm, CAST(count(*) AS BIGINT) AS cnt
          FROM part GROUP BY 1)
        SELECT a.nm AS name_a, b.nm AS name_b,
          CAST(levenshtein(a.nm, b.nm) AS BIGINT) AS dist,
          a.cnt * b.cnt AS n_pairs
        FROM names a JOIN names b
          ON a.nm < b.nm AND levenshtein(a.nm, b.nm) <= $EdTau
        ORDER BY name_a, name_b"""

  /** Hilbert grid: bits per dimension and chunk size for the q249
    * layout audit (matches q92's z-order ZBits so the two curves are
    * compared on the same grid). */
  val HBits = 8
  val HSide = 1 << HBits // 256
  val HChunkRows = 400L

  /** One round of the iterative Hilbert xy→d transform as dialect-
    * neutral SQL text (only `&`, `*`, `+`, `-`, CASE — Spark and
    * DuckDB disagree on `^`, which DuckDB parses as power, so the
    * quadrant Gray code (3·rx) XOR ry is written as its arithmetic
    * identity 3rx + ry − 2·rx·ry over rx, ry ∈ {0, 1}). Returns the
    * (d', x', y') expressions for quadrant size `s`; the rotation is
    * the classic n-sized reflect-and-swap, which keeps x, y inside
    * [0, n) — no negative bitwise operands anywhere. */
  private def hilbertRound(s: Int, x: String, y: String, d: String)
      : (String, String, String) = {
    val n = HSide
    val rx = s"(CASE WHEN ($x & $s) > 0 THEN 1 ELSE 0 END)"
    val ry = s"(CASE WHEN ($y & $s) > 0 THEN 1 ELSE 0 END)"
    val dE = s"$d + ${s.toLong * s} * (3 * $rx + $ry - 2 * $rx * $ry)"
    val xE = s"CASE WHEN $ry = 0 THEN (CASE WHEN $rx = 1 " +
      s"THEN ${n - 1} - $y ELSE $y END) ELSE $x END"
    val yE = s"CASE WHEN $ry = 0 THEN (CASE WHEN $rx = 1 " +
      s"THEN ${n - 1} - $x ELSE $x END) ELSE $y END"
    (dE, xE, yE)
  }

  private val HRounds: Seq[Int] = (0 until HBits).map(k => HSide >> (k + 1))

  /** Append `hd` = the Hilbert curve index of (x, y) — [[HBits]] chained
    * projections (one per quadrant level). Chained, NOT textually
    * inlined: each round's (x', y') reads the previous round's columns
    * twice, so a single collapsed expression would grow 4^bits;
    * Catalyst's CollapseProject keeps multiply-referenced non-trivial
    * aliases in separate codegen'd projections. */
  private[graft] def withHilbert(df: DataFrame, keep: Seq[String]): DataFrame = {
    var cur = df.withColumn("__hx", col("x")).withColumn("__hy", col("y"))
      .withColumn("hd", lit(0L))
    for (s <- HRounds) {
      val (dE, xE, yE) = hilbertRound(s, "__hx", "__hy", "hd")
      cur = cur.select(
        (keep.map(col) :+ expr(dE).as("hd") :+
          expr(xE).as("__hx") :+ expr(yE).as("__hy")): _*)
    }
    cur.drop("__hx", "__hy")
  }

  /** The same chain as chained CTEs for the DuckDB oracle (MATERIALIZED
    * so a single-reference CTE inliner cannot re-expand the recursion
    * into the 4^bits expression the chained form exists to avoid). */
  private def hilbertCtes(src: String, keep: String): (String, String) = {
    val stages = HRounds.zipWithIndex.map { case (s, k) =>
      val (dE, xE, yE) = hilbertRound(s, "hx", "hy", "hd")
      s"h${k + 1} AS MATERIALIZED (SELECT $keep, $dE AS hd, $xE AS hx, $yE AS hy FROM h$k)"
    }
    val chain =
      (s"h0 AS (SELECT $keep, x AS hx, y AS hy, CAST(0 AS BIGINT) AS hd FROM $src)"
        +: stages).mkString(",\n        ")
    (chain, s"h${HRounds.size}")
  }

  /** The 2-D predicate box the layouts are audited against: one eighth
    * of each dimension → ~1/64 of the grid area. */
  private val (bx1, bx2, by1, by2) = (64, 95, 128, 159)

  /** q249 — space-filling-curve layout audit: the SAME 2-D box
    * predicate (shipdate band × orderkey band) is evaluated against
    * per-chunk (min, max) zone stats under THREE physical layouts of
    * lineitem — `arrival` (orderkey order, what lands), `zorder`
    * (q92's bit-interleave), and `hilbert` (this wave's curve; unlike
    * z-order, successive Hilbert cells are always edge-adjacent, so
    * chunk bounding boxes have no diagonal jumps and prune tighter).
    * Chunks are equal-row carves of each ordering ([[DistRank]]'s
    * bucketed two-level rank — no single-partition window over
    * lineitem), stats one combinable aggregate per layout, and the
    * verdict the q167 trichotomy: PRUNED (stats disjoint), FULL (box
    * contains the chunk), PARTIAL (must read + filter). `rows_read`
    * (mass in non-pruned chunks) against constant `rows_qual` is the
    * read-amplification score — at 100 TB the difference between the
    * three layouts is the difference between reading the month you
    * asked for and reading the lake. Dimensions are scaled to the
    * [[HBits]]-bit grid from one broadcast bounds row; the Hilbert
    * index is the native codegen expression
    * [[graft.functions.LayoutExpressions.HilbertIndex]] (one loop per
    * row inside WholeStageCodegen), bit-equal to the [[withHilbert]]
    * SQL chain the DuckDB oracle runs. */
  def q249HilbertLayout(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, sfDir)
      .select($"l_orderkey", $"l_linenumber", $"l_shipdate")
    val bounds = li.agg(
      min(to_date($"l_shipdate")).as("d0"),
      datediff(max(to_date($"l_shipdate")), min(to_date($"l_shipdate")))
        .as("span"),
      max($"l_orderkey").as("okmax"))
    val dims = li.crossJoin(broadcast(bounds))
      .select($"l_orderkey", $"l_linenumber",
        expr(s"CAST(datediff(to_date(l_shipdate), d0) * $HSide" +
          " div (span + 1) AS BIGINT)").as("x"),
        expr(s"CAST(l_orderkey * $HSide div (okmax + 1) AS BIGINT)").as("y"))
    // hd via the NATIVE codegen expression (one tight loop per row —
    // LayoutExpressionsSpec proves it bit-equal to the withHilbert SQL
    // chain the oracle runs); localCheckpoint because THREE DistRank
    // carves each walk this frame several times (cut points, bucketing,
    // counts) — materializing once replaces ~9 re-derivations of the
    // curve/interleave arithmetic with one
    val withKeys = dims
      .withColumn("hd",
        graft.functions.LayoutExpressions.hilbertD($"x", $"y", HBits))
      .withColumn("z", Relational5.zValue($"x", $"y"))
      .withColumn("arr", $"l_orderkey" * 8 + $"l_linenumber")
      .localCheckpoint()
    // r14 note: a fused single-exchange form (one labeled ×3 union, one
    // window over (layout, bucket)) was implemented, oracle-verified,
    // and A/B-measured — parity at sf0.1 and ~20% SLOWER at the ×10
    // carve (the union shuffles the same total bytes as the three
    // per-layout exchanges, and the 3-wide bucket-expression projection
    // feeds one long exchange instead of three pipelined ones), so the
    // per-layout DistRank carve stays; it inherits the r14 DistRank
    // exchange-sharing improvement (input evaluations 3 → 2 per carve).
    def carve(df: DataFrame, key: String, layout: String): DataFrame =
      DistRank.withRank(df, key, "arr", "rn", desc = false)
        .select(lit(layout).as("layout"),
          expr(s"(rn - 1) div $HChunkRows").as("chunk"), $"x", $"y")
    val all = carve(withKeys, "arr", "arrival")
      .unionByName(carve(withKeys, "z", "zorder"))
      .unionByName(carve(withKeys, "hd", "hilbert"))
    val boxed = all.withColumn("q",
      when($"x".between(bx1, bx2) && $"y".between(by1, by2), 1L)
        .otherwise(0L))
    boxed.groupBy($"layout", $"chunk")
      .agg(count(lit(1)).as("nr"), sum($"q").as("nq"),
        min($"x").as("xmn"), max($"x").as("xmx"),
        min($"y").as("ymn"), max($"y").as("ymx"))
      .withColumn("cls",
        when($"xmx" < bx1 || $"xmn" > bx2 || $"ymx" < by1 || $"ymn" > by2,
          "PRUNED")
          .when($"xmn" >= bx1 && $"xmx" <= bx2 &&
            $"ymn" >= by1 && $"ymx" <= by2, "FULL")
          .otherwise("PARTIAL"))
      .groupBy($"layout")
      .agg(count(lit(1)).as("n_chunks"),
        sum(when($"cls" === "PRUNED", 1L).otherwise(0L)).as("pruned"),
        sum(when($"cls" === "FULL", 1L).otherwise(0L)).as("full"),
        sum(when($"cls" =!= "PRUNED", $"nr").otherwise(0L)).as("rows_read"),
        sum($"nq").as("rows_qual"))
      .orderBy($"layout")
  }

  def q249Sql: String = {
    val z = Relational5.zValueSql("x", "y")
    val (hilbertChain, hLast) = hilbertCtes("dims", "l_orderkey, l_linenumber, x, y")
    s"""WITH li AS (
          SELECT l_orderkey, l_linenumber, CAST(l_shipdate AS DATE) AS sd
          FROM lineitem),
        b AS (SELECT min(sd) AS d0,
                date_diff('day', min(sd), max(sd)) AS span,
                max(l_orderkey) AS okmax FROM li),
        dims AS (
          SELECT l_orderkey, l_linenumber,
            CAST(date_diff('day', b.d0, sd) * $HSide // (b.span + 1) AS BIGINT) AS x,
            CAST(l_orderkey * $HSide // (b.okmax + 1) AS BIGINT) AS y
          FROM li CROSS JOIN b),
        $hilbertChain,
        keyed AS (
          SELECT l_orderkey, l_linenumber, x, y, hd, CAST(($z) AS BIGINT) AS z,
            l_orderkey * 8 + l_linenumber AS arr
          FROM $hLast),
        carved AS (
          SELECT 'arrival' AS layout,
            (row_number() OVER (ORDER BY arr, arr) - 1) // $HChunkRows AS chunk,
            x, y FROM keyed
          UNION ALL
          SELECT 'zorder',
            (row_number() OVER (ORDER BY z, arr) - 1) // $HChunkRows, x, y
          FROM keyed
          UNION ALL
          SELECT 'hilbert',
            (row_number() OVER (ORDER BY hd, arr) - 1) // $HChunkRows, x, y
          FROM keyed),
        stats AS (
          SELECT layout, chunk, CAST(count(*) AS BIGINT) AS nr,
            CAST(sum(CASE WHEN x BETWEEN $bx1 AND $bx2
              AND y BETWEEN $by1 AND $by2 THEN 1 ELSE 0 END) AS BIGINT) AS nq,
            min(x) AS xmn, max(x) AS xmx, min(y) AS ymn, max(y) AS ymx
          FROM carved GROUP BY 1, 2),
        cl AS (
          SELECT layout, nr, nq,
            CASE
              WHEN xmx < $bx1 OR xmn > $bx2 OR ymx < $by1 OR ymn > $by2
                THEN 'PRUNED'
              WHEN xmn >= $bx1 AND xmx <= $bx2 AND ymn >= $by1 AND ymx <= $by2
                THEN 'FULL'
              ELSE 'PARTIAL' END AS cls
          FROM stats)
        SELECT layout, CAST(count(*) AS BIGINT) AS n_chunks,
          CAST(sum(CASE WHEN cls = 'PRUNED' THEN 1 ELSE 0 END) AS BIGINT)
            AS pruned,
          CAST(sum(CASE WHEN cls = 'FULL' THEN 1 ELSE 0 END) AS BIGINT)
            AS "full",
          CAST(sum(CASE WHEN cls <> 'PRUNED' THEN nr ELSE 0 END) AS BIGINT)
            AS rows_read,
          CAST(sum(nq) AS BIGINT) AS rows_qual
        FROM cl GROUP BY layout ORDER BY layout"""
  }
}
