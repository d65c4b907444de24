package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Thirty-fifth query wave — four engine-room shapes of a lakehouse
  * curation platform: physical-layout economics via RLE run counting
  * (q251), event-sequence pattern matching — MATCH_RECOGNIZE-style CEP
  * as a batch operator (q252), BPE tokenizer ENCODING as a declarative
  * fold over a ranked merge table (q253), and an optimizer-statistics
  * audit predicting join cardinality from histograms (q254). As
  * always: integer grids, total output orders, no fact-scale shuffle
  * without a natural key.
  */
object Relational27 {

  /** The three candidate physical orders q251 prices, as (label, sort
    * key): a composite BIGINT encodes each lexicographic order
    * (high-to-low bit fields), terminated by the (orderkey,
    * linenumber) arrival pair. Field widths are sized to the fixture's
    * domains: the flag letters are biased by −64 (order-preserving for
    * uppercase ascii) so returnflag−64 ≤ 31 sits at bit 58 and
    * linestatus−64 ≤ 31 at bit 53 (5 bits each), ship_day ≤ 4095 gets
    * the full 12 bits at 41 (the fixture reaches 2499 — a 7-bit field
    * here would bleed into linestatus, the r12 review find), and
    * arr < 2^41; max key ≈ 26·2^58 + 31·2^53 ≈ 7.8e18 < Long.Max. At
    * warehouse scale the encoder is irrelevant — a real rewrite sorts
    * by the column list — the composite exists so the AUDIT's rank is
    * a single numeric key.
    *
    * The composite alone is NOT total: this fixture's (l_orderkey,
    * l_linenumber) is not unique (linenumber repeats within an order —
    * the q353/q354 finding), and run counts over tied rows are
    * engine-dependent, which the ×10 carve exposed as an off-by-2 at
    * 6 M rows (r12). Totality comes from the md5 row-hash tiebreak
    * over all six projected columns (the q353 recipe): rows that still
    * tie are identical in every MEASURED column, so their internal
    * order cannot change any run count. */
  private def arr = "(l_orderkey * 8 + l_linenumber)"
  private def day = "datediff(to_date(l_shipdate), DATE '1995-01-01')"
  // key expressions run over the projected frame, where the date is
  // already materialized as ship_day
  private[graft] val orders = Seq(
    "arrival" -> s"$arr",
    "flag_first" -> (s"((ascii(l_returnflag) - 64) * ${1L << 58} + " +
      s"(ascii(l_linestatus) - 64) * ${1L << 53} + ship_day * ${1L << 41}L + $arr)"),
    "ship_first" -> s"(ship_day * ${1L << 41}L + $arr)")

  private val runCols = Seq("l_returnflag", "l_linestatus", "ship_day", "l_partkey")

  /** q251 — RLE run counting: the layout-economics audit behind "which
    * sort order makes this table smallest/fastest". Run-length and
    * dictionary encodings pay per VALUE RUN, not per row, so the cost
    * of a candidate sort order is, per column, the number of maximal
    * equal-value runs the order induces — that number is what a
    * columnar writer's RLE encoder will emit and what a scan
    * decompresses. The audit prices lineitem under three orders
    * (arrival, returnflag-first, shipdate-first) × four columns; sort
    * keys that lead with a column collapse its runs to ~|distinct|,
    * while the trailing key's runs stay ~|rows| — the quantified form
    * of "you can only sort by one thing" that motivates q92's z-order
    * and q249's Hilbert curve.
    *
    * Distribution (the r14 single-pass form): runs = adjacent changes
    * + 1, and adjacency under each total order decomposes exactly into
    * order-preserving buckets — percentile cut points on the composite
    * key (the [[DistRank]] bucketing argument: equal keys share a
    * bucket, cut placement can only unbalance buckets, never reorder
    * rows). All three orderings ride ONE shuffle: each row enters the
    * union once per ordering, a single window PARTITIONED by
    * (ordering, bucket) lags all four columns at once, and the
    * cross-bucket boundaries come from a ≤ 3·|buckets|-row frame
    * (per-bucket first/last rows via min_by/max_by over the same
    * aggregate) — so the fact table is shuffled exactly once, versus
    * the previous form's per-ordering global rank plus rank-adjacency
    * self-join (≈3 fact-scale exchanges per ordering, 9 total).
    * Rows that tie on (key, md5 tie) are identical in every measured
    * column (the tiebreak hashes all six), so lag order inside a tie
    * and min_by/max_by tie choice cannot move any count. */
  def q251RleRuns(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // projected frame + tie + all three composite keys, materialized
    // ONCE: the cut-point pass and the windowed change-count pass both
    // read the checkpoint instead of re-deriving md5/date arithmetic
    var li = Tables.lineitem(spark, sfDir)
      .select($"l_orderkey", $"l_linenumber", $"l_returnflag",
        $"l_linestatus", expr(day).cast("long").as("ship_day"), $"l_partkey")
      .withColumn("__t", expr(
        """CAST(conv(substr(md5(concat_ws('|', l_orderkey, l_linenumber,
          |  l_returnflag, l_linestatus, ship_day, l_partkey)), 1, 15),
          |  16, 10) AS BIGINT)""".stripMargin))
    orders.zipWithIndex.foreach { case ((_, keyExpr), i) =>
      li = li.withColumn(s"__k$i", expr(keyExpr).cast("long"))
    }
    val keyed = li.localCheckpoint()
    // one aggregate computes every ordering's cut points (parallelism
    // knob, not a correctness knob — see the bucketing argument above)
    val nB = spark.conf.get("spark.graft.rank.buckets", "16").toInt
    val probs = typedlit((1 until nB).map(_.toDouble / nB))
    val cuts = keyed.agg(
      orders.indices.map(i =>
        percentile_approx(col(s"__k$i"), probs, lit(10000)).as(s"__c$i")).head,
      orders.indices.tail.map(i =>
        percentile_approx(col(s"__k$i"), probs, lit(10000)).as(s"__c$i")): _*)
      .localCheckpoint()
    val perLabel = orders.zipWithIndex.map { case ((label, _), i) =>
      keyed.crossJoin(broadcast(cuts))
        .select(lit(label).as("lbl"),
          expr(s"aggregate(__c$i, 0, (a, c) -> a + IF(__k$i > c, 1, 0))")
            .as("b"),
          col(s"__k$i").as("k"), $"__t",
          $"l_returnflag".as("c1"), $"l_linestatus".as("c2"),
          $"ship_day".as("c3"), $"l_partkey".as("c4"))
    }
    val all = perLabel.reduce(_.unionByName(_))
    val w = Window.partitionBy($"lbl", $"b").orderBy($"k", $"__t")
    val marked = all
      .withColumn("p1", lag($"c1", 1).over(w))
      .withColumn("p2", lag($"c2", 1).over(w))
      .withColumn("p3", lag($"c3", 1).over(w))
      .withColumn("p4", lag($"c4", 1).over(w))
    def intra(c: String, p: String) =
      sum(when(col(p).isNotNull && col(c) =!= col(p), 1L).otherwise(0L))
    val rowOrd = struct($"k", $"__t")
    val vals = struct($"c1", $"c2", $"c3", $"c4")
    val perBucket = marked.groupBy($"lbl", $"b").agg(
      intra("c1", "p1").as("i1"), intra("c2", "p2").as("i2"),
      intra("c3", "p3").as("i3"), intra("c4", "p4").as("i4"),
      min_by(vals, rowOrd).as("fst"), max_by(vals, rowOrd).as("lst"))
    // bucket-boundary changes: previous NON-EMPTY bucket's last row vs
    // this bucket's first — a ≤ 3·nB-row frame, window partitioned by
    // ordering (bounded by the bucket knob, never by data)
    val wl = Window.partitionBy($"lbl").orderBy($"b")
    val withPrev = perBucket.withColumn("plst", lag($"lst", 1).over(wl))
    def bnd(f: String) =
      sum(when($"plst".isNotNull && col(s"fst.$f") =!= col(s"plst.$f"), 1L)
        .otherwise(0L))
    val changes = withPrev.groupBy($"lbl").agg(
      (sum($"i1") + bnd("c1")).as("ch1"), (sum($"i2") + bnd("c2")).as("ch2"),
      (sum($"i3") + bnd("c3")).as("ch3"), (sum($"i4") + bnd("c4")).as("ch4"))
    // literal label frame on the left so an EMPTY input still yields
    // the same 12 rows (null runs) the previous form and the oracle do
    val labels = orders.map(_._1).toDF("lbl")
    labels.join(broadcast(changes), Seq("lbl"), "left_outer")
      .select(inline(array(
        struct($"lbl".as("ordering"), lit(runCols(0)).as("column_name"),
          ($"ch1" + 1).as("n_runs")),
        struct($"lbl".as("ordering"), lit(runCols(1)).as("column_name"),
          ($"ch2" + 1).as("n_runs")),
        struct($"lbl".as("ordering"), lit(runCols(2)).as("column_name"),
          ($"ch3" + 1).as("n_runs")),
        struct($"lbl".as("ordering"), lit(runCols(3)).as("column_name"),
          ($"ch4" + 1).as("n_runs")))))
      .orderBy($"ordering", $"column_name")
  }

  def q251Sql: String = {
    val dayD = "date_diff('day', DATE '1995-01-01', CAST(l_shipdate AS DATE))"
    val arrD = "(l_orderkey * 8 + l_linenumber)"
    val keyD = Map(
      "arrival" -> arrD,
      "flag_first" -> (s"((ascii(l_returnflag) - 64) * ${1L << 58} + " +
        s"(ascii(l_linestatus) - 64) * ${1L << 53} + ship_day * ${1L << 41} + $arrD)"),
      "ship_first" -> s"(ship_day * ${1L << 41} + $arrD)")
    val branches = keyD.toSeq.map { case (label, k) =>
      s"""SELECT '$label' AS ordering, cn AS column_name, n_runs FROM (
            SELECT 1 + sum(ch1) AS r1, 1 + sum(ch2) AS r2,
              1 + sum(ch3) AS r3, 1 + sum(ch4) AS r4
            FROM (
              SELECT
                CASE WHEN l_returnflag <> lag(l_returnflag) OVER w
                  THEN 1 ELSE 0 END AS ch1,
                CASE WHEN l_linestatus <> lag(l_linestatus) OVER w
                  THEN 1 ELSE 0 END AS ch2,
                CASE WHEN ship_day <> lag(ship_day) OVER w
                  THEN 1 ELSE 0 END AS ch3,
                CASE WHEN l_partkey <> lag(l_partkey) OVER w
                  THEN 1 ELSE 0 END AS ch4
              FROM li WINDOW w AS (ORDER BY $k, rowtie))
          ), LATERAL (VALUES
            ('${runCols(0)}', CAST(r1 AS BIGINT)),
            ('${runCols(1)}', CAST(r2 AS BIGINT)),
            ('${runCols(2)}', CAST(r3 AS BIGINT)),
            ('${runCols(3)}', CAST(r4 AS BIGINT))) v(cn, n_runs)"""
    }
    s"""WITH li AS (
          SELECT l_orderkey, l_linenumber, l_returnflag, l_linestatus,
            CAST($dayD AS BIGINT) AS ship_day, l_partkey,
            CAST('0x' || substr(md5(concat_ws('|', l_orderkey,
              l_linenumber, l_returnflag, l_linestatus,
              CAST($dayD AS BIGINT), l_partkey)), 1, 15) AS BIGINT)
              AS rowtie
          FROM lineitem)
        ${branches.mkString("\n UNION ALL \n")}
        ORDER BY ordering, column_name"""
  }

  /** The CEP motif table: (name, regex over per-user event-initial
    * signatures). Initials: c=click, e=error, p=purchase, s=signup,
    * v=view. Only RE2∩Java constructs (literals, classes, greedy
    * quantifiers) so both engines count identically. */
  private val motifs = Seq(
    "conversion" -> "v.*p",
    "quick_convert" -> "vp",
    "research" -> "vv+c",
    "retry" -> "ee")

  /** q252 — event-sequence pattern matching: SQL MATCH_RECOGNIZE / CEP
    * distilled to a batch operator. Each user's event history becomes
    * a SIGNATURE string (event-type initials in (ts, event_id) order —
    * the struct array_sort makes the order explicit, since
    * collect_list order is shuffle-dependent), and behavioral motifs
    * are regexes over signatures: sessions that viewed then purchased,
    * immediate view→purchase, repeated-view research, back-to-back
    * error retries. Per motif: how many users match and how many
    * non-overlapping occurrences exist — both engines' regex scanners
    * advance identically on these constructs, so the counts are exact.
    *
    * Shape: ONE shuffle (by user) builds every signature; the motif
    * table rides a 4-row broadcast and the final aggregate is 4 rows.
    * At 100 TB signatures are bounded by per-user activity (cap with a
    * slice in production); the alternative — a self-join chain per
    * motif step, q134's shape — pays a shuffle PER STEP, which is why
    * engines compile MATCH_RECOGNIZE to exactly this per-key fold. */
  def q252SeqMotif(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val sig = Tables.events(spark, sfDir)
      .select($"user_id", $"ts", $"event_id",
        substring($"event_type", 1, 1).as("ini"))
      .groupBy($"user_id")
      .agg(expr("array_join(transform(array_sort(" +
        "collect_list(struct(ts, event_id, ini))), x -> x.ini), '')").as("sig"))
    val pats = motifs.toDF("pattern", "re")
    sig.crossJoin(broadcast(pats))
      .withColumn("m", expr("regexp_count(sig, re)"))
      .groupBy($"pattern")
      .agg(sum(when($"m" > 0, 1L).otherwise(0L)).as("n_users"),
        sum($"m").cast("long").as("n_matches"))
      .orderBy($"pattern")
  }

  def q252Sql: String = {
    val vals = motifs.map { case (n, r) => s"('$n', '$r')" }.mkString(", ")
    s"""WITH sig AS (
          SELECT user_id,
            string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id)
              AS sig
          FROM events GROUP BY user_id),
        pats AS (SELECT * FROM (VALUES $vals) p(pattern, re))
        SELECT pattern,
          CAST(sum(CASE WHEN len(regexp_extract_all(sig, re)) > 0
            THEN 1 ELSE 0 END) AS BIGINT) AS n_users,
          CAST(sum(len(regexp_extract_all(sig, re))) AS BIGINT) AS n_matches
        FROM sig CROSS JOIN pats
        GROUP BY pattern ORDER BY pattern"""
  }

  /** Merge-table size for q253 (the top-K corpus bigrams become the
    * vocabulary) and the private-use symbol block the merged tokens
    * collapse into (q143's convention, one symbol per rank). */
  val BpeEncodeK = 8
  private def bpeSym(rank: Int): Char = (0xE000 + rank - 1).toChar

  /** q253 — BPE tokenizer ENCODING: applying a ranked merge table to
    * the corpus — the production-side half of byte-pair encoding
    * (q137 counts pairs, q143 runs one trainer round; this is what an
    * LLM data pipeline does a trillion times: vocabulary in hand,
    * tokenize everything). The merge table is the top-[[BpeEncodeK]]
    * corpus bigrams in (count DESC, pair) rank order, each collapsing
    * to a distinct private-use symbol; encoding is a FOLD of the
    * ranked merges over each document — `aggregate(ms, text, replace)`
    * — so the whole tokenizer is one codegen'd projection per
    * document, no UDF, no per-merge pass over the corpus. Both
    * engines' `replace` is left-to-right non-overlapping — exactly
    * BPE's greedy merge semantics — and later merges see earlier
    * symbols, so application order is part of the contract (hence the
    * rank-sorted array). Output: per merge rank, how many times it
    * fired across the corpus — symbol counts survive later merges
    * because merge pairs are original-alphabet bigrams.
    *
    * Scale: trainer output (the merge table) is vocabulary-sized and
    * broadcast; the corpus is scanned ONCE; per-rank totals are a
    * partial-aggregable 8-row sum. The same fold with a 50k-entry
    * production vocabulary swaps the array for a trie expression or
    * mapInPandas tokenizer — the broadcast-vocab + single-scan shape
    * is the part that holds at 100 TB. */
  def q253BpeEncode(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val symArr = (1 to BpeEncodeK)
      .map(r => s"'${bpeSym(r)}'").mkString("array(", ", ", ")")
    val merges = Relational9.q137BpePairs(spark, sfDir)
      .limit(BpeEncodeK)
      .withColumn("rnk", row_number().over( // BpeEncodeK-row frame
        Window.orderBy($"cnt".desc, $"pair")))
      .withColumn("m3", concat($"pair", expr(s"element_at($symArr, rnk)")))
    val ms = merges.agg(expr(
      "transform(array_sort(collect_list(struct(rnk, m3))), x -> x.m3)")
      .as("ms"))
    val enc = Tables.documents(spark, sfDir)
      .select($"text")
      .crossJoin(broadcast(ms))
      .select(expr("aggregate(ms, text, (acc, m) -> " +
        "replace(acc, substring(m, 1, 2), substring(m, 3, 1)))").as("enc"))
    enc.crossJoin(broadcast(merges.select($"rnk", $"pair", $"m3")))
      .groupBy($"rnk".cast("long").as("rnk"), $"pair")
      .agg(sum(length($"enc") -
        length(expr("replace(enc, substring(m3, 3, 1), '')"))).as("n_applied"))
      .orderBy($"rnk")
  }

  def q253Sql: String =
    s"""WITH pc AS (
          SELECT unnest(list_transform(range(1, length(text)),
            i -> substr(text, i, 2))) AS pair
          FROM documents WHERE length(text) >= 2),
        top AS (
          SELECT pair, count(*) AS cnt FROM pc GROUP BY pair
          ORDER BY cnt DESC, pair LIMIT $BpeEncodeK),
        merges AS (
          SELECT pair, row_number() OVER (ORDER BY cnt DESC, pair) AS rnk
          FROM top),
        m3 AS (SELECT rnk, pair, pair || chr(CAST(57343 + rnk AS INTEGER)) AS m FROM merges),
        ml AS (SELECT list(m ORDER BY rnk) AS ms FROM m3),
        enc AS (
          SELECT list_reduce(list_prepend(text, (SELECT ms FROM ml)),
            (acc, m) -> replace(acc, substr(m, 1, 2), substr(m, 3, 1))) AS enc
          FROM documents)
        SELECT CAST(rnk AS BIGINT) AS rnk, pair,
          CAST(sum(length(enc) - length(replace(enc, chr(CAST(57343 + rnk AS INTEGER)), '')))
            AS BIGINT) AS n_applied
        FROM enc CROSS JOIN m3
        GROUP BY rnk, pair ORDER BY rnk"""

  val JoinStatBuckets = 16

  /** q254 — optimizer-statistics audit: predict the lineitem ⋈ orders
    * equi-join cardinality from per-bucket key histograms (the
    * container/uniformity estimate every cost-based optimizer uses:
    * pred_b = n_R·n_S / width, keys assumed uniform within a bucket),
    * then measure the true per-bucket join size and report the error
    * in ppm. This is the audit that tells you whether your table
    * statistics are good enough to trust a join reorder at 100 TB —
    * histogram skew shows up as exactly the buckets whose err_ppm
    * blows up. All arithmetic integral (floor-div prediction, ppm on
    * the 10⁻⁶ grid).
    *
    * Shape: the two histograms are map-side-combinable counts (16
    * rows each); the ONLY fact-scale work is the real join, keyed by
    * orderkey — which is the thing being audited. Predicted-vs-actual
    * meet on a 16-row broadcast join. */
  def q254JoinStats(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, sfDir).select($"l_orderkey")
    val or = Tables.orders(spark, sfDir).select($"o_orderkey")
    val w = li.agg(
      (expr(s"(max(l_orderkey) + $JoinStatBuckets) div $JoinStatBuckets"))
        .as("w"))
    val hli = li.crossJoin(broadcast(w))
      .groupBy(expr("l_orderkey div w").as("bucket"))
      .agg(count(lit(1)).as("n_li"), first($"w").as("w"))
    val hor = or.crossJoin(broadcast(w))
      .groupBy(expr("o_orderkey div w").as("bucket"))
      .agg(count(lit(1)).as("n_ord"))
    val actual = li.join(or, $"l_orderkey" === $"o_orderkey")
      .crossJoin(broadcast(w))
      .groupBy(expr("l_orderkey div w").as("bucket"))
      .agg(count(lit(1)).as("actual"))
    hli.join(hor, "bucket").join(actual, "bucket")
      .select($"bucket", $"n_li", $"n_ord",
        expr("n_li * n_ord div w").as("predicted"), $"actual",
        expr("abs(n_li * n_ord div w - actual) * 1000000 div actual")
          .as("err_ppm"))
      .orderBy($"bucket")
  }

  def q254Sql: String =
    s"""WITH w AS (
          SELECT (max(l_orderkey) + $JoinStatBuckets) // $JoinStatBuckets AS w
          FROM lineitem),
        hli AS (
          SELECT l_orderkey // (SELECT w FROM w) AS bucket,
            CAST(count(*) AS BIGINT) AS n_li
          FROM lineitem GROUP BY 1),
        hor AS (
          SELECT o_orderkey // (SELECT w FROM w) AS bucket,
            CAST(count(*) AS BIGINT) AS n_ord
          FROM orders GROUP BY 1),
        act AS (
          SELECT l_orderkey // (SELECT w FROM w) AS bucket,
            CAST(count(*) AS BIGINT) AS actual
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          GROUP BY 1)
        SELECT bucket, n_li, n_ord,
          n_li * n_ord // (SELECT w FROM w) AS predicted, actual,
          abs(n_li * n_ord // (SELECT w FROM w) - actual) * 1000000
            // actual AS err_ppm
        FROM hli JOIN hor USING (bucket) JOIN act USING (bucket)
        ORDER BY bucket"""
}
