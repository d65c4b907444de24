package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ninety-second query wave: q404 dictionary-encoding advisor (the
  * storage-layout decision a columnar writer makes per column), q405
  * minimal functional-dependency repair (data cleaning: restore an FD
  * with the fewest cell changes), and q406 LSM write-amplification
  * audit (size-tiered compaction cost in closed form, per level).
  */
object Relational72 {

  /** (table, column) pairs the encoding advisor profiles — every
    * low-to-mid-cardinality string column in the star schema plus the
    * two document facets. */
  val Q404Cols: Seq[(String, String)] = Seq(
    "lineitem" -> "l_returnflag", "lineitem" -> "l_linestatus",
    "orders" -> "o_orderstatus", "orders" -> "o_orderpriority",
    "customer" -> "c_mktsegment", "part" -> "p_brand",
    "part" -> "p_type", "documents" -> "source", "documents" -> "lang")

  /** Bit-width lattice: bits b encodes cardinalities in (2^(b-1), 2^b]
    * (b = 0 row covers the constant column). Generated once, shared
    * verbatim by the Spark literal frame and the oracle VALUES list. */
  private val q404Bits: Seq[(Long, Long, Long)] =
    (0 to 40).map { b =>
      (b.toLong, if (b == 0) 1L else (1L << (b - 1)) + 1L, 1L << b)
    }

  /** q404 — DICTIONARY-ENCODING ADVISOR: per profiled string column,
    * the exact byte cost of PLAIN encoding (sum of value lengths)
    * versus DICTIONARY encoding (distinct-value bytes + n·⌈log₂ ndv⌉
    * bits of codes, byte-rounded), and the advisor's verdict — the
    * decision a parquet/ORC writer takes per column chunk, audited on
    * real data. Pairs with q251 (RLE pricing) and the graftsink zone
    * maps as the storage-economics suite.
    *
    * Scale: one scan per table (columns fan out as an inline
    * projection, not per-column rescans); per-column stats are
    * partial-aggregable (sum/count + a distinct-value aggregate keyed
    * by (col, value) — the dictionary build itself); the bit-width
    * lookup is a 41-row broadcast band join. */
  def q404EncodingAdvisor(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val perTable = Q404Cols.groupBy(_._1).toSeq
    val scans = perTable.map { case (t, cs) =>
      val structs = cs.map { case (_, c) =>
        struct(lit(s"$t.$c").as("col"), col(c).cast("string").as("v"))
      }
      Tables.table(spark, sfDir, t)
        .select(explode(array(structs: _*)).as("x"))
        .select($"x.col".as("col"), $"x.v".as("v"))
    }
    val vals = scans.reduce(_ unionAll _)
    val dict = vals.groupBy($"col", $"v").agg(count(lit(1)).as("cnt"))
    val stats = dict.groupBy($"col").agg(
      sum($"cnt").as("n"),
      count(lit(1)).as("ndv"),
      sum($"cnt" * octet_length($"v")).as("plain_bytes"),
      sum(octet_length($"v").cast("long")).as("dict_value_bytes"))
    val bits = q404Bits.toDF("bits", "lo", "hi")
    stats.join(broadcast(bits), $"ndv" >= $"lo" && $"ndv" <= $"hi")
      .select($"col", $"n", $"ndv", $"bits", $"plain_bytes",
        ($"dict_value_bytes" +
          expr("(n * bits + 7) div 8")).as("dict_bytes"))
      .withColumn("winner",
        when($"dict_bytes" < $"plain_bytes", "dict").otherwise("plain"))
      .withColumn("dict_ratio_permille",
        expr("(1000 * dict_bytes) div plain_bytes"))
      .orderBy($"col")
  }

  def q404Sql: String = {
    val branches = Q404Cols.map { case (t, c) =>
      s"SELECT '$t.$c' AS col, CAST($c AS VARCHAR) AS v FROM $t"
    }.mkString("\n          UNION ALL ")
    val bitRows = q404Bits
      .map { case (b, lo, hi) =>
        s"(CAST($b AS BIGINT), CAST($lo AS BIGINT), CAST($hi AS BIGINT))"
      }.mkString(", ")
    s"""WITH vals AS (
          $branches),
        dict AS (
          SELECT col, v, CAST(count(*) AS BIGINT) AS cnt
          FROM vals GROUP BY col, v),
        stats AS (
          SELECT col, CAST(sum(cnt) AS BIGINT) AS n,
            CAST(count(*) AS BIGINT) AS ndv,
            CAST(sum(cnt * strlen(v)) AS BIGINT) AS plain_bytes,
            CAST(sum(strlen(v)) AS BIGINT) AS dict_value_bytes
          FROM dict GROUP BY col),
        bits(bits, lo, hi) AS (VALUES $bitRows)
        SELECT col, n, ndv, bits, plain_bytes,
          dict_value_bytes + (n * bits + 7) // 8 AS dict_bytes,
          CASE WHEN dict_value_bytes + (n * bits + 7) // 8 < plain_bytes
            THEN 'dict' ELSE 'plain' END AS winner,
          (1000 * (dict_value_bytes + (n * bits + 7) // 8))
            // plain_bytes AS dict_ratio_permille
        FROM stats JOIN bits ON ndv >= lo AND ndv <= hi
        ORDER BY col"""
  }

  /** Corruption residue: customers with c_custkey % 37 == 3 get their
    * nation name overwritten — ~2.7% of cells, deterministic. */
  val Q405Residue = 37L

  /** q405 — MINIMAL FD REPAIR: the data-cleaning step after q345's FD
    * discovery. A denormalized customer frame carries nation_name;
    * a deterministic residue corrupts ~2.7% of the cells, breaking
    * the FD c_nationkey → nation_name. The repair restores the FD
    * with the FEWEST cell changes — per LHS group keep the majority
    * RHS (ties to the lexicographically smallest) and rewrite the
    * rest. Emits the per-nation repair plan: group size, variant
    * count, chosen value, cells changed — exactly what a HoloClean-
    * style cleaner executes.
    *
    * Scale: corruption and voting are one scan shuffled by
    * (nationkey, name) then nationkey — group-key aggregates all the
    * way; the majority pick is the portable two-pass argmax (max
    * count, then min name at that count), no window. */
  def q405FdRepair(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val nat = Tables.nation(spark, sfDir)
      .select($"n_nationkey", $"n_name")
    val denorm = Tables.customer(spark, sfDir)
      .join(broadcast(nat), $"c_nationkey" === $"n_nationkey")
      .select($"c_custkey".cast("long").as("ck"),
        $"c_nationkey".cast("long").as("nk"),
        when($"c_custkey" % Q405Residue === 3L,
          concat(lit("CORRUPT_"), ($"c_custkey" % 5L).cast("string")))
          .otherwise($"n_name").as("name"))
    val votes = denorm.groupBy($"nk", $"name")
      .agg(count(lit(1)).as("cnt"))
    val top = votes.groupBy($"nk").agg(max($"cnt").as("mx"))
    val majority = votes.join(top, Seq("nk"))
      .filter($"cnt" === $"mx")
      .groupBy($"nk").agg(min($"name").as("majority_name"))
    val plan = votes.groupBy($"nk")
      .agg(sum($"cnt").as("n_rows"), count(lit(1)).as("n_variants"))
      .join(majority, Seq("nk"))
    plan.join(votes.select($"nk", $"name", $"cnt"), Seq("nk"))
      .groupBy($"nk", $"n_rows", $"n_variants", $"majority_name")
      .agg(sum(when($"name" =!= $"majority_name", $"cnt").otherwise(0L))
        .as("n_changed"))
      .orderBy($"nk")
  }

  def q405Sql: String =
    s"""WITH denorm AS (
          SELECT CAST(c_custkey AS BIGINT) AS ck,
            CAST(c_nationkey AS BIGINT) AS nk,
            CASE WHEN c_custkey % $Q405Residue = 3
              THEN 'CORRUPT_' || CAST(c_custkey % 5 AS VARCHAR)
              ELSE n_name END AS name
          FROM customer JOIN nation ON c_nationkey = n_nationkey),
        votes AS (
          SELECT nk, name, CAST(count(*) AS BIGINT) AS cnt
          FROM denorm GROUP BY nk, name),
        top AS (SELECT nk, max(cnt) AS mx FROM votes GROUP BY nk),
        majority AS (
          SELECT v.nk, min(v.name) AS majority_name
          FROM votes v JOIN top t ON v.nk = t.nk AND v.cnt = t.mx
          GROUP BY v.nk),
        plan AS (
          SELECT nk, CAST(sum(cnt) AS BIGINT) AS n_rows,
            CAST(count(*) AS BIGINT) AS n_variants
          FROM votes GROUP BY nk)
        SELECT p.nk, p.n_rows, p.n_variants, m.majority_name,
          CAST(sum(CASE WHEN v.name <> m.majority_name THEN v.cnt
            ELSE 0 END) AS BIGINT) AS n_changed
        FROM plan p
          JOIN majority m ON p.nk = m.nk
          JOIN votes v ON v.nk = p.nk
        GROUP BY p.nk, p.n_rows, p.n_variants, m.majority_name
        ORDER BY p.nk"""

  /** Size-tiered fanout and the deepest level the closed form covers
    * (4^6 = 4096 exceeds any fixture's day count). */
  val Q406Fanout = 4L
  val Q406Levels = 6

  /** q406 — LSM WRITE-AMPLIFICATION AUDIT: each order day flushes one
    * L0 run whose size is that day's order count; size-tiered
    * compaction with fanout [[Q406Fanout]] merges every full group of
    * 4 runs into the next level. The audit prices the policy in
    * CLOSED FORM — day i's bytes are rewritten at level l exactly
    * when its group completes (⌈i/4^l⌉·4^l ≤ n) — so the whole
    * simulation is a projection over the day frame, no fold, no
    * state. Emits per level: merges, bytes written, and that level's
    * share of ingest (permille); level 99 is the total — the
    * write-amplification factor a storage engine quotes.
    *
    * Scale: the day frame is |days| rows (grouped upstream by a
    * partial-aggregable count); ranks come from DistRank, the level
    * fan-out is a 6-row inline explode. The spec replays the actual
    * run-by-run merge process and matches it against the closed form. */
  def q406LsmWa(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables.orders(spark, sfDir)
      .groupBy(datediff(to_date($"o_orderdate"), lit("1995-01-01"))
        .cast("long").as("day"))
      .agg(count(lit(1)).as("b"))
    val ranked = DistRank.withRank(daily, "day", "day", "i", desc = false)
    val n = ranked.agg(count(lit(1)).as("n"), sum($"b").as("ingest"))
    val lvls = (1 to Q406Levels).map { l =>
      val p = math.pow(Q406Fanout.toDouble, l.toDouble).toLong
      struct(lit(l.toLong).as("level"), lit(p).as("p"))
    }
    val perDayLevel = ranked.crossJoin(broadcast(n))
      .select($"i", $"b", $"n", $"ingest",
        explode(array(lvls: _*)).as("x"))
      .select($"i", $"b", $"n", $"ingest", $"x.level".as("level"),
        $"x.p".as("p"))
      .filter(expr("((i + p - 1) div p) * p <= n"))
    val levels = perDayLevel.groupBy($"level", $"n", $"ingest")
      .agg(sum($"b").as("bytes_written"))
      .select($"level", expr("n div CAST(pow(4, level) AS BIGINT)")
        .as("merges"), $"bytes_written",
        expr("(1000 * bytes_written) div ingest").as("share_permille"))
    val l0 = n.select(lit(0L).as("level"), $"n".as("merges"),
      $"ingest".as("bytes_written"), lit(1000L).as("share_permille"))
    val total = l0.unionAll(levels)
      .agg(sum($"merges").as("merges"),
        sum($"bytes_written").as("bytes_written"),
        sum($"share_permille").as("share_permille"))
      .select(lit(99L).as("level"), $"merges", $"bytes_written",
        $"share_permille")
    l0.unionAll(levels).unionAll(total).orderBy($"level")
  }

  def q406Sql: String = {
    val lvlRows = (1 to Q406Levels).map { l =>
      val p = math.pow(Q406Fanout.toDouble, l.toDouble).toLong
      s"(CAST($l AS BIGINT), CAST($p AS BIGINT))"
    }.mkString(", ")
    s"""WITH daily AS (
          SELECT CAST(date_diff('day', DATE '1995-01-01',
            CAST(o_orderdate AS DATE)) AS BIGINT) AS day,
            CAST(count(*) AS BIGINT) AS b
          FROM orders GROUP BY 1),
        ranked AS (
          SELECT b, CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS i
          FROM daily),
        nn AS (SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(b) AS BIGINT) AS ingest FROM ranked),
        lvl(level, p) AS (VALUES $lvlRows),
        per_lvl AS (
          SELECT level, p, CAST(sum(b) AS BIGINT) AS bytes_written
          FROM ranked, nn, lvl
          WHERE ((i + p - 1) // p) * p <= n
          GROUP BY level, p),
        rows1 AS (
          SELECT CAST(0 AS BIGINT) AS level, n AS merges,
            ingest AS bytes_written, CAST(1000 AS BIGINT) AS share_permille
          FROM nn
          UNION ALL
          SELECT level, n // p AS merges, bytes_written,
            (1000 * bytes_written) // ingest AS share_permille
          FROM per_lvl, nn)
        SELECT level, merges, bytes_written, share_permille FROM rows1
        UNION ALL
        SELECT CAST(99 AS BIGINT), CAST(sum(merges) AS BIGINT),
          CAST(sum(bytes_written) AS BIGINT),
          CAST(sum(share_permille) AS BIGINT)
        FROM rows1
        ORDER BY level"""
  }
}
