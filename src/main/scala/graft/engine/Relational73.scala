package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ninety-third query wave: q407 Belady-OPT vs LRU cache comparison
  * (the clairvoyant upper bound priced against q397's policy, both as
  * exact folds), q408 margin-based uncertainty sampling (the active-
  * learning acquisition query over quantized embeddings), and q409
  * the salting frontier (what salt factor a skewed shuffle key needs,
  * priced from histograms without running the shuffle).
  */
object Relational73 {

  /** q407 — BELADY OPT vs LRU: replay every user's event-type stream
    * through a 2-slot cache under BOTH policies — q397's LRU and
    * Belady's clairvoyant OPT (evict the entry whose next use lies
    * farthest in the future). OPT needs the future, so each access
    * first gets its next-occurrence index from a lag-free partitioned
    * window; the fold state (two cached types + their next-use
    * indices + hits) rides a fixed-width STRING accumulator — zero-
    * padded fields compare lexicographically as numbers, so the
    * whole policy is substr/concat, identical in both engines. The
    * single-row report prices the policy gap: how many of LRU's
    * misses were avoidable at this cache size. `users_opt_below_lru`
    * is structurally zero (OPT is offline-optimal; next-use indices
    * are distinct, so tie-breaks never matter) — shipped as a column
    * because it is the invariant the fold must earn.
    *
    * Scale: one shuffle by user for the windows + one grouped fold;
    * state is O(1) per user; the report is a 1-row aggregate. */
  def q407OptVsLru(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val P = Relational69.Q397Pack
    val evs = Tables.events(spark, sfDir)
      .select($"user_id", $"event_id", unix_micros($"ts").as("us"),
        expr(Relational69.q397TypeIdSql("event_type")).as("ti"))
    val wSeq = Window.partitionBy($"user_id").orderBy($"us", $"event_id")
    val wNext = Window.partitionBy($"user_id", $"ti")
      .orderBy($"rn")
    val seq = evs.withColumn("rn", row_number().over(wSeq).cast("long"))
      .withColumn("nx", coalesce(lead($"rn", 1).over(wNext), lit(999999L)))
      .withColumn("e", expr(
        "concat(CAST(ti AS STRING), lpad(CAST(nx AS STRING), 6, '0'))"))
    val hitExpr = "lpad(CAST(CAST(substr(acc, 15, 6) AS BIGINT) + 1" +
      " AS STRING), 6, '0')"
    val folded = seq.groupBy($"user_id").agg(
      count(lit(1)).as("n"),
      expr(
        s"""CAST(substr(aggregate(
              transform(array_sort(collect_list(struct(rn, e))), x -> x.e),
              '69999996999999000000',
              (acc, x) -> CASE
                WHEN substr(x, 1, 1) = substr(acc, 1, 1)
                  THEN concat(substr(x, 1, 7), substr(acc, 8, 7), $hitExpr)
                WHEN substr(x, 1, 1) = substr(acc, 8, 1)
                  THEN concat(substr(acc, 1, 7), substr(x, 1, 7), $hitExpr)
                WHEN substr(acc, 2, 6) >= substr(acc, 9, 6)
                  THEN concat(substr(x, 1, 7), substr(acc, 8, 7),
                    substr(acc, 15, 6))
                ELSE concat(substr(acc, 1, 7), substr(x, 1, 7),
                  substr(acc, 15, 6))
              END), 15, 6) AS BIGINT)""").as("opt_hits"),
      expr(
        s"""aggregate(
              transform(array_sort(collect_list(struct(rn, ti))), x -> x.ti),
              CAST(48 * $P AS BIGINT),
              (acc, x) -> CASE
                WHEN x = (acc div $P) div 7 THEN acc + 1
                WHEN x = (acc div $P) % 7
                  THEN (x * 7 + (acc div $P) div 7) * $P + acc % $P + 1
                ELSE (x * 7 + (acc div $P) div 7) * $P + acc % $P
              END) % $P""").as("lru_hits"))
    folded.agg(count(lit(1)).as("n_users"),
        sum($"n").as("accesses"),
        sum($"lru_hits").as("lru_hits"),
        sum($"opt_hits").as("opt_hits"),
        sum(when($"opt_hits" < $"lru_hits", 1L).otherwise(0L))
          .as("users_opt_below_lru"))
      .select($"n_users", $"accesses", $"lru_hits", $"opt_hits",
        expr("(1000 * lru_hits) div accesses").as("lru_permille"),
        expr("(1000 * opt_hits) div accesses").as("opt_permille"),
        $"users_opt_below_lru")
  }

  def q407Sql: String = {
    val P = Relational69.Q397Pack
    val hitExpr = "lpad(CAST(CAST(substr(acc, 15, 6) AS BIGINT) + 1" +
      " AS STRING), 6, '0')"
    s"""WITH evs AS (
          SELECT user_id, event_id, epoch_us(ts) AS us,
            ${Relational69.q397TypeIdSql("event_type")} AS ti
          FROM events),
        seq AS (
          SELECT user_id, ti,
            CAST(row_number() OVER (PARTITION BY user_id
              ORDER BY us, event_id) AS BIGINT) AS rn
          FROM evs),
        nxt AS (
          SELECT user_id, ti, rn,
            coalesce(lead(rn, 1) OVER (PARTITION BY user_id, ti
              ORDER BY rn), 999999) AS nx
          FROM seq),
        elems AS (
          SELECT user_id, rn,
            CAST(ti AS STRING) || lpad(CAST(nx AS STRING), 6, '0') AS e,
            CAST(ti AS BIGINT) AS ti
          FROM nxt),
        folded AS (
          SELECT user_id, CAST(count(*) AS BIGINT) AS n,
            CAST(substr(list_reduce(
              list_prepend('69999996999999000000', list(e ORDER BY rn)),
              (acc, x) -> CASE
                WHEN substr(x, 1, 1) = substr(acc, 1, 1)
                  THEN substr(x, 1, 7) || substr(acc, 8, 7) || $hitExpr
                WHEN substr(x, 1, 1) = substr(acc, 8, 1)
                  THEN substr(acc, 1, 7) || substr(x, 1, 7) || $hitExpr
                WHEN substr(acc, 2, 6) >= substr(acc, 9, 6)
                  THEN substr(x, 1, 7) || substr(acc, 8, 7)
                    || substr(acc, 15, 6)
                ELSE substr(acc, 1, 7) || substr(x, 1, 7)
                  || substr(acc, 15, 6)
              END), 15, 6) AS BIGINT) AS opt_hits,
            list_reduce(
              list_prepend(CAST(48 * $P AS BIGINT), list(ti ORDER BY rn)),
              (acc, x) -> CASE
                WHEN x = (acc // $P) // 7 THEN acc + 1
                WHEN x = (acc // $P) % 7
                  THEN (x * 7 + (acc // $P) // 7) * $P + acc % $P + 1
                ELSE (x * 7 + (acc // $P) // 7) * $P + acc % $P
              END) % $P AS lru_hits
          FROM elems GROUP BY user_id)
        SELECT CAST(count(*) AS BIGINT) AS n_users,
          CAST(sum(n) AS BIGINT) AS accesses,
          CAST(sum(lru_hits) AS BIGINT) AS lru_hits,
          CAST(sum(opt_hits) AS BIGINT) AS opt_hits,
          (1000 * CAST(sum(lru_hits) AS BIGINT))
            // CAST(sum(n) AS BIGINT) AS lru_permille,
          (1000 * CAST(sum(opt_hits) AS BIGINT))
            // CAST(sum(n) AS BIGINT) AS opt_permille,
          CAST(sum(CASE WHEN opt_hits < lru_hits THEN 1 ELSE 0 END)
            AS BIGINT) AS users_opt_below_lru
        FROM folded"""
  }

  /** Points the acquisition selects. */
  val Q408K = 50
  /** Quantization: floor(v·2^20) + 2^19 keeps every component
    * non-negative, so floor/truncate division agree everywhere. */
  val Q408Scale = 1048576L
  val Q408Shift = 524288L

  /** q408 — MARGIN-BASED UNCERTAINTY SAMPLING: the active-learning
    * acquisition over the embedding space. Per-label centroids on the
    * shifted 2^20 integer grid (component = ssum div n — exact, both
    * engines); every vector's squared L2 distance to all 10 centroids
    * (codegen `l2_distance_sq` over integer-valued doubles — exact
    * below 2^53); margin = d²(2nd-nearest) − d²(nearest). The
    * [[Q408K]] smallest margins are the points a labeling budget
    * buys first; the report groups them by (nearest, runner-up)
    * pair — the confusion frontier between classes. Scalar vote key
    * d²·16+label makes (distance, label) a single orderable BIGINT.
    *
    * Scale: centroids are a |labels|·|dims| aggregate riding a
    * broadcast; the distance fan-out is |vectors|×|labels| map-side;
    * selection is TakeOrderedAndProject. */
  def q408MarginSampling(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val scaled = Tables.embeddings(spark, sfDir)
      .select($"vec_id", $"label", posexplode($"embedding").as(Seq("dim", "v")))
      .select($"vec_id", $"label", $"dim",
        (floor($"v" * Q408Scale).cast("long") + Q408Shift).as("s"))
    val cents = scaled.groupBy($"label".as("clabel"), $"dim")
      .agg(expr("sum(s) div count(*)").as("c"))
      .groupBy($"clabel")
      .agg(expr("transform(array_sort(collect_list(struct(dim, c)))," +
        " x -> CAST(x.c AS DOUBLE))").as("cq"))
    val vecs = scaled.groupBy($"vec_id")
      .agg(expr("transform(array_sort(collect_list(struct(dim, s)))," +
        " x -> CAST(x.s AS DOUBLE))").as("xq"))
    val d2 = vecs.crossJoin(broadcast(cents))
      .select($"vec_id",
        (graft.functions.VectorExpressions.l2_distance_sq($"xq", $"cq")
          .cast("long") * 16L + $"clabel").as("key"))
    val sel = d2.groupBy($"vec_id")
      .agg(sort_array(collect_list($"key")).as("ks"))
      .select($"vec_id",
        expr("element_at(ks, 1) % 16").as("best_label"),
        expr("element_at(ks, 2) % 16").as("second_label"),
        expr("element_at(ks, 2) div 16 - element_at(ks, 1) div 16")
          .as("margin"))
      .orderBy($"margin".asc, $"vec_id").limit(Q408K)
    sel.groupBy($"best_label", $"second_label")
      .agg(count(lit(1)).as("n_selected"),
        min($"margin").as("min_margin"), max($"margin").as("max_margin"))
      .orderBy($"best_label", $"second_label")
  }

  def q408Sql: String =
    s"""WITH scaled AS (
          SELECT vec_id, label, i - 1 AS dim,
            CAST(floor(embedding[i] * $Q408Scale) AS BIGINT) + $Q408Shift
              AS s
          FROM (SELECT vec_id, label, embedding,
                  unnest(range(1, len(embedding) + 1)) AS i
                FROM embeddings)),
        cent AS (
          SELECT label AS clabel, dim,
            CAST(sum(s) AS BIGINT) // count(*) AS c
          FROM scaled GROUP BY 1, 2),
        d2 AS (
          SELECT x.vec_id,
            CAST(sum((x.s - c.c) * (x.s - c.c)) AS BIGINT) * 16
              + c.clabel AS key
          FROM scaled x JOIN cent c ON x.dim = c.dim
          GROUP BY x.vec_id, c.clabel),
        ks AS (
          SELECT vec_id, list(key ORDER BY key) AS ks
          FROM d2 GROUP BY vec_id),
        sel AS (
          SELECT vec_id, ks[1] % 16 AS best_label,
            ks[2] % 16 AS second_label,
            ks[2] // 16 - ks[1] // 16 AS margin
          FROM ks
          ORDER BY margin ASC, vec_id LIMIT $Q408K)
        SELECT best_label, second_label,
          CAST(count(*) AS BIGINT) AS n_selected,
          min(margin) AS min_margin, max(margin) AS max_margin
        FROM sel GROUP BY 1, 2 ORDER BY 1, 2"""

  /** Salt factors priced, and the reducer count they spread over. */
  val Q409Salts: Seq[Int] = Seq(1, 2, 4, 8)
  val Q409Parts = 32L

  /** q409 — SALTING FRONTIER: how much salt does a skewed shuffle key
    * need? For each salt factor s, every key's rows split evenly
    * across s sub-keys (remainder to the low residues — exact), each
    * sub-key lands on reducer md5(key#r) mod [[Q409Parts]], and the
    * frontier reports the max reducer load and the imbalance ratio
    * (max/mean, permille). Priced ENTIRELY from the key histogram —
    * no shuffle is run; this is the planning query behind q45/q325's
    * salted joins, answering "is s=4 enough at 1000 executors, or do
    * we pay s=8's extra merge fan-in".
    *
    * Scale: the histogram is one partial-aggregable count; the salt
    * fan-out is |keys|×Σs rows of pure projection. */
  def q409SaltingFrontier(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val hist = Tables.events(spark, sfDir)
      .groupBy($"event_type".as("k")).agg(count(lit(1)).as("cnt"))
    val combos = for {
      s <- Q409Salts
      r <- 0 until s
    } yield struct(lit(s.toLong).as("s"), lit(r.toLong).as("r"))
    val fanned = hist
      .select($"k", $"cnt", explode(array(combos: _*)).as("x"))
      .select($"k", $"cnt", $"x.s".as("s"), $"x.r".as("r"))
      .select($"s",
        expr("CAST(conv(substr(md5(concat(k, '#', CAST(r AS STRING)))," +
          " 1, 15), 16, 10) AS BIGINT)" +
          s" % $Q409Parts").as("p"),
        expr("cnt div s + IF(r < cnt % s, 1, 0)").as("load"))
    val parts = fanned.groupBy($"s", $"p")
      .agg(sum($"load").as("load"))
    parts.groupBy($"s")
      .agg(max($"load").as("max_load"), sum($"load").as("total"),
        count(lit(1)).as("nonempty_parts"))
      .select($"s".as("salt"), $"max_load", $"nonempty_parts",
        expr(s"(1000 * max_load * $Q409Parts) div total")
          .as("imbalance_permille"))
      .orderBy($"salt")
  }

  def q409Sql: String = {
    val comboRows = (for { s <- Q409Salts; r <- 0 until s }
      yield s"(CAST($s AS BIGINT), CAST($r AS BIGINT))").mkString(", ")
    s"""WITH hist AS (
          SELECT event_type AS k, CAST(count(*) AS BIGINT) AS cnt
          FROM events GROUP BY 1),
        combos(s, r) AS (VALUES $comboRows),
        fanned AS (
          SELECT s,
            CAST('0x' || substr(md5(k || '#' || CAST(r AS STRING)), 1, 15)
              AS BIGINT) % $Q409Parts AS p,
            cnt // s + (CASE WHEN r < cnt % s THEN 1 ELSE 0 END) AS load
          FROM hist, combos),
        parts AS (
          SELECT s, p, CAST(sum(load) AS BIGINT) AS load
          FROM fanned GROUP BY s, p)
        SELECT s AS salt, max(load) AS max_load,
          CAST(count(*) AS BIGINT) AS nonempty_parts,
          (1000 * max(load) * $Q409Parts)
            // CAST(sum(load) AS BIGINT) AS imbalance_permille
        FROM parts GROUP BY s ORDER BY salt"""
  }
}
