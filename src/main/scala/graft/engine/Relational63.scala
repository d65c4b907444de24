package graft.engine

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Eighty-second query wave: q379 parallel greedy bipartite matching
  * (propose/accept rounds over the weighted co-supply graph), q380
  * Markov next-event prediction with a leakage-safe time split, and
  * q381 token-bucket rate limiting as an exact integer fold.
  */
object Relational63 {

  private val Q379WinLo = "1996-01-01"
  private val Q379WinHi = "1996-02-01"
  /** Propose/accept rounds (each is one matching "wave"). */
  val Q379Rounds = 5

  /** q379 — PARALLEL GREEDY BIPARTITE MATCHING: suppliers and parts
    * from the one-month co-supply window, edge weight = lineitem
    * count; each round every free supplier PROPOSES to its heaviest
    * free part (ties to the smallest part key) and every part ACCEPTS
    * its heaviest proposal (ties to the smallest supplier) — the
    * propose/accept luby-style round that replaces the inherently
    * sequential greedy matching with O(rounds) data-parallel passes.
    * Emits per round: new matches and their weight. This is the
    * assignment shape behind storage-node placement, task binding,
    * review routing.
    *
    * Scale: each round is two key-partitioned argmax aggregates
    * (max of a (w, −key) struct — no windows) plus two anti joins to
    * retire matched nodes; the driver sees two scalars per round and
    * localCheckpoint cuts the loop lineage (q302/q368 discipline). */
  def q379ParallelMatching(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    var free = Tables.lineitem(spark, sfDir)
      .filter($"l_shipdate" >= lit(Q379WinLo).cast("timestamp") &&
        $"l_shipdate" < lit(Q379WinHi).cast("timestamp"))
      .groupBy($"l_suppkey".as("s"), $"l_partkey".as("p"))
      .agg(count(lit(1)).as("w"))
      .localCheckpoint()
    val traj = ArrayBuffer[(Long, Long, Long)]()
    for (r <- 1 to Q379Rounds) {
      val prop = free.groupBy($"s")
        .agg(max(struct($"w", (-$"p").as("np"))).as("m"))
        .select($"s", $"m.w".as("w"), (-$"m.np").as("p"))
      val acc = prop.groupBy($"p")
        .agg(max(struct($"w", (-$"s").as("ns"))).as("m"))
        .select($"p", $"m.w".as("w"), (-$"m.ns").as("s"))
        .localCheckpoint()
      val stats = acc.agg(count(lit(1)),
        coalesce(sum($"w"), lit(0L))).as[(Long, Long)].head()
      traj += ((r.toLong, stats._1, stats._2))
      free = free
        .join(acc.select($"s".as("ms")), $"s" === $"ms", "left_anti")
        .join(acc.select($"p".as("mp")), $"p" === $"mp", "left_anti")
        .localCheckpoint()
    }
    traj.toSeq.toDF("round", "new_matches", "new_weight")
      .orderBy($"round")
  }

  def q379Sql: String = {
    val e0 =
      s"""e0 AS (
           SELECT l_suppkey AS s, l_partkey AS p,
             CAST(count(*) AS BIGINT) AS w
           FROM lineitem
           WHERE l_shipdate >= TIMESTAMP '$Q379WinLo'
             AND l_shipdate < TIMESTAMP '$Q379WinHi'
           GROUP BY 1, 2)"""
    val rounds = (1 to Q379Rounds).map { r =>
      s"""prop$r AS MATERIALIZED (
           SELECT s, p, w FROM (
             SELECT s, p, w, row_number() OVER (
               PARTITION BY s ORDER BY w DESC, p ASC) AS rn
             FROM e${r - 1}) WHERE rn = 1),
         acc$r AS MATERIALIZED (
           SELECT s, p, w FROM (
             SELECT s, p, w, row_number() OVER (
               PARTITION BY p ORDER BY w DESC, s ASC) AS rn
             FROM prop$r) WHERE rn = 1),
         e$r AS MATERIALIZED (
           SELECT e.* FROM e${r - 1} e
           WHERE e.s NOT IN (SELECT s FROM acc$r)
             AND e.p NOT IN (SELECT p FROM acc$r))"""
    }.mkString(",\n")
    val rows = (1 to Q379Rounds).map { r =>
      s"""SELECT CAST($r AS BIGINT) AS round,
            CAST((SELECT count(*) FROM acc$r) AS BIGINT) AS new_matches,
            CAST((SELECT coalesce(sum(w), 0) FROM acc$r) AS BIGINT)
              AS new_weight"""
    }.mkString("\nUNION ALL\n")
    s"WITH $e0,\n$rounds\nSELECT * FROM ($rows) ORDER BY round"
  }

  /** q380 time split: transitions whose DESTINATION event lands
    * before this instant train the model; the rest score it. */
  val Q380Split = "2024-01-16 00:00:00"

  /** q380 — MARKOV NEXT-EVENT PREDICTION EVAL: per-user consecutive
    * event-type transitions; the model is the majority next-type per
    * current type, trained strictly on pre-[[Q380Split]] transitions
    * (ties to the lexicographically first type); scored on the rest.
    * Emits per current type: the prediction, test volume, correct
    * count, accuracy permille, and the majority-class share the model
    * had in training — the baseline every sequence model must beat
    * before anyone trains something bigger.
    *
    * Scale: transitions come from ONE lag window partitioned by user
    * (small per-user partitions); train/model/eval are |types|²-
    * bounded aggregates with a broadcast model join. */
  def q380MarkovEval(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"user_id").orderBy($"us", $"event_id")
    val trans = Tables.events(spark, sfDir)
      .select($"user_id", $"event_id", $"event_type",
        unix_micros($"ts").as("us"))
      .select($"event_type".as("next_t"), $"us",
        lag($"event_type", 1).over(w).as("prev_t"))
      .filter($"prev_t".isNotNull)
      .select($"prev_t", $"next_t",
        ($"us" < unix_micros(lit(Q380Split).cast("timestamp")))
          .as("is_train"))
    val counts = trans.filter($"is_train")
      .groupBy($"prev_t", $"next_t").agg(count(lit(1)).as("cnt"))
    val model = counts.groupBy($"prev_t")
      .agg(max(struct($"cnt",
          expr("- CAST(conv(substr(md5(next_t), 1, 15), 16, 10) AS BIGINT)")
            .as("nh"))).as("m"),
        sum($"cnt").as("n_train"))
      .join(counts.select($"prev_t".as("pt2"), $"next_t", $"cnt"),
        $"prev_t" === $"pt2" && $"m.cnt" === $"cnt" &&
          $"m.nh" === -expr(
            "CAST(conv(substr(md5(next_t), 1, 15), 16, 10) AS BIGINT)"))
      .select($"prev_t", $"next_t".as("predicted"), $"m.cnt".as("maj_cnt"),
        $"n_train")
    val eval = trans.filter(!$"is_train")
      .join(broadcast(model), Seq("prev_t"), "inner")
      .groupBy($"prev_t", $"predicted", $"maj_cnt", $"n_train")
      .agg(count(lit(1)).as("n_test"),
        sum(($"next_t" === $"predicted").cast("long")).as("correct"))
    TempIo.materialize(spark,
      eval.select($"prev_t", $"predicted", $"n_test", $"correct",
        expr("(1000 * correct) div n_test").as("acc_permille"),
        expr("(1000 * maj_cnt) div n_train").as("train_share_permille"))
      .orderBy($"prev_t"))
  }

  def q380Sql: String =
    s"""WITH trans AS (
         SELECT lag(event_type) OVER (
             PARTITION BY user_id
             ORDER BY epoch_us(ts), event_id) AS prev_t,
           event_type AS next_t,
           epoch_us(ts) <
             epoch_us(TIMESTAMP '$Q380Split') AS is_train
         FROM events),
       t2 AS (SELECT * FROM trans WHERE prev_t IS NOT NULL),
       counts AS (
         SELECT prev_t, next_t, CAST(count(*) AS BIGINT) AS cnt
         FROM t2 WHERE is_train GROUP BY 1, 2),
       totals AS (
         SELECT prev_t, CAST(sum(cnt) AS BIGINT) AS n_train
         FROM counts GROUP BY 1),
       model AS (
         SELECT w.prev_t, w.next_t AS predicted, w.cnt AS maj_cnt,
           totals.n_train
         FROM (
           SELECT *, row_number() OVER (PARTITION BY prev_t
             ORDER BY cnt DESC,
               CAST('0x' || substr(md5(next_t), 1, 15) AS BIGINT) ASC)
             AS rn
           FROM counts) w
         JOIN totals ON w.prev_t = totals.prev_t
         WHERE w.rn = 1),
       eval AS (
         SELECT m.prev_t, m.predicted, m.maj_cnt, m.n_train,
           CAST(count(*) AS BIGINT) AS n_test,
           CAST(sum(CASE WHEN t.next_t = m.predicted THEN 1 ELSE 0 END)
             AS BIGINT) AS correct
         FROM t2 t JOIN model m ON t.prev_t = m.prev_t
         WHERE NOT t.is_train
         GROUP BY 1, 2, 3, 4)
       SELECT prev_t, predicted, n_test, correct,
         CAST((1000 * correct) // n_test AS BIGINT) AS acc_permille,
         CAST((1000 * maj_cnt) // n_train AS BIGINT)
           AS train_share_permille
       FROM eval ORDER BY prev_t"""

  /** q381 bucket parameters: capacity 2 tokens (micro-token grid),
    * refill 1 token per 4 hours = 1 micro-token per [[Q381D]] µs. */
  val Q381CapMicro = 2000000L
  val Q381D = 14400L
  val Q381Pack = 100000000L

  /** q381 — TOKEN-BUCKET RATE LIMITER as an exact integer fold: each
    * user's event stream drains a bucket (capacity
    * [[Q381CapMicro]] µ-tokens, refill 1/[[Q381D]] µ-token per µs,
    * one token per event); the fold carries (tokens, rejected) packed
    * into ONE BIGINT ([[Q381Pack]] radix) because both engines'
    * list folds require accumulator type = element type. Inputs are
    * the per-event arrival DELTAS (one lag pass), so the fold
    * elements stay small and the packing stays in range. Emits the
    * per-user rejection histogram — the admission-control curve a
    * quota system publishes.
    *
    * Scale: the lag window is user-partitioned; each user's fold runs
    * over their own bounded event list (the same per-key fold
    * contract as the q253 BPE encode); output is a ≤11-row
    * histogram. */
  def q381RateLimiter(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"user_id").orderBy($"us", $"event_id")
    val deltas = Tables.events(spark, sfDir)
      .select($"user_id", $"event_id", unix_micros($"ts").as("us"))
      .select($"user_id", $"us", $"event_id",
        coalesce($"us" - lag($"us", 1).over(w), lit(0L)).as("dt"))
    val folded = deltas.groupBy($"user_id")
      .agg(expr(
        s"""aggregate(
              array_sort(collect_list(struct(us, event_id, dt))),
              CAST(${Q381CapMicro * Q381Pack} AS BIGINT),
              (acc, x) -> CASE
                WHEN least($Q381CapMicro,
                    acc div $Q381Pack + x.dt div $Q381D) >= 1000000
                THEN (least($Q381CapMicro,
                    acc div $Q381Pack + x.dt div $Q381D) - 1000000)
                  * $Q381Pack + acc % $Q381Pack
                ELSE least($Q381CapMicro,
                    acc div $Q381Pack + x.dt div $Q381D)
                  * $Q381Pack + acc % $Q381Pack + 1
              END)""").as("acc"))
      .select($"user_id", expr(s"acc % $Q381Pack").as("rejected"))
    folded.groupBy(least($"rejected", lit(10L)).as("rej_bucket"))
      .agg(count(lit(1)).as("n_users"), sum($"rejected").as("sum_rejected"))
      .orderBy($"rej_bucket")
  }

  def q381Sql: String =
    s"""WITH deltas AS (
         SELECT user_id,
           coalesce(epoch_us(ts) - lag(epoch_us(ts)) OVER (
             PARTITION BY user_id
             ORDER BY epoch_us(ts), event_id), 0) AS dt,
           epoch_us(ts) AS us, event_id
         FROM events),
       folded AS (
         SELECT user_id,
           list_reduce(
             list_prepend(CAST(${Q381CapMicro * Q381Pack} AS BIGINT),
               list(dt ORDER BY us, event_id)),
             (acc, x) -> CASE
               WHEN least($Q381CapMicro,
                   acc // $Q381Pack + x // $Q381D) >= 1000000
               THEN (least($Q381CapMicro,
                   acc // $Q381Pack + x // $Q381D) - 1000000)
                 * $Q381Pack + acc % $Q381Pack
               ELSE least($Q381CapMicro,
                   acc // $Q381Pack + x // $Q381D)
                 * $Q381Pack + acc % $Q381Pack + 1
             END) AS acc
         FROM deltas GROUP BY user_id)
       SELECT least(acc % $Q381Pack, 10) AS rej_bucket,
         CAST(count(*) AS BIGINT) AS n_users,
         CAST(sum(acc % $Q381Pack) AS BIGINT) AS sum_rejected
       FROM folded GROUP BY 1 ORDER BY rej_bucket"""
}
