package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Eighty-eighth query wave, batch half: q397 LRU cache simulation as
  * an exact packed-state fold over per-user event-type streams, and
  * q398 duplicate-aware token budgeting per source (the q392 CDC
  * chunking turned into a curation allocation table).
  */
object Relational69 {

  /** q397 cache parameters: 2 slots over the 6-symbol alphabet
    * (5 known event types + 1 other), state packed base-7
    * (6 = empty slot). */
  val Q397Pack = 1000000L

  /** The shared event-type → small-int mapping (CASE ladder, fixture
    * event types; unknown types collapse to 5). */
  def q397TypeIdSql(col: String): String =
    s"""CASE $col WHEN 'click' THEN 0 WHEN 'error' THEN 1
        WHEN 'purchase' THEN 2 WHEN 'signup' THEN 3
        WHEN 'view' THEN 4 ELSE 5 END"""

  /** q397 — LRU CACHE SIMULATION: each user's event-type stream
    * drives a 2-slot LRU cache (would a per-user, per-type resource —
    * a session context, a feature block — still be warm?); the fold
    * carries (MRU slot, LRU slot, hits) packed into one BIGINT
    * (base-7 state × [[Q397Pack]] + hits — the q381/q387 packed-fold
    * contract). A hit on the LRU slot promotes it; a miss evicts it.
    * Emits the per-user hit-rate histogram in permille deciles — the
    * working-set evidence behind any cache-size decision, computed
    * exactly, policy and all.
    *
    * Scale: one lag-free grouped fold per user over their own
    * bounded event list; the histogram is an 11-row aggregate. */
  def q397LruSim(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val evs = Tables.events(spark, sfDir)
      .select($"user_id", $"event_id", unix_micros($"ts").as("us"),
        expr(q397TypeIdSql("event_type")).as("ti"))
    val P = Q397Pack
    // state = a*7 + b (a = MRU, b = LRU, 6 = empty); init 6*7+6 = 48
    val folded = evs.groupBy($"user_id")
      .agg(count(lit(1)).as("n"), expr(
        s"""aggregate(
              array_sort(collect_list(struct(us, event_id, ti))),
              CAST(48 * $P AS BIGINT),
              (acc, x) -> CASE
                WHEN x.ti = (acc div $P) div 7 THEN acc + 1
                WHEN x.ti = (acc div $P) % 7
                  THEN (x.ti * 7 + (acc div $P) div 7) * $P
                    + acc % $P + 1
                ELSE (x.ti * 7 + (acc div $P) div 7) * $P + acc % $P
              END)""").as("acc"))
      .select($"user_id", $"n", expr(s"acc % $P").as("hits"))
    folded.groupBy(expr("((1000 * hits) div n) div 100").as("decile"))
      .agg(count(lit(1)).as("n_users"), sum($"hits").as("sum_hits"),
        sum($"n").as("sum_accesses"))
      .orderBy($"decile")
  }

  def q397Sql: String = {
    val P = Q397Pack
    s"""WITH evs AS (
         SELECT user_id, event_id, epoch_us(ts) AS us,
           ${q397TypeIdSql("event_type")} AS ti
         FROM events),
       folded AS (
         SELECT user_id, CAST(count(*) AS BIGINT) AS n,
           list_reduce(
             list_prepend(CAST(48 * $P AS BIGINT),
               list(CAST(ti AS BIGINT) ORDER BY us, event_id)),
             (acc, x) -> CASE
               WHEN x = (acc // $P) // 7 THEN acc + 1
               WHEN x = (acc // $P) % 7
                 THEN (x * 7 + (acc // $P) // 7) * $P + acc % $P + 1
               ELSE (x * 7 + (acc // $P) // 7) * $P + acc % $P
             END) AS acc
         FROM evs GROUP BY user_id)
       SELECT ((1000 * (acc % $P)) // n) // 100 AS decile,
         CAST(count(*) AS BIGINT) AS n_users,
         CAST(sum(acc % $P) AS BIGINT) AS sum_hits,
         CAST(sum(n) AS BIGINT) AS sum_accesses
       FROM folded GROUP BY 1 ORDER BY decile"""
  }

  /** q398 — DUPLICATE-AWARE TOKEN BUDGETS: q392's content-defined
    * chunks rolled up per SOURCE — raw token mass, chunk counts,
    * within-source distinct chunks, chunks whose content also
    * appears in ANOTHER source, and the effective (dedup-discounted)
    * token budget (tokens × distinct/chunks). This is the allocation
    * table a data-mixing recipe (q162/q264) should consume INSTEAD
    * of raw token counts: a source that is 30% self-copies buys 30%
    * fewer unique tokens than its size claims.
    *
    * Scale: per-document windows for the chunking, chunk-hash-keyed
    * aggregates for the dedup — the q392 plan with a source
    * dimension carried through. */
  def q398SourceBudgets(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val toks = Tables.documents(spark, sfDir)
      .select($"doc_id", $"source",
        graft.functions.TextFunctions.tokens($"text").as("t"))
      .select($"doc_id", $"source", posexplode($"t").as(Seq("p", "tok")))
      .select($"doc_id", $"source", ($"p" + 1).as("pos"), $"tok")
    val w = Window.partitionBy($"doc_id").orderBy($"pos")
    val seg = toks
      .select($"doc_id", $"source", $"pos", $"tok",
        lag($"tok", 1).over(w).as("pt"))
      .select($"doc_id", $"source", $"pos", $"tok",
        when($"pt".isNotNull &&
          expr(s"CAST(conv(substr(md5(concat(pt, ' ', tok)), 1, 12)," +
            s" 16, 10) AS BIGINT) % ${Relational67.Q392Mod}") === 0L, 1L)
          .otherwise(0L).as("b"))
      .select($"doc_id", $"source", $"pos", $"tok",
        sum($"b").over(w).as("seg"))
    val chunks = seg.groupBy($"doc_id", $"source", $"seg")
      .agg(md5(expr(
        "array_join(transform(array_sort(collect_list(" +
          "struct(pos, tok))), x -> x.tok), ' ')")).as("h"),
        count(lit(1)).as("len"))
    val spread = chunks.groupBy($"h")
      .agg(countDistinct($"source").as("nsrc"))
    val bySource = chunks.join(spread, Seq("h"))
      .groupBy($"source")
      .agg(countDistinct($"doc_id").as("n_docs"),
        sum($"len").as("tokens"),
        count(lit(1)).as("n_chunks"),
        countDistinct($"h").as("n_distinct"),
        sum(($"nsrc" >= 2L).cast("long")).as("n_shared_out"))
    bySource.select($"source", $"n_docs", $"tokens", $"n_chunks",
        $"n_distinct", $"n_shared_out",
        expr("(tokens * n_distinct) div n_chunks").as("eff_tokens"))
      .orderBy($"source")
  }

  def q398Sql: String =
    s"""WITH toks AS (
         SELECT doc_id, source, i AS pos, t[i] AS tok
         FROM (SELECT doc_id, source,
             regexp_split_to_array(trim(text), '\\s+') AS t
           FROM documents), unnest(range(1, len(t) + 1)) AS r(i)),
       seg AS (
         SELECT doc_id, source, pos, tok,
           sum(b) OVER (PARTITION BY doc_id ORDER BY pos
             ROWS UNBOUNDED PRECEDING) AS seg
         FROM (
           SELECT doc_id, source, pos, tok,
             CASE WHEN pt IS NOT NULL AND
               CAST('0x' || substr(md5(pt || ' ' || tok), 1, 12)
                 AS BIGINT) % ${Relational67.Q392Mod} = 0
               THEN 1 ELSE 0 END AS b
           FROM (
             SELECT doc_id, source, pos, tok,
               lag(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS pt
             FROM toks))),
       chunks AS (
         SELECT doc_id, source, seg,
           md5(string_agg(tok, ' ' ORDER BY pos)) AS h,
           CAST(count(*) AS BIGINT) AS len
         FROM seg GROUP BY 1, 2, 3),
       spread AS (
         SELECT h, CAST(count(DISTINCT source) AS BIGINT) AS nsrc
         FROM chunks GROUP BY 1)
       SELECT c.source,
         CAST(count(DISTINCT c.doc_id) AS BIGINT) AS n_docs,
         CAST(sum(c.len) AS BIGINT) AS tokens,
         CAST(count(*) AS BIGINT) AS n_chunks,
         CAST(count(DISTINCT c.h) AS BIGINT) AS n_distinct,
         CAST(sum(CASE WHEN s.nsrc >= 2 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_shared_out,
         CAST((sum(c.len) * count(DISTINCT c.h)) // count(*)
           AS BIGINT) AS eff_tokens
       FROM chunks c JOIN spread s ON c.h = s.h
       GROUP BY c.source ORDER BY c.source"""
}
