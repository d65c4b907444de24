package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Text-analysis / NLP-contract queries over the `documents` table —
  * the reference's enrichment surface (SURVEY §2.7) plus the
  * training-data-pipeline text ops (language-ID, quality scoring, token
  * stats, fingerprinting).
  *
  * Scale posture: every op here is a narrow per-row projection followed
  * by a low-cardinality aggregate — embarrassingly parallel, no shuffle
  * beyond the final partial/final hash aggregate. The scalar functions
  * are pure Column expressions, so they run inside whole-stage codegen
  * over the parquet scan with only (doc_id, text, …) columns read.
  */
object TextQueries {

  /** M1 (consumer.scala:125-128): sentiment enrichment → label counts
    * per source. */
  def q14Sentiment(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .select($"source", sentiment($"text").as("sentiment"))
      .groupBy($"source", $"sentiment")
      .agg(count(lit(1)).as("counts"))
      .orderBy($"source", $"sentiment")
  }

  /** M2 + A4 (consumer.scala:132-148,170): emotion enrichment pivoted to
    * the wide 6-label shape with explicit pivot values. */
  def q15EmotionPivot(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .select($"source", emotion($"text").as("emotion"))
      .groupBy($"source")
      .pivot("emotion", EmotionLabels)
      .agg(count(lit(1)))
      .na.fill(0)
      .orderBy($"source")
  }

  /** M3 (consumer.scala:135-137): tokenizer as a generator — explode to
    * one row per token, then global token frequencies. Top-20 with a
    * total tiebreak so the limit is deterministic. */
  def q16TokenFreq(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .select(explode(tokens($"text")).as("token"))
      .filter($"token" =!= "")
      .groupBy($"token")
      .agg(count(lit(1)).as("counts"))
      .orderBy($"counts".desc, $"token")
      .limit(20)
  }

  /** Language-ID heuristic vs the labeled `lang` column: agreement
    * matrix (labeled lang × predicted lang). */
  def q17LangId(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .select($"lang", langId($"text").as("pred"))
      .groupBy($"lang", $"pred")
      .agg(count(lit(1)).as("counts"))
      .orderBy($"lang", $"pred")
  }

  /** Quality scoring: per-source decimal sum + count (sum kept decimal so
    * the aggregate is accumulation-order independent), plus integer token
    * stats. */
  def q18Quality(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .select($"source", qualityScore($"text").as("q"), tokenCount($"text").as("wc"))
      .groupBy($"source")
      .agg(
        Exact.decToDouble(sum($"q".cast("decimal(12,6)")), 6).as("sum_quality"),
        min($"wc").as("min_wc"),
        max($"wc").as("max_wc"),
        count(lit(1)).as("counts"))
      .orderBy($"source")
  }

  /** Exact-dedup groups by content fingerprint: canonical keeper
    * (min doc_id) + multiplicity per normalized-text md5. */
  def q19Fingerprint(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .select($"doc_id", fingerprint($"text").as("fp"))
      .groupBy($"fp")
      .agg(min($"doc_id").as("keeper"), count(lit(1)).as("dups"))
      .orderBy($"fp")
  }

  /** TF-IDF: the classic text-pipeline weighting, over a 10% document
    * sample (tf and df computed within the sample). Top-5 terms per doc
    * with a total tie-break. ln() is rounded post-formula to absorb
    * last-ulp libm differences between engines. */
  def q44Tfidf(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val toks = Tables.documents(spark, sfDir)
      .filter($"doc_id" % 10 === 0)
      .select($"doc_id", explode(tokens($"text")).as("token"))
      .filter($"token" =!= "")
    val tf = toks.groupBy($"doc_id", $"token").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy($"token").agg(count(lit(1)).as("df"))
    // corpus size as a 1-row cross join (the oracle's n CTE shape), NOT
    // a driver-side count(): keeps the whole query one lazy plan instead
    // of a second eager job over the tokenized sample
    val n = tf.select(countDistinct($"doc_id").as("n"))
    val scored = tf.join(df, Seq("token")).crossJoin(n)
      .withColumn("tfidf",
        round($"tf" * (log(($"n" + 1.0) / ($"df" + 1.0)) + 1.0), 6))
    val w = Window.partitionBy($"doc_id").orderBy($"tfidf".desc, $"token")
    scored.withColumn("rank", row_number().over(w))
      .filter($"rank" <= 5)
      .select($"doc_id", $"rank", $"token", $"tfidf")
      .orderBy($"doc_id", $"rank")
  }

  /** Flagship: the reference's full aggregate shape (consumer.scala:
    * 158-174 — A1 positivity rate + A2 counts + A4 emotion pivot + J1
    * join of the two aggregates) re-expressed over documents, with
    * `source` standing in for `topic`. */
  def q20Flagship(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val enriched = Tables.documents(spark, sfDir)
      .select($"source",
        sentiment($"text").as("sentiment"),
        emotion($"text").as("emotion"))
    val rates = enriched
      .groupBy($"source")
      .agg(
        round(avg(when($"sentiment" <=> "positive", 1).otherwise(0)), 4)
          .as("positivity_rate"),
        count(lit(1)).as("counts"))
    val wide = enriched
      .groupBy($"source")
      .pivot("emotion", EmotionLabels)
      .agg(count(lit(1)))
      .na.fill(0)
    rates.join(wide, Seq("source"), "inner")
      .orderBy($"source")
  }

  /** Token accounting at both granularities a training pipeline budgets
    * in: whitespace words and BPE-style pre-tokenizer units (letter runs
    * / digit runs / punctuation runs — the split every subword tokenizer
    * applies before merges). The unit ratio per source approximates
    * tokens-per-word for cost estimation without shipping a tokenizer
    * model. ASCII classes keep the regex semantics identical across
    * engines. */
  def q68TokenBudget(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val bpeish = size(regexp_extract_all($"text",
      lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\r\f]+"), lit(0)))
    Tables.documents(spark, sfDir)
      .select($"source", tokenCount($"text").as("ws"), bpeish.as("bpe"))
      .groupBy($"source")
      .agg(sum($"ws").as("sum_ws"), sum($"bpe").as("sum_bpe"))
      .withColumn("units_per_word",
        $"sum_bpe".cast("double") / $"sum_ws")
      .orderBy($"source")
  }

  def q68Sql: String =
    s"""SELECT source,
        CAST(sum(${tokenCountSql("text")}) AS BIGINT) AS sum_ws,
        CAST(sum(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\r\f]+'))) AS BIGINT) AS sum_bpe,
        CAST(sum(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\r\f]+'))) AS DOUBLE)
          / sum(${tokenCountSql("text")}) AS units_per_word
        FROM documents GROUP BY source ORDER BY source"""

  /** Curation funnel — the end-to-end training-data filtering pipeline
    * composed from the text ops, reported as survivors per successive
    * stage (each stage conjoins onto the last, all counted in ONE scan
    * via conditional aggregation): language keep → quality floor →
    * length band → exact-dedup keeper. The keeper is the min doc_id per
    * content fingerprint AMONG THE SURVIVORS of the earlier stages — a
    * keeper chosen over the full corpus would vanish entirely whenever a
    * duplicate group's global-min member fails an earlier filter (its
    * surviving twins would all be non-keepers), silently dropping the
    * content from the curated set. The funnel shape is what a curation
    * run reports at 100 TB; no stage materializes an intermediate
    * dataset. */
  def q69CurationFunnel(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // text itself is NOT projected forward: only its derived signals
    // flow into the fingerprint-partitioned window exchange — explicit,
    // not left to ColumnPruning
    val enriched = Tables.documents(spark, sfDir)
      .select($"doc_id",
        langId($"text").as("pred"),
        qualityScore($"text").as("q"),
        tokenCount($"text").as("wc"),
        fingerprint($"text").as("fp"))
      .withColumn("surv",
        $"pred" === "en" && $"q" >= 0.5 && $"wc".between(5, 5000))
      .withColumn("keeper", $"doc_id" ===
        min(when($"surv", $"doc_id")).over(Window.partitionBy($"fp")))
    val lang = $"pred" === "en"
    val qual = lang && $"q" >= 0.5
    enriched.agg(
      count(lit(1)).as("n_total"),
      count(when(lang, 1)).as("n_lang"),
      count(when(qual, 1)).as("n_quality"),
      count(when($"surv", 1)).as("n_length"),
      count(when($"surv" && $"keeper", 1)).as("n_kept"))
  }

  def q69Sql: String =
    s"""WITH e1 AS (
          SELECT doc_id,
            ${TF_langIdSql} AS pred,
            ${TF_qualitySql} AS q,
            ${TF_tokenCountSql} AS wc,
            ${TF_fingerprintSql} AS fp
          FROM documents),
        e2 AS (
          SELECT doc_id, pred, q, wc,
            (pred = 'en' AND q >= 0.5 AND wc BETWEEN 5 AND 5000) AS surv,
            doc_id = min(CASE WHEN pred = 'en' AND q >= 0.5
                               AND wc BETWEEN 5 AND 5000
                              THEN doc_id END)
              OVER (PARTITION BY fp) AS keeper
          FROM e1)
        SELECT count(*) AS n_total,
          count(*) FILTER (WHERE pred = 'en') AS n_lang,
          count(*) FILTER (WHERE pred = 'en' AND q >= 0.5) AS n_quality,
          count(*) FILTER (WHERE surv) AS n_length,
          count(*) FILTER (WHERE surv AND keeper) AS n_kept
        FROM e2"""

  private def TF_langIdSql = langIdSql("text")
  private def TF_qualitySql = qualityScoreSql("text")
  private def TF_tokenCountSql = tokenCountSql("text")
  private def TF_fingerprintSql = fingerprintSql("text")

  /** Token-budget-constrained selection — the data-mixing primitive: per
    * source, rank docs by quality (doc_id tiebreak) and keep the prefix
    * whose cumulative token count stays within half the source's tokens.
    * The budget predicate is pure integer arithmetic
    * (2 * running <= total), so no float boundary can flip membership.
    * One shuffle on source; the running sum is a window over the ranked
    * order — at 100 TB the same plan holds with source as the partition
    * key. */
  def q70BudgetSelection(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val ranked = Window.partitionBy($"source").orderBy($"q".desc, $"doc_id")
    val enriched = Tables.documents(spark, sfDir)
      .select($"source", $"doc_id",
        qualityScore($"text").as("q"),
        tokenCount($"text").cast("long").as("wc"))
      .withColumn("running",
        sum($"wc").over(ranked.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("total", sum($"wc").over(Window.partitionBy($"source")))
    // conditional aggregation, NOT filter-then-group: a source whose
    // single top doc already exceeds half the budget must still appear
    // in the report (n_kept = 0), not silently vanish from the audit
    enriched
      .withColumn("member", $"running" * 2 <= $"total")
      .groupBy($"source")
      .agg(count(when($"member", 1)).as("n_kept"),
        coalesce(sum(when($"member", $"wc")), lit(0L)).as("wc_kept"),
        max($"total").as("wc_total"))
      .withColumn("share", $"wc_kept".cast("double") / $"wc_total")
      .orderBy($"source")
  }

  def q70Sql: String =
    s"""WITH enriched AS (
          SELECT source, doc_id,
            ${qualityScoreSql("text")} AS q,
            CAST(${tokenCountSql("text")} AS BIGINT) AS wc
          FROM documents),
        windowed AS (
          SELECT source, wc,
            sum(wc) OVER (PARTITION BY source ORDER BY q DESC, doc_id
                          ROWS UNBOUNDED PRECEDING) AS running,
            sum(wc) OVER (PARTITION BY source) AS total
          FROM enriched)
        SELECT source,
          count(*) FILTER (WHERE running * 2 <= total) AS n_kept,
          CAST(coalesce(sum(wc) FILTER (WHERE running * 2 <= total), 0) AS BIGINT)
            AS wc_kept,
          CAST(max(total) AS BIGINT) AS wc_total,
          CAST(coalesce(sum(wc) FILTER (WHERE running * 2 <= total), 0) AS DOUBLE)
            / max(total) AS share
        FROM windowed
        GROUP BY source ORDER BY source"""

  /** Deterministic train/val/test split: assignment is a pure function
    * of the stable doc key (first 2 hex chars of md5 → 256 buckets:
    * 205/26/25 ≈ 80/10/10), so membership survives re-runs, engine
    * swaps, and repartitioning — the reproducibility property RNG-seeded
    * splits lose the moment the partitioning changes. Per (split, lang):
    * doc and token counts, to audit that the hash split is unbiased
    * across strata. A pure map over the scan — no shuffle before the
    * final tiny aggregate. */
  def q80SplitAssign(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val bucket = substring(md5($"doc_id".cast("string")), 1, 2)
    Tables.documents(spark, sfDir)
      .select($"lang", tokenCount($"text").cast("long").as("wc"),
        when(bucket < "cd", "train")
          .when(bucket < "e7", "val")
          .otherwise("test").as("split"))
      .groupBy($"split", $"lang")
      .agg(count(lit(1)).as("n_docs"), sum($"wc").as("n_tokens"))
      .orderBy($"split", $"lang")
  }

  def q80Sql: String =
    s"""SELECT CASE
          WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cd' THEN 'train'
          WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e7' THEN 'val'
          ELSE 'test' END AS split,
        lang, count(*) AS n_docs,
        CAST(sum(CAST(${tokenCountSql("text")} AS BIGINT)) AS BIGINT) AS n_tokens
        FROM documents GROUP BY 1, 2 ORDER BY split, lang"""

  /** DISTRIBUTED prefix sum of token counts in stable doc_id order —
    * the skeleton shared by shard packing (q81) and sequence packing
    * (q88). NOT a global single-partition window: docs bucket by doc_id
    * range, per-bucket sums aggregate to a tiny frame whose running
    * total (window over the bucket frame) broadcasts back as each
    * bucket's offset; the within-bucket window partitions by bucket.
    * Returns (doc_id, wc, before) with `before` = sum of all earlier
    * docs' token counts.
    *
    * The bucket width SCALES with the corpus — sized from the doc_id
    * RANGE (not the row count: bucket = doc_id div width, so on a
    * sparse-id corpus — exactly what post-dedup/curation survivors look
    * like — a count-derived width would inflate the "tiny" offset frame
    * by the sparsity factor and bust the forced broadcast and the
    * one-task window). ⌈span/8192⌉-ish width, floored at 1000, keeps
    * the frame ~8k rows at ANY corpus size and sparsity; sizing costs
    * one min/max column scan (parquet stats). For corpora where even
    * span/8192 buckets of docs overflow a partition, the same
    * two-level construction nests recursively. */
  private def tokenPrefixSums(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val (minId, maxId) = Tables.documents(spark, sfDir)
      .agg(min($"doc_id"), max($"doc_id")).as[(Long, Long)].head()
    val BucketSz = math.max(1000L, (maxId - minId + 1) / 8192L)
    val docs = Tables.documents(spark, sfDir)
      .select($"doc_id", expr(s"(doc_id - $minId) div $BucketSz").as("bucket"),
        tokenCount($"text").cast("long").as("wc"))
    val bucketOffsets = docs.groupBy($"bucket")
      .agg(sum($"wc").as("bwc"))
      .withColumn("offset",
        coalesce(sum($"bwc").over(
          Window.orderBy($"bucket").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select($"bucket", $"offset")
    val inBucket = Window.partitionBy($"bucket")
      .orderBy($"doc_id").rowsBetween(Window.unboundedPreceding, -1)
    docs.join(broadcast(bucketOffsets), Seq("bucket"))
      .withColumn("before",
        $"offset" + coalesce(sum($"wc").over(inBucket), lit(0L)))
      .select($"doc_id", $"wc", $"before")
  }

  /** Shard token budget shared by q81's packing, q280's manifest and
    * q283's takedown plan — ONE constant because the three queries'
    * shard assignments must stay byte-identical (the manifest and the
    * takedown plan only mean anything if they reproduce q81's
    * boundaries); it also feeds all three oracle SQLs. */
  val ShardBudget = 5000L

  /** Token-budget shard packing: assign docs (in stable doc_id order) to
    * contiguous shards of ~[[ShardBudget]] tokens — the write-side
    * layout step that turns a curated corpus into training shards.
    * shard = floor(prefix tokens BEFORE this doc / budget), i.e. a doc
    * belongs to the shard its first token lands in. Prefix sums via
    * [[tokenPrefixSums]]. */
  def q81ShardPack(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    tokenPrefixSums(spark, sfDir)
      .withColumn("shard", expr(s"before div $ShardBudget"))
      .groupBy($"shard")
      .agg(count(lit(1)).as("n_docs"), sum($"wc").as("n_tokens"),
        min($"doc_id").as("first_doc"), max($"doc_id").as("last_doc"))
      .orderBy($"shard")
  }

  def q81Sql: String =
    s"""WITH docs AS (
          SELECT doc_id, CAST(${tokenCountSql("text")} AS BIGINT) AS wc
          FROM documents),
        pos AS (
          SELECT doc_id, wc,
            CAST(coalesce(sum(wc) OVER (ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
              AS before
          FROM docs)
        SELECT before // $ShardBudget AS shard, count(*) AS n_docs,
          CAST(sum(wc) AS BIGINT) AS n_tokens,
          min(doc_id) AS first_doc, max(doc_id) AS last_doc
        FROM pos GROUP BY 1 ORDER BY shard"""

  /** PII-shaped redaction: mask every digit in the raw `props` payload
    * (the standard scrub before text ships to training), and audit the
    * redaction per event_type — rows touched, characters masked,
    * distinct post-redaction payload shapes (collapsing numerals
    * typically collapses payloads to a few templates, which is itself a
    * useful schema-discovery signal). Pure regex maps inside codegen;
    * the audit aggregate is the only shuffle. */
  def q84Redact(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val redacted = regexp_replace($"props", "[0-9]", "#")
    graft.engine.Tables.events(spark, sfDir)
      .select($"event_type", redacted.as("red"),
        length(regexp_replace($"props", "[^0-9]", "")).cast("long").as("n_digits"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_rows"),
        sum($"n_digits").as("n_masked"),
        countDistinct($"red").as("n_templates"))
      .orderBy($"event_type")
  }

  def q84Sql: String =
    """SELECT event_type, count(*) AS n_rows,
       CAST(sum(length(regexp_replace(props, '[^0-9]', '', 'g'))) AS BIGINT)
         AS n_masked,
       count(DISTINCT regexp_replace(props, '[0-9]', '#', 'g')) AS n_templates
       FROM events GROUP BY event_type ORDER BY event_type"""

  /** Within-document repetition filter (the C4-style quality signal the
    * length/stopword score q18 can't see): a doc whose tokens are mostly
    * repeats of a small vocabulary is boilerplate or spam. Flagging is
    * integer-exact (4·(n−distinct) > 3·n ⇔ repetition > 75%) so no float
    * boundary can flip membership; the per-source repetition share is
    * one double division of exact totals. Pure per-row token/distinct
    * counts inside the scan — no shuffle before the tiny aggregate. */
  def q87Repetition(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .select($"source",
        tokenCount($"text").cast("long").as("n"),
        size(array_distinct(tokens($"text"))).cast("long").as("d"))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        count(when(($"n" - $"d") * 4 > $"n" * 3, 1)).as("n_flagged"),
        sum($"n").as("tok_total"),
        sum($"n" - $"d").as("tok_repeated"))
      .withColumn("rep_share",
        $"tok_repeated".cast("double") / $"tok_total")
      .orderBy($"source")
  }

  def q87Sql: String = {
    val n = s"CAST(${tokenCountSql("text")} AS BIGINT)"
    val d = s"CAST(len(list_distinct(regexp_split_to_array(trim(text), '\\s+'))) AS BIGINT)"
    s"""WITH t AS (SELECT source, $n AS n, $d AS d FROM documents)
        SELECT source, count(*) AS n_docs,
          count(*) FILTER (WHERE (n - d) * 4 > n * 3) AS n_flagged,
          CAST(sum(n) AS BIGINT) AS tok_total,
          CAST(sum(n - d) AS BIGINT) AS tok_repeated,
          CAST(sum(n - d) AS DOUBLE) / sum(n) AS rep_share
        FROM t GROUP BY source ORDER BY source"""
  }

  /** Fixed-length sequence packing: concatenate the corpus (in stable
    * doc_id order) and cut it into 512-token training sequences; report
    * per sequence how many docs contribute, how many tokens each grain
    * holds, and how many docs sit entirely inside it. Prefix sums come
    * from [[tokenPrefixSums]] (shared with q81) so the packing scales
    * without a global single-partition sort; the doc→sequence fan-out
    * explodes only [first_seq, last_seq] index ranges, never token
    * text. All arithmetic is integral (token offsets, interval
    * intersections). */
  def q88SeqPack(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val SeqLen = 512L
    tokenPrefixSums(spark, sfDir)
      .withColumnRenamed("before", "start")
      .withColumn("end", $"start" + $"wc")
      .filter($"wc" > 0)
      .withColumn("seq",
        explode(sequence(expr(s"start div $SeqLen"), expr(s"(end - 1) div $SeqLen"))))
      .withColumn("contrib",
        least($"end", ($"seq" + 1) * SeqLen) - greatest($"start", $"seq" * SeqLen))
      .groupBy($"seq")
      .agg(count(lit(1)).as("n_docs"),
        sum($"contrib").as("n_tokens"),
        count(when($"start" >= $"seq" * SeqLen &&
          $"end" <= ($"seq" + 1) * SeqLen, 1)).as("n_whole_docs"))
      .orderBy($"seq")
  }

  def q88Sql: String = {
    val wc = s"CAST(${tokenCountSql("text")} AS BIGINT)"
    s"""WITH docs AS (
          SELECT doc_id, $wc AS wc FROM documents),
        pos AS (
          SELECT doc_id, wc,
            CAST(coalesce(sum(wc) OVER (ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
              AS start
          FROM docs),
        spans AS (
          SELECT doc_id, wc, start, "end",
            unnest(range(start // 512, ("end" - 1) // 512 + 1)) AS seq
          FROM (SELECT doc_id, wc, start, start + wc AS "end"
                FROM pos WHERE wc > 0))
        SELECT seq, count(*) AS n_docs,
          CAST(sum(least("end", (seq + 1) * 512) - greatest(start, seq * 512))
            AS BIGINT) AS n_tokens,
          count(*) FILTER (WHERE start >= seq * 512 AND "end" <= (seq + 1) * 512)
            AS n_whole_docs
        FROM spans GROUP BY seq ORDER BY seq"""
  }

  /** Chunk window / stride (tokens) for overlapping chunking: 32-token
    * chunks every 24 tokens → 8 tokens of overlap, the
    * retrieval-indexing shape (context preserved across boundaries). */
  val ChunkLen = 32
  val ChunkStride = 24

  /** Overlapping document chunking: one row per (doc, chunk) with its
    * token interval — chunks start at every stride multiple below the
    * token count, the trailing chunk may be short. Interval arithmetic
    * only (like q88's packing): no token text is exploded or shuffled,
    * so the fan-out costs rows, not corpus bytes; a downstream embedder
    * slices the original text by the emitted [tok_start, tok_start +
    * tok_len) window. */
  def q93ChunkOverlap(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .select($"doc_id", tokenCount($"text").as("n"))
      .filter($"n" >= 1)
      .select($"doc_id", $"n",
        posexplode(sequence(lit(0), $"n" - 1, lit(ChunkStride)))
          .as(Seq("chunk_idx", "tok_start")))
      .select($"doc_id",
        $"chunk_idx".cast("long").as("chunk_idx"),
        $"tok_start".cast("long").as("tok_start"),
        least(lit(ChunkLen), $"n" - $"tok_start").cast("long").as("tok_len"))
      .orderBy($"doc_id", $"chunk_idx")
  }

  def q93Sql: String =
    s"""WITH d AS (
          SELECT doc_id, CAST(${tokenCountSql("text")} AS BIGINT) AS n
          FROM documents),
        c AS (
          SELECT doc_id, n, unnest(range(0, n, $ChunkStride)) AS tok_start
          FROM d WHERE n >= 1)
        SELECT doc_id, tok_start // $ChunkStride AS chunk_idx, tok_start,
          least($ChunkLen, n - tok_start) AS tok_len
        FROM c ORDER BY doc_id, chunk_idx"""

  /** Corpus bigram counts — the n-gram language-model / collocation
    * statistic (q16 is the unigram twin). Emitted via the WordShingles
    * UDTF (n=2), so the bigram stream never materializes per-doc arrays;
    * top-20 with a deterministic (count DESC, bigram ASC) tie-break.
    * Scale: one shuffle keyed by bigram with map-side partial counts;
    * the top-k is a TakeOrdered over the aggregated (much smaller)
    * key space. */
  def q94BigramCounts(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .select(tokens($"text").as("toks"))
      .select(graft.functions.Generators.wordShingles($"toks", 2))
      .groupBy($"shingle")
      .agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"shingle")
      .limit(20)
      .select($"shingle".as("bigram"), $"n")
  }

  def q94Sql: String =
    s"""SELECT bigram, count(*) AS n
        FROM (SELECT unnest(${Dedup.shinglesSqlN("text", 2)}) AS bigram
              FROM documents)
        GROUP BY bigram ORDER BY n DESC, bigram LIMIT 20"""

  /** Deterministic Bernoulli down-sampling to a per-source token budget
    * (the streaming-friendly complement of q70's ranked-prefix
    * selection: rate sampling needs NO sort and NO per-source state —
    * each row decides membership from its own hash, so the same
    * predicate runs identically in a batch scan or a stream filter).
    * rate_s = min(1, B / source_tokens); a doc survives iff its md5
    * fraction u < rate_s. The comparison is STRING order on fixed-width
    * lowercase hex — u's first 13 hex digits vs the threshold
    * ⌊rate·2^52⌋ rendered as 13-digit hex — so no float ever crosses
    * engines (the rate→threshold arithmetic is one exact division and
    * one exact power-of-two scale; rate ≥ 1 short-circuits to keep-all,
    * since its threshold would need a 14th hex digit).
    *
    * Scale: one window-sum keyed by source (or a broadcast of the tiny
    * per-source totals frame), then a stateless filter — the decision
    * is reproducible per row forever, the property that makes the
    * sample auditable and re-runnable on a growing corpus. */
  def q105BudgetSample(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val B = 3000.0
    val d = Tables.documents(spark, sfDir)
      .select($"source", tokenCount($"text").cast("long").as("wc"),
        substring(md5($"doc_id".cast("string")), 1, 13).as("u"))
      .withColumn("src_tokens",
        sum($"wc").over(Window.partitionBy($"source")))
      .withColumn("rate", lit(B) / $"src_tokens")
      .withColumn("keep", $"rate" >= 1.0 ||
        $"u" < lpad(lower(hex(floor($"rate" * lit(4503599627370496.0))
          .cast("long"))), 13, "0"))
    d.groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        sum($"wc").as("n_tokens"),
        round(least(lit(1.0), max($"rate")), 6).as("rate"),
        count(when($"keep", 1)).as("kept_docs"),
        coalesce(sum(when($"keep", $"wc")), lit(0L)).as("kept_tokens"))
      .orderBy($"source")
  }

  def q105Sql: String =
    s"""WITH d AS (
          SELECT source, CAST(${TF_tokenCountSql} AS BIGINT) AS wc,
            substr(md5(CAST(doc_id AS VARCHAR)), 1, 13) AS u
          FROM documents),
        s AS (
          SELECT *, sum(wc) OVER (PARTITION BY source) AS src_tokens,
            3000.0 / sum(wc) OVER (PARTITION BY source) AS rate
          FROM d),
        k AS (
          SELECT *, (rate >= 1.0 OR
            u < printf('%013x',
              CAST(floor(rate * 4503599627370496.0) AS BIGINT))) AS keep
          FROM s)
        SELECT source, count(*) AS n_docs,
          CAST(sum(wc) AS BIGINT) AS n_tokens,
          round(least(1.0, max(rate)), 6) AS rate,
          count(*) FILTER (WHERE keep) AS kept_docs,
          CAST(coalesce(sum(wc) FILTER (WHERE keep), 0) AS BIGINT)
            AS kept_tokens
        FROM k GROUP BY source ORDER BY source"""

  /** Character-level Shannon entropy per document — the degenerate-text
    * detector q18's surface ratios miss (a 2000-char run of "ababab…"
    * has perfect length/punct ratios but ~1 bit of entropy; clean prose
    * sits near 4–4.5 bits/char). Computed distributively from character
    * counts: H = log2(n) − Σ c·log2(c) / n, so the per-(doc, char)
    * partial aggregate does the heavy reduction and the per-doc final
    * pass touches ≤ |alphabet| rows per document.
    *
    * Scale: the explode fans each document into |text| rows, but both
    * groupBys are partial+final hash aggregates keyed by doc_id — the
    * fan-out never crosses the shuffle un-reduced (char counts collapse
    * it to ≤ |alphabet| rows/doc map-side). */
  def q110CharEntropy(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      // split-on-empty-pattern makes the char array in ONE pass —
      // transform(sequence(1,n), i -> substring(text,i,1)) re-enters
      // substring n times and allocates per call (measured ~2x slower
      // at sf0.1). Contract note: split('','') is [""], not [] — safe
      // because the corpus has no empty documents (spec-asserted for
      // q30's decode contract).
      .select($"doc_id", explode(split($"text", "")).as("ch"))
      .groupBy($"doc_id", $"ch")
      .agg(count(lit(1)).as("c"))
      .groupBy($"doc_id")
      .agg(sum($"c").as("n_chars"),
        round(log2(sum($"c")) - sum($"c" * log2($"c")) / sum($"c"), 6)
          .as("entropy"))
      .orderBy($"doc_id")
  }

  def q110Sql: String =
    """WITH chars AS (
         SELECT doc_id,
           unnest(list_transform(range(1, length(text) + 1),
             i -> substr(text, i, 1))) AS ch
         FROM documents),
       counts AS (
         SELECT doc_id, ch, count(*) AS c FROM chars GROUP BY doc_id, ch)
       SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_chars,
         round(log2(CAST(sum(c) AS DOUBLE))
           - sum(c * log2(CAST(c AS DOUBLE))) / sum(c), 6) AS entropy
       FROM counts GROUP BY doc_id ORDER BY doc_id"""

  val Q243TopN = 20

  /** q243 — corpus-LM surprise scoring (the CCNet-style language-model
    * quality filter with a unigram LM standing in for the trained
    * model): each document's mean per-token surprisal −(1/n)Σ ln p(t)
    * under the corpus's own unigram distribution, reported for the
    * [[Q243TopN]] most surprising documents. High scores flag
    * out-of-distribution text (boilerplate explosions, wrong-language
    * fragments, noise) — the curation signal that length/punct ratios
    * (q17) and char entropy (q165) both miss because they never look
    * at the corpus distribution.
    *
    * Determinism: p(t) = cnt/total is one exact-operand IEEE division,
    * per-token surprisal rounds to the 10⁻⁶ grid and scales to BIGINT
    * units immediately (the q238 ln discipline), and the per-doc mean
    * is integer floor division — ranking never touches an unrounded
    * float. Scale: token frequencies are one map-side-combined
    * aggregate; the score join shuffles by TOKEN (the join key with
    * combinable fan-in), the per-doc reduce shuffles by doc — both the
    * natural keys; the 1-row total broadcasts; top-N is
    * TakeOrderedAndProject. */
  def q243UnigramSurprise(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val toks = Tables.documents(spark, sfDir)
      .select($"doc_id", $"lang", explode(tokens($"text")).as("tok"))
      .filter($"tok" =!= "")
    val freq = toks.groupBy($"tok").agg(count(lit(1)).as("cnt"))
    val total = freq.agg(sum($"cnt").as("n_total"))
    toks.join(freq, "tok")
      .crossJoin(broadcast(total))
      .withColumn("surp_units",
        round(log($"n_total".cast("double") / $"cnt") * 1000000L).cast("long"))
      .groupBy($"doc_id", $"lang")
      .agg(count(lit(1)).as("n_toks"), sum($"surp_units").as("s"))
      .select($"doc_id", $"lang", $"n_toks",
        expr("s div n_toks").as("xent_units"))
      .orderBy($"xent_units".desc, $"doc_id")
      .limit(Q243TopN)
  }

  def q243Sql: String =
    s"""WITH t AS (
          SELECT doc_id, lang,
            unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
          FROM documents),
        tt AS (SELECT * FROM t WHERE tok <> ''),
        f AS (SELECT tok, count(*) AS cnt FROM tt GROUP BY 1),
        n AS (SELECT sum(cnt) AS n_total FROM f),
        s AS (
          SELECT doc_id, lang,
            CAST(round(ln(CAST(n_total AS DOUBLE) / cnt) * 1000000)
              AS BIGINT) AS su
          FROM tt JOIN f USING (tok) CROSS JOIN n),
        d AS (
          SELECT doc_id, lang, count(*) AS n_toks, sum(su) AS s
          FROM s GROUP BY 1, 2)
        SELECT doc_id, lang, CAST(n_toks AS BIGINT) AS n_toks,
          CAST(s // n_toks AS BIGINT) AS xent_units
        FROM d ORDER BY xent_units DESC, doc_id LIMIT $Q243TopN"""

  val Q244Draws = 200L

  /** q244 — token-proportional SYSTEMATIC resample (with replacement):
    * [[Q244Draws]] evenly spaced positions along the cumulative token
    * axis, each draw landing on the document whose token interval
    * contains it — the zero-variance-stratification form of weighted
    * sampling-with-replacement that epoch-mixing pipelines use to
    * re-draw a corpus at length-proportional rates (its q238 sibling
    * samples WITHOUT replacement). Every quantity is integer: draw j
    * sits at floor((2j+1)·W / 2K), and inverting the floor turns
    * per-doc draw counts into CLOSED-FORM odd-integer interval
    * counting — n_draws(doc) = #{odd m : A ≤ m·W < B} with
    * A = 2K·before, B = 2K·(before+wc) — so the assignment is a PURE
    * PROJECTION over the prefix-sum frame: no draw join exists at all,
    * and determinism is unconditional (no ln, no rounding, no RNG).
    *
    * Scale: the only non-map work is [[tokenPrefixSums]]' two-level
    * distributed prefix sum (bucket sums → ~8k-row offset frame →
    * within-bucket windows); the draw arithmetic adds zero shuffles.
    * At 100 TB the same projection prices ANY draw count K — sampling
    * 10⁹ positions costs the same plan as 200. */
  def q244SystematicResample(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val pf = tokenPrefixSums(spark, sfDir).filter($"wc" > 0)
    val totals = pf.agg(max($"before" + $"wc").as("w_total"))
    pf.crossJoin(broadcast(totals))
      .withColumn("a", lit(2L * Q244Draws) * $"before")
      .withColumn("b", lit(2L * Q244Draws) * ($"before" + $"wc"))
      // smallest m with m·W ≥ a is ceil(a/W); largest with m·W < b is
      // ceil(b/W) − 1. Ceils via (x + W − 1) div W: operands stay
      // non-negative, where truncating (Spark div) and flooring
      // (DuckDB //) integer division agree. Odd-count via
      // odd≤x = (x+1) div 2.
      .withColumn("lo", expr("(a + w_total - 1) div w_total"))
      .withColumn("hi", expr("(b + w_total - 1) div w_total - 1"))
      .withColumn("n_draws",
        greatest(lit(0L), expr("(hi + 1) div 2 - lo div 2")))
      .filter($"n_draws" > 0)
      .select($"doc_id", $"wc", $"n_draws")
      .orderBy($"doc_id")
  }

  /** Oracle takes the direct route: materialize the K draw positions
    * (a 200-row range), prefix-sum via a window, and interval-join —
    * the closed form must agree with the brute-force assignment. */
  def q244Sql: String =
    s"""WITH pf AS (
          SELECT doc_id,
            CAST(${graft.functions.TextFunctions.tokenCountSql("text")}
              AS BIGINT) AS wc,
            COALESCE(CAST(sum(${graft.functions.TextFunctions.tokenCountSql("text")})
              OVER (ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              AS BIGINT), 0) AS before
          FROM documents),
        pfnz AS (SELECT * FROM pf WHERE wc > 0),
        w AS (SELECT max(before + wc) AS w_total FROM pfnz),
        draws AS (
          SELECT CAST((2 * j + 1) * w_total // (2 * $Q244Draws) AS BIGINT) AS p
          FROM (SELECT unnest(range(0, $Q244Draws)) AS j) CROSS JOIN w),
        hit AS (
          SELECT pfnz.doc_id, pfnz.wc, count(*) AS n_draws
          FROM draws JOIN pfnz
            ON draws.p >= pfnz.before AND draws.p < pfnz.before + pfnz.wc
          GROUP BY 1, 2)
        SELECT doc_id, wc, CAST(n_draws AS BIGINT) AS n_draws
        FROM hit ORDER BY doc_id"""

  /** q264 token-budget multiplier and epoch cap for the data recipe:
    * the run trains on 2× the corpus's natural tokens, and no source
    * may repeat more than 4 epochs (the empirical degradation knee for
    * repeated LLM pretraining data). */
  val RecipeBudgetX = 2L
  val RecipeMaxEpochs = 4L

  /** q264 — DATA-RECIPE PLANNING (temperature-scaled mixing with epoch
    * caps): given a token budget of [[RecipeBudgetX]]× the corpus and
    * per-source natural token counts, assign each source a target share
    * ∝ √tokens (α = 1/2 temperature scaling — upsamples small sources
    * relative to proportional mixing without flattening to uniform),
    * then realize the target as REPEAT EPOCHS capped at
    * [[RecipeMaxEpochs]]: epochs = ceil(target/natural) clamped, the
    * contribution = min(target, epochs·natural), and whatever the cap
    * forfeits is reported as the deficit — the number the recipe owner
    * rebalances against. This is the planning pass a pretraining run
    * executes before any sampling happens; q105/q244 are the samplers
    * that then realize a share.
    *
    * Integer end to end: weights are isqrt(tokens) (floor of the IEEE
    * sqrt — correctly rounded by the standard, and a double's error at
    * these magnitudes cannot cross an integer boundary, so both
    * engines floor identically); shares are w·B div Σw. One corpus
    * scan (token counts per source), one 20-row planning projection. */
  def q264DataRecipe(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val src = Tables.documents(spark, sfDir)
      .select($"source", tokenCount($"text").cast("long").as("wc"))
      .groupBy($"source")
      .agg(sum($"wc").as("t_tokens"))
      .withColumn("w", expr("CAST(floor(sqrt(t_tokens)) AS BIGINT)"))
    val tot = src.agg(sum($"t_tokens").as("t_all"), sum($"w").as("w_all"))
    src.crossJoin(broadcast(tot))
      .withColumn("desired",
        expr(s"$RecipeBudgetX * t_all * w div w_all"))
      .withColumn("epochs",
        expr(s"least($RecipeMaxEpochs, (desired + t_tokens - 1) div t_tokens)"))
      .withColumn("contributed", expr("least(desired, epochs * t_tokens)"))
      .withColumn("deficit", $"desired" - $"contributed")
      .select($"source", $"t_tokens", $"w", $"desired", $"epochs",
        $"contributed", $"deficit")
      .orderBy($"source")
  }

  def q264Sql: String = {
    val wc = tokenCountSql("text")
    s"""WITH src AS (
          SELECT source, CAST(sum($wc) AS BIGINT) AS t_tokens
          FROM documents GROUP BY source),
        w AS (SELECT source, t_tokens,
            CAST(floor(sqrt(t_tokens)) AS BIGINT) AS w FROM src),
        tot AS (SELECT CAST(sum(t_tokens) AS BIGINT) AS t_all,
            CAST(sum(w) AS BIGINT) AS w_all FROM w),
        plan AS (
          SELECT source, t_tokens, w,
            $RecipeBudgetX * t_all * w // w_all AS desired
          FROM w CROSS JOIN tot),
        e AS (
          SELECT source, t_tokens, w, desired,
            least($RecipeMaxEpochs, (desired + t_tokens - 1) // t_tokens)
              AS epochs
          FROM plan)
        SELECT source, t_tokens, w, desired, epochs,
          least(desired, epochs * t_tokens) AS contributed,
          desired - least(desired, epochs * t_tokens) AS deficit
        FROM e ORDER BY source"""
  }

  /** q280 — SHARD PROVENANCE MANIFEST: the lineage artifact a training
    * run records next to q81's packed shards — per (shard, source) the
    * document and token contribution, plus a per-shard content
    * checksum (md5 of the ordered member doc_ids) that lets any later
    * audit prove a shard on disk is exactly the shard the manifest
    * describes (ablations, takedown compliance, repro claims all key
    * on this). Shard assignment is identical to q81 (prefix tokens
    * BEFORE the doc, 5000-token budget, via [[tokenPrefixSums]]).
    *
    * Scale: the two-level prefix sum is q81's; the checksum aggregate
    * collects only a SHARD's worth of ids (a few dozen — bounded by
    * budget/min-doc-tokens, never corpus-scale); the source join is
    * one doc-keyed shuffle. */
  def q280ShardManifest(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // materialized ONCE: both the checksum branch and the per-source
    // aggregate consume `assigned`, and a lazy plan would re-run the
    // whole two-level prefix-sum pipeline (tokenize + bucket windows +
    // source join) per consumer — the q251/Relational26 discipline
    val assigned = tokenPrefixSums(spark, sfDir)
      .withColumn("shard", expr(s"before div $ShardBudget"))
      .join(Tables.documents(spark, sfDir).select($"doc_id", $"source"),
        "doc_id")
      .localCheckpoint()
    val checksums = assigned.groupBy($"shard")
      .agg(md5(concat_ws(",",
        expr("transform(array_sort(collect_list(doc_id)), x -> CAST(x AS STRING))")))
        .as("shard_md5"))
    assigned.groupBy($"shard", $"source")
      .agg(count(lit(1)).as("n_docs"), sum($"wc").as("n_tokens"))
      .join(checksums, "shard")
      .select($"shard", $"source", $"n_docs", $"n_tokens", $"shard_md5")
      .orderBy($"shard", $"source")
  }

  def q280Sql: String =
    s"""WITH docs AS (
          SELECT doc_id, CAST(${tokenCountSql("text")} AS BIGINT) AS wc, source
          FROM documents),
        pos AS (
          SELECT doc_id, wc, source,
            CAST(coalesce(sum(wc) OVER (ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
              AS before
          FROM docs),
        a AS (SELECT doc_id, wc, source, before // $ShardBudget AS shard FROM pos),
        ck AS (
          SELECT shard,
            md5(string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id))
              AS shard_md5
          FROM a GROUP BY shard)
        SELECT a.shard, source, CAST(count(*) AS BIGINT) AS n_docs,
          CAST(sum(wc) AS BIGINT) AS n_tokens, ck.shard_md5
        FROM a JOIN ck ON ck.shard = a.shard
        GROUP BY a.shard, source, ck.shard_md5
        ORDER BY a.shard, source"""

  /** q282 vocabulary size for the coverage audit. */
  val VocabK = 512

  /** q282 — VOCABULARY COVERAGE / OOV AUDIT: freeze the top-[[VocabK]]
    * corpus tokens (count desc, token asc — fully deterministic) as
    * the candidate vocabulary and measure, per source, how much of its
    * token stream that vocabulary covers — the out-of-vocabulary rate
    * that decides whether a tokenizer trained on the aggregate serves
    * every source (a source with high OOV gets fragmented into bytes
    * and silently costs more tokens per word; cross-read with q273's
    * fertility). Integer permille, no float gates.
    *
    * Scale: one token-keyed count builds the candidate table; the
    * vocab is K rows and BROADCASTS to the coverage join; per-source
    * totals are map-side combinable. */
  def q282VocabCoverage(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // tokenize each doc ONCE: both the vocab aggregate and the coverage
    // join consume the token stream, and a lazy plan would re-scan and
    // re-regex the whole corpus per consumer. The checkpoint holds the
    // PER-DOC token arrays (corpus-sized, not exploded); the two
    // explodes replay from memory. At cluster scale this becomes a
    // persisted tokenized table.
    val docToks = Tables.documents(spark, sfDir)
      .select($"source", tokens($"text").as("ts"))
      .localCheckpoint()
    val toks = docToks.select($"source", explode($"ts").as("t"))
    val vocab = toks.groupBy($"t").agg(count(lit(1)).as("c"))
      .orderBy($"c".desc, $"t").limit(VocabK)
      .select($"t".as("v"))
    toks.join(broadcast(vocab), $"t" === $"v", "left_outer")
      .groupBy($"source")
      .agg(count(lit(1)).as("n_tokens"), count($"v").as("covered"))
      .withColumn("oov_permille",
        expr("(n_tokens - covered) * 1000 div n_tokens"))
      .orderBy($"source")
  }

  def q282Sql: String =
    s"""WITH toks AS (
          SELECT source, unnest(regexp_split_to_array(trim(text), '\\s+')) AS t
          FROM documents),
        vocab AS (
          SELECT t AS v FROM (
            SELECT t, count(*) AS c FROM toks GROUP BY t
            ORDER BY c DESC, t LIMIT $VocabK))
        SELECT source, CAST(count(*) AS BIGINT) AS n_tokens,
          CAST(count(v) AS BIGINT) AS covered,
          CAST((count(*) - count(v)) * 1000 // count(*) AS BIGINT)
            AS oov_permille
        FROM toks LEFT JOIN vocab ON t = v
        GROUP BY source ORDER BY source"""

  /** q283 takedown selector: deterministic ~1% of doc ids. */
  val TakedownMod = 97L
  val TakedownRes = 13L

  /** q283 — TAKEDOWN IMPACT PLAN over the shard manifest: given a
    * takedown set (deterministic stand-in: doc_id ≡ [[TakedownRes]]
    * mod [[TakedownMod]]), compute per shard what a compliance rewrite
    * must do — docs and tokens to remove, what remains, and the
    * post-removal membership checksum (the value q280's manifest will
    * hold AFTER the rewrite, computable BEFORE touching any shard
    * file). Shards with n_remove = 0 need no rewrite and keep their
    * q280 checksum — the plan proves it by reproducing it.
    *
    * Scale: q81's two-level prefix sums + one shard-keyed aggregate;
    * the checksum collects one shard's ids (budget-bounded). */
  def q283TakedownPlan(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    tokenPrefixSums(spark, sfDir)
      .withColumn("shard", expr(s"before div $ShardBudget"))
      .withColumn("gone", $"doc_id" % TakedownMod === TakedownRes)
      .groupBy($"shard")
      .agg(count(lit(1)).as("n_docs"),
        count(when($"gone", 1)).as("n_remove"),
        coalesce(sum(when($"gone", $"wc")), lit(0L)).as("tokens_removed"),
        // nullif: a shard whose EVERY doc is taken down must hash to
        // NULL (the oracle's string_agg over zero kept rows is NULL) —
        // bare concat_ws would yield md5('') and hash-diverge. No
        // non-empty kept list can concat to '' (doc ids never render
        // empty), so nullif touches exactly the all-gone case.
        md5(nullif(concat_ws(",",
          expr("transform(array_sort(collect_list(" +
            "CASE WHEN NOT gone THEN doc_id END)), x -> CAST(x AS STRING))")),
          lit(""))).as("kept_md5"))
      .orderBy($"shard")
  }

  def q283Sql: String =
    s"""WITH docs AS (
          SELECT doc_id, CAST(${tokenCountSql("text")} AS BIGINT) AS wc
          FROM documents),
        pos AS (
          SELECT doc_id, wc,
            CAST(coalesce(sum(wc) OVER (ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
              AS before
          FROM docs),
        a AS (
          SELECT doc_id, wc, before // $ShardBudget AS shard,
            doc_id % $TakedownMod = $TakedownRes AS gone
          FROM pos)
        SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
          CAST(count(*) FILTER (WHERE gone) AS BIGINT) AS n_remove,
          CAST(coalesce(sum(wc) FILTER (WHERE gone), 0) AS BIGINT)
            AS tokens_removed,
          md5(string_agg(CASE WHEN NOT gone THEN CAST(doc_id AS VARCHAR) END,
            ',' ORDER BY doc_id) FILTER (WHERE NOT gone)) AS kept_md5
        FROM a GROUP BY shard ORDER BY shard"""
}
