package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis / NLP-contract scalar functions.
  *
  * The reference's NLP surface is two pretrained Spark-NLP pipelines
  * (sentiment: consumer.scala:85,125-128; 6-label emotion:
  * consumer.scala:132-148) — black-box `text → label` column maps. This
  * environment is zero-egress (no model downloads), so the same contracts
  * are implemented as deterministic lexicon/arithmetic scorers, built
  * entirely from `org.apache.spark.sql.functions` Column expressions:
  * they stay inside whole-stage codegen (no UDF serialization boundary)
  * and are expressible in ANSI SQL for the DuckDB oracle.
  *
  * Cross-engine determinism rules used here:
  *  - token-occurrence counts are exact integer filters over the
  *    whitespace token array — identical split + equality in both
  *    engines, no float involved;
  *  - int/int divisions produce identical doubles in Spark and DuckDB
  *    given identical operands; results are rounded before comparison.
  */
object TextFunctions {

  /** TRUE token frequency of `word` in `c`: the whitespace token array
    * filtered by exact equality. (An earlier padded-replace formulation
    * counted only NON-OVERLAPPING " word " matches, so adjacent repeats
    * — "the the the the" — counted 2, not 4; 254/5000 docs at sf0.1
    * diverged from token frequency and 74 flipped the langId threshold.
    * Both engines shared the bias, so the oracle gate never saw it —
    * the contract is token frequency, and now the code is too.) */
  def tokenOccurrences(c: Column, word: String): Column =
    size(filter(tokens(c), t => t === word)).cast("int")

  /** Whitespace tokenizer (M3 contract, consumer.scala:135-137). */
  def tokens(c: Column): Column = split(trim(c), "\\s+")

  /** Token count over whitespace splits. */
  def tokenCount(c: Column): Column = size(tokens(c))

  private val PosWords = Seq("fast", "big", "value")
  private val NegWords = Seq("slow", "small", "dup")

  def positiveHits(c: Column): Column =
    PosWords.map(tokenOccurrences(c, _)).reduce(_ + _)

  def negativeHits(c: Column): Column =
    NegWords.map(tokenOccurrences(c, _)).reduce(_ + _)

  /** M1 contract: `sentiment(text)` → positive | negative | neutral. */
  def sentiment(c: Column): Column =
    when(positiveHits(c) > negativeHits(c), "positive")
      .when(negativeHits(c) > positiveHits(c), "negative")
      .otherwise("neutral")

  /** The fixed 6-label emotion codomain (wrangling.py:26-27). */
  val EmotionLabels = Seq("anger", "fear", "joy", "love", "sadness", "surprise")

  /** M2 contract: `emotion(text)` → one of the 6 labels, via a
    * deterministic arithmetic hash of length + marker-word counts. */
  def emotion(c: Column): Column = {
    val score = (length(c)
      + tokenOccurrences(c, "spark") * 3
      + tokenOccurrences(c, "join") * 5
      + tokenOccurrences(c, "data") * 7) % 6
    EmotionLabels.zipWithIndex.foldLeft(lit(null).cast("string")) {
      case (acc, (label, i)) => when(score === i, label).otherwise(acc)
    }
  }

  /** Language-ID heuristic (marker-token frequencies). Codomain:
    * en | de | fr | unk. On real corpora the markers would be per-language
    * stopword n-grams; the contract (text → code) is what matters. */
  def langId(c: Column): Column =
    when(tokenOccurrences(c, "the") >= lit(3), "en")
      .when(tokenOccurrences(c, "data") > tokenOccurrences(c, "value"), "de")
      .when(tokenOccurrences(c, "vector") > lit(0), "fr")
      .otherwise("unk")

  /** Quality score ∈ [0,1]: length component + stopword-ratio component +
    * average-word-length component — EXACT integer rational arithmetic,
    * half-up on the 10⁻⁶ grid. The former double formula + round(…, 6)
    * diverged from the oracle on exact-tie scores (Spark rounds the
    * double's exact binary expansion, DuckDB rounds in floats — found
    * by the ×10 carve, whose token scrambles produced tie-landing
    * stopword ratios the shipped fixtures never do). score =
    * [min(wc,100)·wc + 50·min(10·stop, wc) + 5·min(chars, 10·wc)]
    * / (200·wc); micro-units = half-up((10⁶·num)/(200·wc)) =
    * (10000·num + wc) div (2·wc), all in 64-bit integers (num ≤
    * 200·wc, so the numerator stays < 2⁵³ for any wc < 4·10⁹ — the
    * subtract-mod form keeps the final division an exact-multiple
    * divide, bit-exact in IEEE). The one-division /1e6 tail is the
    * same double op in both engines. */
  def qualityScore(c: Column): Column = {
    val wc    = tokenCount(c).cast("long")
    val stop  = (tokenOccurrences(c, "the") + tokenOccurrences(c, "a")).cast("long")
    val chars = length(replace(c, lit(" "), lit(""))).cast("long")
    val num = least(wc, lit(100L)) * wc +
      lit(50L) * least(lit(10L) * stop, wc) +
      lit(5L) * least(chars, lit(10L) * wc)
    val half = lit(10000L) * num + wc
    val den = wc * lit(2L)
    val micro = ((half - half % den) / den).cast("long")
    micro / lit(1000000.0)
  }

  /** Document fingerprint: md5 over whitespace-normalized lowercased text
    * — the exact-dedup key. */
  def fingerprint(c: Column): Column =
    md5(lower(trim(regexp_replace(c, "\\s+", " "))))

  // ---- SQL mirrors (DuckDB oracle fragments) -------------------------

  /** SQL for [[tokenOccurrences]] over column `col` — the same
    * filter-the-token-array formulation (true token frequency). */
  def occSql(col: String, word: String): String =
    s"CAST(len(list_filter(regexp_split_to_array(trim($col), '\\s+'), x -> x = '$word')) AS INT)"

  def posSql(col: String): String = PosWords.map(occSql(col, _)).mkString("(", " + ", ")")
  def negSql(col: String): String = NegWords.map(occSql(col, _)).mkString("(", " + ", ")")

  def sentimentSql(col: String): String =
    s"""CASE WHEN ${posSql(col)} > ${negSql(col)} THEN 'positive'
        WHEN ${negSql(col)} > ${posSql(col)} THEN 'negative'
        ELSE 'neutral' END"""

  def emotionSql(col: String): String = {
    val score = s"((length($col) + ${occSql(col, "spark")} * 3 + ${occSql(col, "join")} * 5 + ${occSql(col, "data")} * 7) % 6)"
    val arms = EmotionLabels.zipWithIndex
      .map { case (l, i) => s"WHEN $score = $i THEN '$l'" }.mkString(" ")
    s"CASE $arms END"
  }

  def langIdSql(col: String): String =
    s"""CASE WHEN ${occSql(col, "the")} >= 3 THEN 'en'
        WHEN ${occSql(col, "data")} > ${occSql(col, "value")} THEN 'de'
        WHEN ${occSql(col, "vector")} > 0 THEN 'fr'
        ELSE 'unk' END"""

  def tokenCountSql(col: String): String =
    s"len(regexp_split_to_array(trim($col), '\\s+'))"

  /** [[qualityScore]]'s exact-integer twin: BIGINT `//` is a floor on
    * the positive operands, so both engines compute the identical
    * micro-unit integer, then the identical single /1e6 double. */
  def qualityScoreSql(col: String): String = {
    val wc   = s"CAST(${tokenCountSql(col)} AS BIGINT)"
    val stop = s"CAST(${occSql(col, "the")} + ${occSql(col, "a")} AS BIGINT)"
    val chars = s"CAST(length(replace($col, ' ', '')) AS BIGINT)"
    val num = s"(least($wc, 100) * $wc + 50 * least(10 * $stop, $wc)" +
      s" + 5 * least($chars, 10 * $wc))"
    s"(((10000 * $num + $wc) // (2 * $wc)) / 1000000.0)"
  }

  def fingerprintSql(col: String): String =
    s"md5(lower(trim(regexp_replace($col, '\\s+', ' ', 'g'))))"
}
