package graft

import org.apache.spark.sql.functions._

import graft.engine.{Dedup, Tables}

/** [[Dedup.exactTruthPairs600]] claims the AllPairs/PPJoin prefix
  * filter is RESULT-INVISIBLE: the prefix-blocked candidate set,
  * length-bound pruned and verified by exact intersection, must equal
  * the unfiltered brute-force shingle self-join at τ = 600‰. The
  * DuckDB oracle gates this end-to-end through q390/q393's outputs;
  * this spec pins the PAIR SET itself inside Spark, so a future edit
  * to the prefix length, length bound, or verification arithmetic
  * fails HERE by name with the differing pairs, not as a downstream
  * hash mismatch. */
class TruthPairsSpec extends SparkTestBase {
  import spark.implicits._

  test("prefix-filtered τ≥600‰ truth pairs equal the brute-force join") {
    val got = Dedup.exactTruthPairs600(spark, sf)
    // brute force, constructed independently of the helper's internals
    // (the q390 round-9 formulation): distinct 3-shingles, all pairs
    // sharing any shingle, integer Jaccard gate
    val sh = Tables.documents(spark, sf)
      .select($"doc_id", graft.functions.TextFunctions.tokens($"text").as("t"))
      .filter(size($"t") >= 3)
      .select($"doc_id", explode(expr(
        "transform(sequence(1, size(t) - 2), " +
          "i -> concat_ws(' ', slice(t, i, 3)))")).as("g"))
      .distinct()
    val sz = sh.groupBy($"doc_id").agg(count(lit(1)).as("s"))
    val brute = sh.as("x").join(sh.as("y"),
        $"x.g" === $"y.g" && $"x.doc_id" < $"y.doc_id")
      .groupBy($"x.doc_id".as("da"), $"y.doc_id".as("db"))
      .agg(count(lit(1)).as("i"))
      .join(sz.select($"doc_id".as("da"), $"s".as("sa")), Seq("da"))
      .join(sz.select($"doc_id".as("db"), $"s".as("sb")), Seq("db"))
      .filter(expr("(1000 * i) div (sa + sb - i) >= 600"))
      .select($"da", $"db")
    val missed = brute.exceptAll(got)
    val extra = got.exceptAll(brute)
    assert(missed.isEmpty,
      s"prefix filter LOST pairs (false negatives): ${missed.collect().toSeq}")
    assert(extra.isEmpty,
      s"verification PASSED non-pairs (false positives): ${extra.collect().toSeq}")
    // anti-vacuity: the fixture must actually contain near-dup pairs,
    // or the equality above proves nothing
    assert(got.count() > 0, "fixture has no τ≥600‰ pairs — test is vacuous")
  }
}
