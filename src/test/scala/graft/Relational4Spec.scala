package graft

import org.apache.spark.sql.functions._

import graft.engine.{Dedup, Relational4, Similarity, Tables, TextQueries}

/** Fourth query wave: profiling, grouping sets, order statistics, map
  * columns, edit-distance dedup, split assignment, shard packing,
  * quantization, redaction. */
class Relational4Spec extends SparkTestBase {
  import spark.implicits._

  test("q33 HLL estimate stays within 3x its configured rsd of the exact count") {
    val rows = graft.engine.Relational2.q33ApproxDistinct(spark, sf).collect()
    val exact = Tables.lineitem(spark, sf)
      .groupBy($"l_returnflag")
      .agg(countDistinct($"l_partkey").as("n")).collect()
      .map(r => r.getAs[String]("l_returnflag") -> r.getAs[Long]("n")).toMap
    assert(rows.map(_.getAs[String]("l_returnflag")).toSet == exact.keySet)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("within_bound"),
        s"group ${r.getAs[String]("l_returnflag")}: estimate out of 3x rsd")
      assert(r.getAs[Long]("n_exact") == exact(r.getAs[String]("l_returnflag")))
    }
  }

  test("q76 profile: one row per profiled column, zero nulls, sane distincts") {
    val rows = Relational4.q76Profile(spark, sf).collect()
    assert(rows.map(_.getAs[String]("col_name")).toSeq ==
      Seq("event_id", "event_type", "user_id", "value"))
    val total = Tables.events(spark, sf).count()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_nulls") == 0L)
      val d = r.getAs[Long]("n_distinct")
      assert(d >= 1L && d <= total)
    }
    val byName = rows.map(r => r.getAs[String]("col_name") -> r).toMap
    assert(byName("event_id").getAs[Long]("n_distinct") == total,
      "event_id is the primary key, so distinct == row count")
  }

  test("q77 grouping sets are exactly the two single-column marginals") {
    val rows = Relational4.q77GroupingSets(spark, sf).collect()
    // every row has exactly one side collapsed to the sentinel
    rows.foreach { r =>
      val rfAll = r.getAs[String]("rf") == "(all)"
      val lsAll = r.getAs[String]("ls") == "(all)"
      assert(rfAll ^ lsAll, s"one and only one side collapses: $r")
    }
    // each marginal's counts sum to the table size
    val total = Tables.lineitem(spark, sf).count()
    Seq("rf", "ls").foreach { side =>
      val marginal = rows.filter(_.getAs[String](side) != "(all)")
      assert(marginal.map(_.getAs[Long]("counts")).sum == total)
    }
  }

  test("q78 median lies within each group's [min,max]; mode bucket count is the max") {
    val got = Relational4.q78MedianMode(spark, sf).collect()
    val bounds = Tables.events(spark, sf).groupBy($"event_type")
      .agg(min($"value").as("lo"), max($"value").as("hi")).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Double]("lo"), r.getAs[Double]("hi"))).toMap
    got.foreach { r =>
      val (lo, hi) = bounds(r.getAs[String]("event_type"))
      val m = r.getAs[Double]("median_value")
      assert(m >= lo - 1e-9 && m <= hi + 1e-9)
      assert(r.getAs[Long]("mode_n") >= 1L)
    }
  }

  test("q79 edit distance is symmetric-safe (a<b), bounded by prefix length") {
    val rows = Dedup.q79EditDistance(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("doc_a") < r.getAs[Long]("doc_b"))
      val d = r.getAs[Int]("dist")
      assert(d >= 0 && d <= 40, "levenshtein over 40-char prefixes is <= 40")
    }
  }

  test("q80 split assignment is exhaustive, ~80/10/10, and deterministic") {
    val rows = TextQueries.q80SplitAssign(spark, sf).collect()
    val perSplit = rows.groupBy(_.getAs[String]("split"))
      .view.mapValues(_.map(_.getAs[Long]("n_docs")).sum).toMap
    val total = Tables.documents(spark, sf).count()
    assert(perSplit.values.sum == total, "every doc gets exactly one split")
    assert(perSplit("train") > perSplit.getOrElse("val", 0L))
    assert(perSplit("train") > perSplit.getOrElse("test", 0L))
    // determinism: re-running yields identical rows
    val again = TextQueries.q80SplitAssign(spark, sf).collect()
    assert(rows.map(_.toString).sorted.sameElements(again.map(_.toString).sorted))
  }

  test("q81 shard packing: shards contiguous from 0, doc ranges non-overlapping, tokens conserved") {
    val rows = TextQueries.q81ShardPack(spark, sf).collect()
    val shards = rows.map(_.getAs[Long]("shard"))
    assert(shards.toSeq == shards.indices.map(_.toLong),
      "shard ids are dense 0..n-1 (a doc lands in the shard its first token is in)")
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("last_doc") < b.getAs[Long]("first_doc"))
      case _ => ()
    }
    val totalTokens = rows.map(_.getAs[Long]("n_tokens")).sum
    val expected = Tables.documents(spark, sf)
      .select(graft.functions.TextFunctions.tokenCount($"text").cast("long"))
      .as[Long].collect().sum
    assert(totalTokens == expected, "packing must conserve tokens")
  }

  test("q82 map ops: per-type counts cover all rows; bounds within data domain") {
    val rows = Relational4.q82MapOps(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("counts")).sum ==
      Tables.events(spark, sf).count(),
      "every event's props has one key, so exploded rows == table rows")
    rows.foreach { r =>
      assert(r.getAs[String]("k") == "k")
      assert(r.getAs[Long]("min_v") <= r.getAs[Long]("max_v"))
    }
  }

  test("q82 corpus contract: every props payload is single-key integer {\"k\": n}") {
    // the q82 oracle hardcodes key 'k' and extracts an integer via a
    // terminator-anchored regexp; that is only equivalent to the Spark
    // MapType path while the corpus keeps this exact serialization —
    // enforce it so a generator change surfaces here, not as a silent
    // oracle divergence
    val offenders = Tables.events(spark, sf)
      .filter(!$"props".rlike("""^\{"k": -?\d+\}$"""))
      .count()
    assert(offenders == 0L,
      "props payloads outside {\"k\": <integer>} break the q82 oracle contract")
  }

  test("map explode handles dynamic keys, malformed JSON, and non-integer values") {
    // the oracle can only exercise the single-key '{"k": n}' serialization
    // the generator emits; the MapType surface itself must handle more —
    // proven here against hand-built payloads
    import org.apache.spark.sql.types.{LongType, MapType, StringType}
    val payloads = Seq(
      """{"a": 1, "b": 2}""", // dynamic keys
      """{"k": 7}""",         // the generated shape
      """not json at all""",  // malformed → from_json yields null map → no rows
      """{"k": 1.5}""").toDF("props") // non-long value → PERMISSIVE null map
    val exploded = payloads
      .select(explode(from_json($"props", MapType(StringType, LongType))).as(Seq("k", "v")))
      .filter($"v".isNotNull)
      .collect().map(r => r.getAs[String]("k") -> r.getAs[Long]("v")).toMap
    assert(exploded == Map("a" -> 1L, "b" -> 2L, "k" -> 7L),
      "dynamic keys survive, malformed and non-integer payloads drop cleanly")
  }

  test("q83 quantization buckets stay in [-127,127] and conserve vectors") {
    val rows = Similarity.q83Quantize(spark, sf).collect()
    rows.foreach { r =>
      val q = r.getAs[Long]("q0")
      assert(q >= -127 && q <= 127)
    }
    assert(rows.map(_.getAs[Long]("counts")).sum ==
      Tables.embeddings(spark, sf).count())
  }

  test("q87 repetition: repeated <= total per source; flags require >75% repeats") {
    val rows = TextQueries.q87Repetition(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("n_docs")).sum ==
      Tables.documents(spark, sf).count())
    rows.foreach { r =>
      val total = r.getAs[Long]("tok_total")
      val rep = r.getAs[Long]("tok_repeated")
      assert(rep >= 0L && rep <= total)
      assert(r.getAs[Long]("n_flagged") <= r.getAs[Long]("n_docs"))
      val share = r.getAs[Double]("rep_share")
      assert(share >= 0.0 && share <= 1.0)
    }
  }

  test("q88 sequence packing: every seq except the last holds exactly 512 tokens") {
    val rows = TextQueries.q88SeqPack(spark, sf).collect()
    val seqs = rows.map(_.getAs[Long]("seq"))
    assert(seqs.toSeq == seqs.indices.map(_.toLong), "dense seq ids from 0")
    rows.dropRight(1).foreach { r =>
      assert(r.getAs[Long]("n_tokens") == 512L,
        s"interior sequences are full: $r")
    }
    rows.foreach { r =>
      assert(r.getAs[Long]("n_whole_docs") <= r.getAs[Long]("n_docs"))
    }
    // token conservation: contributions sum to the corpus token count
    val total = rows.map(_.getAs[Long]("n_tokens")).sum
    val expected = Tables.documents(spark, sf)
      .select(graft.functions.TextFunctions.tokenCount($"text").cast("long"))
      .as[Long].collect().sum
    assert(total == expected)
  }

  test("q84 redaction masks every digit: templates contain no numerals") {
    val audit = TextQueries.q84Redact(spark, sf).collect()
    assert(audit.map(_.getAs[Long]("n_rows")).sum ==
      Tables.events(spark, sf).count())
    // independently redact and confirm nothing numeric survives
    val survivors = Tables.events(spark, sf)
      .select(regexp_replace($"props", "[0-9]", "#").as("red"))
      .filter($"red".rlike("[0-9]")).count()
    assert(survivors == 0L)
    assert(audit.map(_.getAs[Long]("n_masked")).sum > 0L,
      "props payloads contain digits, so masking must touch characters")
  }
}
