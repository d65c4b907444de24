package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.engine.{Dedup, Relational5, Tables, TextQueries}
import graft.functions.{BloomFunctions, TextFunctions}

/** Fifth query wave: CDC upsert, bloom decontamination, Z-order layout,
  * overlapping chunking, bigram counts, distribution drift — plus the
  * SparkSessionExtensions function surface. */
class Relational5Spec extends SparkTestBase {
  import spark.implicits._

  test("q90 cdc upsert: max_by compaction equals the window formulation, covers every key") {
    val viaAgg = Relational5.q90CdcUpsert(spark, sf).collect()
    assert(viaAgg.map(_.getAs[Long]("n_users")).sum ==
      Tables.events(spark, sf).select($"user_id").distinct().count(),
      "compacted state has exactly one row per changelog key")
    // independent formulation: row_number window, latest-wins
    val w = Window.partitionBy($"user_id").orderBy($"ts".desc, $"event_id".desc)
    val viaWindow = Tables.events(spark, sf)
      .withColumn("rn", row_number().over(w)).filter($"rn" === 1)
      .groupBy($"event_type").agg(count(lit(1)).as("n_users"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    viaAgg.foreach { r =>
      assert(viaWindow(r.getAs[String]("event_type")) == r.getAs[Long]("n_users"))
    }
  }

  test("q91 bloom prefilter is a pass-through: result equals the bloom-free exact join") {
    val withBloom = Dedup.q91BloomDecontaminate(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val sh = Tables.documents(spark, sf)
      .select($"doc_id", TextFunctions.tokens($"text").as("toks"))
      .select($"doc_id", graft.functions.Generators.wordShingles($"toks", 8))
      .select($"doc_id", $"shingle").distinct()
    val exact = sh.filter($"doc_id" % 50 =!= 0)
      .join(sh.filter($"doc_id" % 50 === 0).select($"shingle", $"doc_id".as("eval_doc")), "shingle")
      .groupBy($"doc_id")
      .agg(countDistinct($"shingle").as("n_contaminated"),
        countDistinct($"eval_doc").as("n_eval_docs"))
      .orderBy($"doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(withBloom.sameElements(exact),
      "bloom false positives must die in the exact join; false negatives are impossible")
  }

  test("q91 bloom actually prunes: probe-side survivors are a small fraction") {
    val sh = Tables.documents(spark, sf)
      .select($"doc_id", TextFunctions.tokens($"text").as("toks"))
      .select($"doc_id", graft.functions.Generators.wordShingles($"toks", 8))
      .select($"doc_id", $"shingle").distinct()
    val evalSh = sh.filter($"doc_id" % 50 === 0)
    val bloom = BloomFunctions.buildBloom(evalSh, $"shingle", 100000L)
    val train = sh.filter($"doc_id" % 50 =!= 0)
    val total = train.count()
    val survivors = train
      .filter(BloomFunctions.bloomMightContain(bloom, xxhash64($"shingle"))).count()
    assert(survivors < total / 2,
      s"the bloom should prune most uncontaminated shingles ($survivors of $total survived)")
  }

  test("graft extensions register the bloom SQL functions") {
    // the injection list itself must be well-formed (the withExtensions
    // path applies exactly these registrations at session build)
    new GraftExtensions().apply(new org.apache.spark.sql.SparkSessionExtensions)
    GraftExtensions.install(spark)
    val row = spark.sql(
      """SELECT graft_bloom_might_contain(
           (SELECT graft_bloom_agg(xxhash64(s), 10) FROM (VALUES ('a'), ('b')) v(s)),
           xxhash64('a')) AS hit,
         graft_bloom_might_contain(
           (SELECT graft_bloom_agg(xxhash64(s), 10) FROM (VALUES ('a'), ('b')) v(s)),
           xxhash64('definitely-absent-key')) AS miss""").head()
    assert(row.getBoolean(0), "inserted key must hit")
    assert(!row.getBoolean(1), "a miss proves the filter is not saturated")
  }

  test("q92 z-order: files partition all rows; boxes are far tighter than the domain") {
    val rows = Relational5.q92ZorderLayout(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("file_id")).toSeq ==
      (0L until Relational5.ZFiles).toSeq)
    assert(rows.map(_.getAs[Long]("n_rows")).sum ==
      Tables.events(spark, sf).count())
    assert(rows.forall(_.getAs[Boolean]("one_file")),
      "each carve must land in exactly one physical parquet file")
    // z-order's promise: each file's bounding box covers a small
    // rectangle of the (d1, d2) domain, so min/max stats can prune on
    // EITHER dimension — check the mean box side is well under the
    // domain side (a single-column sort leaves the trailing dimension's
    // boxes at full width ~256)
    val meanD2Range = rows.map(r =>
      r.getAs[Long]("d2_max") - r.getAs[Long]("d2_min")).sum.toDouble / rows.length
    val meanD1Range = rows.map(r =>
      r.getAs[Long]("d1_max") - r.getAs[Long]("d1_min")).sum.toDouble / rows.length
    assert(meanD1Range < 128 && meanD2Range < 128,
      s"z-order boxes should be sub-half-domain on both dims (d1=$meanD1Range d2=$meanD2Range)")
  }

  test("q92 z-value interleaves correctly on known bit patterns") {
    val rows = Seq((0L, 0L), (255L, 0L), (0L, 255L), (255L, 255L), (1L, 2L))
      .toDF("d1", "d2")
      .select(Relational5.zValue($"d1", $"d2").as("z")).collect().map(_.getLong(0))
    // d1 takes odd bit positions, d2 even; (1, 2) → 0b0110 = 2 + 4
    assert(rows.toSeq == Seq(0L, 0xAAAAL, 0x5555L, 0xFFFFL, 6L))
  }

  test("z-value matches an independent bit model and is injective on sampled pairs") {
    def model(d1: Long, d2: Long): Long =
      (0 until Relational5.ZBits).map(j =>
        (((d1 >> j) & 1L) << (2 * j + 1)) | (((d2 >> j) & 1L) << (2 * j))).reduce(_ | _)
    val pairs = (0 until 500).map(i => ((i * 37L) % 256L, (i * 101L) % 256L))
    val rows = pairs.toDF("d1", "d2")
      .select(Relational5.zValue($"d1", $"d2").as("z")).collect().map(_.getLong(0))
    rows.zip(pairs).foreach { case (z, (a, b)) => assert(z == model(a, b)) }
    assert(rows.distinct.length == pairs.distinct.length,
      "interleaving distinct (d1, d2) pairs must give distinct z-values")
  }

  test("bloom law: zero false negatives over a seeded adversarial key set") {
    val keys = (0 until 2000).map(i => s"key-${(i * 2654435761L) % 100003}")
    val df = keys.toDF("k")
    val bloom = BloomFunctions.buildBloom(df, $"k", 4000L)
    val survivors = df
      .filter(BloomFunctions.bloomMightContain(bloom, xxhash64($"k"))).count()
    assert(survivors == df.count(),
      "every inserted key must pass its own filter — false negatives break the join contract")
  }

  test("q93 chunks tile each doc: stride-spaced starts, bounded lengths, full coverage") {
    val chunks = Relational5Spec.groupedChunks(
      TextQueries.q93ChunkOverlap(spark, sf).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))))
    val n = Tables.documents(spark, sf)
      .select($"doc_id", TextFunctions.tokenCount($"text").cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(chunks.keySet == n.keySet.filter(n(_) >= 1))
    chunks.foreach { case (doc, cs) =>
      val sorted = cs.sortBy(_._1)
      sorted.zipWithIndex.foreach { case ((idx, start, len), i) =>
        assert(idx == i && start == i.toLong * TextQueries.ChunkStride)
        assert(len >= 1 && len <= TextQueries.ChunkLen)
        assert(len == math.min(TextQueries.ChunkLen, n(doc) - start))
      }
      val (_, lastStart, lastLen) = sorted.last
      assert(lastStart + lastLen == n(doc), "chunks end exactly at the token count")
      assert(lastStart < n(doc), "no chunk starts at or past the end")
    }
  }

  test("q94 bigram top-20 is consistent with a direct recount of its own entries") {
    val top = TextQueries.q94BigramCounts(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    assert(top.length == 20)
    assert(top.map(_._2).toSeq == top.map(_._2).sortBy(-_).toSeq, "sorted by count desc")
    // recount independently, driver-side, with plain Scala string ops —
    // no shared code path with the UDTF under test (tiny at spec SF)
    val pairs = Tables.documents(spark, sf).select($"text").collect()
      .iterator.map(_.getString(0))
      .flatMap(_.trim.split("\\s+").toSeq.sliding(2).collect {
        case Seq(a, b) => s"$a $b"
      })
      .foldLeft(Map.empty[String, Long].withDefaultValue(0L)) {
        (m, bg) => m.updated(bg, m(bg) + 1L)
      }
    top.foreach { case (bg, cnt) =>
      assert(pairs(bg) == cnt, s"recount mismatch for '$bg'")
    }
  }

  test("q90/q95 are partitioning-independent: same rows under a different shuffle width") {
    // the Exact decimal recipe and integer cross-products exist to make
    // double aggregation order-independent — prove it by re-running under
    // a co-prime shuffle parallelism and comparing collected rows
    val conf = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(conf)
    val base90 = Relational5.q90CdcUpsert(spark, sf).collect().toSeq
    val base95 = Relational5.q95DistributionDrift(spark, sf).collect().toSeq
    try {
      spark.conf.set(conf, "7")
      assert(Relational5.q90CdcUpsert(spark, sf).collect().toSeq == base90)
      assert(Relational5.q95DistributionDrift(spark, sf).collect().toSeq == base95)
    } finally spark.conf.set(conf, prev)
  }

  test("q98 variant path extraction agrees with the q82 MapType path") {
    val viaVariant = Relational5.q98VariantOps(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val viaMap = graft.engine.Relational4.q82MapOps(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("counts"), r.getAs[Long]("sum_v"),
          r.getAs[Long]("min_v"), r.getAs[Long]("max_v"))).toMap
    assert(viaVariant == viaMap,
      "two independent semi-structured decoders must agree on this corpus")
  }

  test("variant surface handles dynamic shapes: missing keys and non-integer values") {
    val rows = Seq(
      """{"a": 1, "k": 7}""",
      """{"nope": 2}""",
      """{"k": 1.5}""").toDF("props")
      .select(try_variant_get(parse_json($"props"), "$.k", "bigint").as("k"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    // try_variant_get: present integer extracts; absent key → null;
    // 1.5 → bigint TRUNCATES to 1 (cast semantics) — unlike the q82
    // MapType path, which nulls the whole map on a non-long value. This
    // is why q98 needs the integer corpus contract: on fractional props
    // the two semi-structured decoders legitimately diverge.
    assert(rows.toSeq == Seq(Some(7L), None, Some(1L)))
  }

  test("q99 observed metrics equal a direct aggregation of the same pass") {
    val m = Relational5.q99ObserveMetrics(spark, sf).head()
    val direct = Tables.events(spark, sf).agg(
      count(lit(1)).as("n"),
      count(when($"value" > 100, 1)).as("hv"),
      graft.engine.Exact.sumExact($"value", 2).as("sv")).head()
    assert(m.getAs[Long]("n_rows") == direct.getAs[Long]("n"))
    assert(m.getAs[Long]("high_value") == direct.getAs[Long]("hv"))
    assert(m.getAs[Double]("sum_value") == direct.getAs[Double]("sv"))
  }

  test("q95 drift: halves partition the corpus; drift bounded by 1; TVD in [0, 1]") {
    val rows = Relational5.q95DistributionDrift(spark, sf).collect()
    val total = Tables.events(spark, sf).count()
    assert(rows.map(r => r.getAs[Long]("n_first") + r.getAs[Long]("n_second")).sum == total)
    val tvd = rows.map(_.getAs[Double]("drift")).sum / 2
    rows.foreach(r => assert(r.getAs[Double]("drift") >= 0 && r.getAs[Double]("drift") <= 1))
    assert(tvd >= 0 && tvd <= 1, s"total variation distance out of range: $tvd")
  }

  test("q131 snapshot diff conserves users and classifies 'absent' correctly") {
    val rows = Relational5.q131SnapshotDiff(spark, sf).collect()
    val nUsers = Tables.events(spark, sf).select($"user_id").distinct().count()
    assert(rows.map(_.getAs[Long]("n_users")).sum == nUsers,
      "every user appears in exactly one transition cell")
    // 'absent' rows = users whose FIRST event is after the midpoint
    val mid = Tables.events(spark, sf)
      .agg(expr("(min(unix_micros(ts)) + max(unix_micros(ts))) div 2"))
      .head().getLong(0)
    val born = Tables.events(spark, sf)
      .groupBy($"user_id").agg(min(unix_micros($"ts")).as("first_us"))
      .filter($"first_us" > mid).count()
    assert(rows.filter(_.getAs[String]("old_state") == "absent")
      .map(_.getAs[Long]("n_users")).sum == born,
      "'absent' cells are exactly the users born after the midpoint")
  }
}

object Relational5Spec {
  def groupedChunks(rows: Array[(Long, Long, Long, Long)])
      : Map[Long, Array[(Long, Long, Long)]] =
    rows.groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3, t._4))).toMap
}
