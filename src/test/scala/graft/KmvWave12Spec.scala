package graft

import org.apache.spark.sql.functions._

import graft.engine.{Formats, Relational8, Tables}

/** Twelfth query wave: KMV TypedImperativeAggregate, update-mode
  * streaming, and hidden file-metadata columns. */
class KmvWave12Spec extends SparkTestBase {
  import spark.implicits._

  test("q127 KMV estimate equals an exact min-k replay, at any parallelism") {
    val hashes = Tables.events(spark, sf)
      .select($"event_type",
        conv(substring(md5($"user_id".cast("string")), 1, 8), 16, 10)
          .cast("long").as("hv"))
      .distinct().as[(String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.sorted).toMap
    val expected = hashes.map { case (tpe, hs) =>
      tpe -> (if (hs.length < Relational8.KmvK) hs.length.toLong
              else (Relational8.KmvK - 1).toLong * 4294967296L /
                hs(Relational8.KmvK - 1))
    }
    val got = Relational8.q127KmvDistinct(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Long]("kmv_est")).toMap
    assert(got == expected, "min-k sketch must replay exactly")
    // order-independence: a different partitioning yields the same bits
    val hv = Tables.events(spark, sf)
      .select($"event_type",
        conv(substring(md5($"user_id".cast("string")), 1, 8), 16, 10)
          .cast("long").as("hv"))
    val reparted = hv.repartition(7, $"hv")
      .groupBy($"event_type")
      .agg(graft.functions.KmvAggregate.kmvDistinct($"hv", Relational8.KmvK)
        .as("kmv_est"))
      .as[(String, Long)].collect().toMap
    assert(reparted == expected, "merge order must not perturb the estimate")
  }

  test("q127 estimate lands near the exact count (KMV accuracy sanity)") {
    Relational8.q127KmvDistinct(spark, sf).collect().foreach { r =>
      val est = r.getAs[Long]("kmv_est")
      val exact = r.getAs[Long]("n_exact")
      // distinct hashes can collide 32-bit, so compare loosely: KMV with
      // k=32 has ~18% relative standard error; 3 sigma
      assert(math.abs(est - exact) <= math.max(3, exact * 0.55),
        s"KMV estimate $est implausibly far from exact $exact")
    }
  }

  test("q128 update log conserves rows and bounds emissions by chunk count") {
    val rows = graft.streaming.Streaming.q128UpdateMode(spark, sf).collect()
    val total = rows.map(_.getAs[Long]("final_counts")).sum
    assert(total == Tables.events(spark, sf).count(),
      "final update per group must carry the full count")
    rows.foreach { r =>
      val e = r.getAs[Long]("n_emissions")
      assert(e >= 1 && e <= 4, "each group is emitted 1..nChunks times")
    }
  }

  test("q128 at sf0.01: chunk boundaries genuinely re-emit groups") {
    // at sf0.001 nearly every (hour, type) group holds ~1 row, so no
    // group straddles a chunk boundary; the multi-emission property
    // needs the denser corpus (7 straddling groups at sf0.01)
    val rows = graft.streaming.Streaming
      .q128UpdateMode(spark, "/root/testdata/sf0.01").collect()
    assert(rows.exists(_.getAs[Long]("n_emissions") >= 2),
      "the chunked replay must actually update some group")
    assert(rows.forall(r => {
      val e = r.getAs[Long]("n_emissions")
      e >= 1 && e <= 4
    }))
  }

  test("graft_kmv_distinct is SQL-callable through GraftExtensions") {
    graft.GraftExtensions.install(spark)
    // 3 distinct hashes with k=8 -> fewer than k, estimate = exact size
    val r = spark.sql(
      """SELECT graft_kmv_distinct(h, 8) FROM
         (VALUES (CAST(10 AS BIGINT)), (20), (20), (30)) v(h)""")
      .as[Long].head()
    assert(r == 3L, "below k, KMV degenerates to the exact distinct count")
  }

  test("graft_l2_distance_sq and graft_bitmap_bits are SQL-callable through GraftExtensions") {
    graft.GraftExtensions.install(spark)
    val d = spark.sql(
      """SELECT graft_l2_distance_sq(array(CAST(1.0 AS DOUBLE), 2.0),
                                     array(CAST(3.0 AS DOUBLE), 4.0))""")
      .as[Double].head()
    assert(d == 8.0)
    val n = spark.sql(
      """SELECT aggregate(transform(bm, w -> CAST(bit_count(w) AS BIGINT)),
                          CAST(0 AS BIGINT), (a, v) -> a + v)
         FROM (SELECT graft_bitmap_bits(k, 128) AS bm FROM
           (VALUES (CAST(1 AS BIGINT)), (65), (65), (127)) v(k))""")
      .as[Long].head()
    assert(n == 3L, "the SQL bitmap must count 3 distinct keys")
  }

  test("q129 metadata audit matches the direct scan") {
    val r = Formats.q129FileMetadata(spark, sf).collect()
    assert(r.length == 1 && r.head.getAs[String]("file_name") == "events.parquet")
    val (n, lo, hi) = Tables.events(spark, sf)
      .agg(count(lit(1)), min($"event_id"), max($"event_id"))
      .as[(Long, Long, Long)].head()
    assert(r.head.getAs[Long]("counts") == n)
    assert(r.head.getAs[Long]("min_id") == lo)
    assert(r.head.getAs[Long]("max_id") == hi)
    assert(r.head.getAs[Boolean]("nonzero_size"))
  }

  test("bitmap popcount equals count(DISTINCT) per group, at any parallelism") {
    import graft.functions.BitmapAggregate._
    val ev = Tables.events(spark, sf).select($"event_type", $"user_id")
    val exact = ev.groupBy($"event_type")
      .agg(countDistinct($"user_id").as("n"))
      .collect().map(r => r.getString(0) -> r.getAs[Long]("n")).toMap
    for (parts <- Seq(1, 13)) {
      val got = ev.repartition(parts)
        .groupBy($"event_type")
        .agg(popCount(bitmapBits($"user_id", 16384)).as("n"))
        .collect().map(r => r.getString(0) -> r.getAs[Long]("n")).toMap
      assert(got == exact,
        s"bitmap must be exact and partitioning-independent at $parts parts")
    }
  }

  test("bitmap set algebra: |A∩B| + |A∪B| = |A| + |B|, and out-of-range fails loudly") {
    import graft.functions.BitmapAggregate._
    val r = graft.engine.Relational24.q236BitmapSetops(spark, sf).head()
    assert(r.getAs[Long]("n_both") + r.getAs[Long]("n_either") ==
      r.getAs[Long]("n_purchase") + r.getAs[Long]("n_error"),
      "inclusion-exclusion must hold exactly")
    val err = intercept[Exception] {
      Seq(99999L).toDF("k").agg(bitmapBits($"k", 64)).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(err).exists(_.contains("dense domain")),
      s"overflow must fail loudly, got: $err")
  }
}
