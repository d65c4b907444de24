package graft

import org.apache.spark.sql.functions._

import graft.engine.{Exact, Relational9, Tables}

/** Fifteenth query wave: TPC-H Q5/Q8 join shapes, incremental view
  * maintenance, BPE pair statistics, and the anti-entropy bucket diff. */
class Relational9Spec extends SparkTestBase {
  import spark.implicits._

  test("q135 Q5 shape: the nation-agreement constraint actually binds") {
    val constrained = Relational9.q135LocalSupplierRevenue(spark, sf)
      .agg(sum($"counts")).as[Long].collect().head
    // relax ONLY the supplier-nation side: same joins, customer nation
    // drives the group — strictly more lineitems qualify
    val regionNations = Tables.nation(spark, sf)
      .join(Tables.region(spark, sf).filter($"r_name" === Relational9.Q135Region),
        $"n_regionkey" === $"r_regionkey")
      .select($"n_nationkey", $"n_name")
    val relaxed = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf)
        .filter($"o_orderdate" >= lit(Relational9.Q135YearStart).cast("timestamp") &&
          $"o_orderdate" < lit(Relational9.Q135YearEnd).cast("timestamp")),
        $"l_orderkey" === $"o_orderkey")
      .join(Tables.customer(spark, sf), $"o_custkey" === $"c_custkey")
      .join(broadcast(regionNations), $"c_nationkey" === $"n_nationkey")
      .count()
    assert(constrained > 0, "fixture must produce at least one qualifying row")
    assert(constrained < relaxed,
      s"supplier-nation agreement must prune rows ($constrained !< $relaxed)")
  }

  test("q136 IVM: merged partial states equal a direct recompute") {
    val merged = Relational9.q136IvmMerge(spark, sf)
      .select($"event_type", $"n_total", $"sum_value").collect().toSet
    val direct = Tables.events(spark, sf)
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_total"),
        Exact.decToDouble(sum($"value".cast("decimal(18,2)")), 2).as("sum_value"))
      .select($"event_type", $"n_total", $"sum_value").collect().toSet
    assert(merged == direct, "base ⊕ delta must equal full recompute")
    // the refresh is real on this fixture: every arm contributes
    val deltas = Relational9.q136IvmMerge(spark, sf)
      .select($"n_total", $"n_delta").as[(Long, Long)].collect()
    assert(deltas.forall { case (n, d) => d > 0 && d < n },
      "fixture cutoff must leave both a base and a delta arm per type")
  }

  test("q137 pair counts conserve total adjacent positions") {
    // the un-truncated pair count must equal sum(len-1) over docs;
    // checked via the same transform the query uses, minus the top-K
    val totalPairs = Tables.documents(spark, sf)
      .select(split($"text", "").as("cs"))
      .filter(size($"cs") >= 2)
      .select(explode(expr(
        "transform(slice(cs, 1, size(cs) - 1), (c, i) -> concat(c, element_at(cs, i + 2)))"))
        .as("pair"))
      .count()
    val expected = Tables.documents(spark, sf)
      .select(sum(length($"text") - 1)).as[Long].collect().head
    assert(totalPairs == expected,
      s"pair stream must cover every adjacent position ($totalPairs != $expected)")
    val top = Relational9.q137BpePairs(spark, sf).collect()
    assert(top.length == Relational9.BpeTopK)
    assert(top.forall(_.getAs[String]("pair").length == 2),
      "every emitted pair is exactly two characters")
    val counts = top.map(_.getAs[Long]("cnt"))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b },
      "top-K is ordered by descending count")
  }

  test("q138 market share: shares in [0,1] and revenue sums to the region total") {
    val rows = Relational9.q138MarketShare(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val s = r.getAs[Double]("mkt_share")
      assert(s >= 0.0 && s <= 1.0, s"share $s out of range")
    }
    // conservation: yearly denominators sum to one unconditional total
    val yearly = rows.map(_.getAs[Double]("revenue")).map(BigDecimal(_)).sum
    val regionNations = Tables.nation(spark, sf)
      .join(Tables.region(spark, sf).filter($"r_name" === Relational9.Q138Region),
        $"n_regionkey" === $"r_regionkey")
      .select($"n_nationkey")
    val total = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf), $"l_orderkey" === $"o_orderkey")
      .join(Tables.customer(spark, sf), $"o_custkey" === $"c_custkey")
      .join(broadcast(regionNations), $"c_nationkey" === $"n_nationkey")
      .agg(Exact.decToDouble(
        sum(($"l_extendedprice" * (lit(1) - $"l_discount")).cast("decimal(18,4)")), 4))
      .as[Double].collect().head
    assert((yearly - BigDecimal(total)).abs < BigDecimal("0.0001"),
      s"yearly revenue $yearly must reassemble the region total $total")
  }

  test("q139 diff: mismatching buckets are exactly those holding lost rows") {
    val verdicts = Relational9.q139ChecksumDiff(spark, sf).collect()
      .map(r => r.getAs[Long]("bucket") -> r.getAs[Boolean]("is_match")).toMap
    val touched = Tables.events(spark, sf)
      .filter($"event_id" < Relational9.DiffLostBelow)
      .select(($"event_id" % Relational9.DiffBuckets).as("b"))
      .distinct().as[Long].collect().toSet
    verdicts.foreach { case (bucket, ok) =>
      assert(ok == !touched.contains(bucket),
        s"bucket $bucket: is_match=$ok but lost-row presence=${touched.contains(bucket)}")
    }
    assert(touched.nonEmpty && touched.size < verdicts.size,
      "fixture must mismatch some buckets and match others")
  }

  test("q140 partition filter prunes the scan to the requested week") {
    // mirror the query's write, keep the scratch dir alive to inspect
    // the lazy plan, and assert the filter lands as a PartitionFilter
    // (directory-level pruning) rather than a data Filter
    val dir = graft.engine.TempIo.createTempDir("graft-prune-spec-")
    // AQE wraps stages around the scan node; turn it off so the scan is
    // a plain leaf of executedPlan (inspection only — the query itself
    // runs under whatever the session default is)
    val aqeBefore = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      Tables.events(spark, sf)
        .withColumn("date", date_format($"ts", "yyyy-MM-dd"))
        .repartition($"date")
        .write.mode("overwrite").partitionBy("date").parquet(dir)
      val pruned = spark.read.parquet(dir)
        .filter($"date" >= lit(Relational9.PruneStart).cast("date") &&
          $"date" < lit(Relational9.PruneEnd).cast("date"))
        .groupBy($"date").agg(count(lit(1)).as("n"))
      pruned.collect()
      val scan = pruned.queryExecution.executedPlan.collectLeaves()
        .collectFirst {
          case f: org.apache.spark.sql.execution.FileSourceScanExec => f
        }.get
      assert(scan.partitionFilters.nonEmpty,
        "date bounds must prune at the directory listing")
      assert(scan.dataFilters.isEmpty,
        "no residual data filter should survive partition pruning")
      // one file per pruned day (the repartition-by-date write contract)
      assert(scan.metrics("numFiles").value == 7L,
        s"expected 7 of 30 daily files, read ${scan.metrics("numFiles").value}")
      // and the query's own output matches a direct recompute
      val viaQuery = Relational9.q140PartitionPruning(spark, sf)
        .select($"date", $"counts").collect().toSet
      val direct = Tables.events(spark, sf)
        .withColumn("date", date_format($"ts", "yyyy-MM-dd"))
        .filter($"date" >= Relational9.PruneStart && $"date" < Relational9.PruneEnd)
        .groupBy($"date").agg(count(lit(1)).as("counts"))
        .collect().toSet
      assert(viaQuery == direct, "pruned read must lose no rows")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqeBefore)
      graft.engine.TempIo.deleteRecursively(dir)
    }
  }

  test("q141 bins are equi-depth and their extents tile the value range") {
    val rows = Relational9.q141EquiDepthBins(spark, sf).collect()
    rows.groupBy(_.getAs[String]("event_type")).foreach { case (et, bins) =>
      assert(bins.length == Relational9.NtileBins, s"$et missing bins")
      val counts = bins.map(_.getAs[Long]("n"))
      assert(counts.max - counts.min <= 1,
        s"$et bin depths differ by >1: ${counts.mkString(",")}")
      // ntile front-loads the remainder rows onto the lowest bins
      assert(counts.sameElements(counts.sortBy(-_)),
        s"$et remainder must land on the first bins: ${counts.mkString(",")}")
      val ordered = bins.sortBy(_.getAs[Long]("bin"))
      ordered.sliding(2).foreach { case Array(a, b) =>
        assert(a.getAs[Long]("hi") <= b.getAs[Long]("lo"),
          s"$et bins overlap: ${a.getAs[Long]("hi")} > ${b.getAs[Long]("lo")}")
      }
    }
  }

  test("q142 gauge matches a driver-side sweep replay") {
    val got = Relational9.q142ConcurrencyGauge(spark, sf).collect()
      .map(r => (r.getAs[String]("day"),
        (r.getAs[Long]("peak_concurrent"), r.getAs[Long]("n_intervals")))).toMap
    val events = Tables.events(spark, sf)
      .select(date_format($"ts", "yyyy-MM-dd").as("day"),
        unix_micros($"ts").as("t")).as[(String, Long)].collect()
    val expected = events.groupBy(_._1).map { case (day, evs) =>
      val pts = evs.flatMap { case (_, t) =>
        Seq((t, 1L), (t + Relational9.ActiveWindowUs, -1L)) }
        .sortBy(identity)
      val loads = pts.scanLeft(0L) { case (acc, (_, d)) => acc + d }.tail
      day -> (loads.max, evs.length.toLong)
    }
    assert(got == expected, "distributed sweep must equal the sequential replay")
    assert(got.values.exists(_._1 > 1),
      "fixture must actually overlap somewhere or the gauge proves nothing")
  }

  test("q143 merge round: the winner is fully consumed and the stream shrinks") {
    val winner = Relational9.q137BpePairs(spark, sf)
      .orderBy($"cnt".desc, $"pair").limit(1)
      .select($"pair", $"cnt").as[(String, Long)].collect().head
    val round2 = Relational9.q143BpeMergeRound(spark, sf).collect()
    assert(round2.length == Relational9.BpeTopK)
    // plain replace leaves no literal occurrence of the winner, and no
    // new one can form (the merge symbol sits between its halves)
    assert(!round2.exists(_.getAs[String]("pair") == winner._1),
      s"winner '${winner._1}' must be absent from the round-2 stream")
    // merged pairs are visible in the full round-2 stream (merge-site
    // counts are ~winner-sized, so they need not reach the top-K)
    val mergeSites = Tables.documents(spark, sf)
      .select(replace($"text", lit(winner._1), lit(Relational9.BpeMergeSymbol))
        .as("text"))
      .filter($"text".contains(Relational9.BpeMergeSymbol))
      .count()
    assert(mergeSites > 0, "the winner must actually occur somewhere to merge")
    // each merge removes the winner's pair and shortens the stream, so
    // no round-2 count can exceed round 1's winning count
    assert(round2.forall(_.getAs[Long]("cnt") <= winner._2),
      "no round-2 pair can out-count round 1's winner")
  }
}
