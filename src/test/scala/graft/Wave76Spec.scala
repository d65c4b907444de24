package graft

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

import graft.engine.{Relational57, Tables, TempIo}

/** Wave 76 (q361–q362): DataSourceV2 read pushdown and the streaming
  * grid histogram. Teeth: the V2 scan Catalyst actually plans carries
  * the pushed predicate and the pruned column set (asserted from the
  * executed plan, not trust), unsupported predicates stay residual
  * yet results remain exact, and the streamed quantiles equal a batch
  * recompute on the same grid. */
class Wave76Spec extends SparkTestBase {

  private def scanDescriptions(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b.scan.description()
    }

  test("q361 scan carries pushed filters and pruned columns") {
    import spark.implicits._
    val out = TempIo.createTempDir("graft-w76-")
    try {
      Tables.lineitem(spark, sf)
        .select($"l_orderkey".as("ok"), $"l_partkey".as("pk"),
          $"l_returnflag".as("flag"),
          ($"l_quantity".cast("decimal(18,2)") * 100).cast("long").as("qc"))
        .write.format("graftsink").mode("append")
        .option("path", out).save()
      val df = spark.read.format("graftsink").load(out)
        .filter($"flag" === "R" && $"qc" >= 2500L)
        .select($"pk", $"qc")
      val descs = scanDescriptions(df)
      assert(descs.size === 1)
      val d = descs.head
      assert(d.contains("GraftScan"))
      // the predicate reached the connector...
      assert(d.contains("EqualTo(flag,R)"), d)
      assert(d.contains("GreaterThanOrEqual(qc,2500)"), d)
      // ...and the scan is pruned to the OUTPUT columns only: because
      // both predicates were fully pushed (never re-evaluated by
      // Spark), even the filter-only column `flag` drops out of the
      // read schema — the strongest pruning the handshake permits.
      val cols = d.split("readColumns=\\[")(1).takeWhile(_ != ']')
      assert(cols.split(", ").toSet === Set("pk", "qc"))
      assert(!cols.contains("ok"))
      // end-to-end equivalence vs computing directly on the source frame
      val direct = Tables.lineitem(spark, sf)
        .filter($"l_returnflag" === "R" &&
          ($"l_quantity".cast("decimal(18,2)") * 100).cast("long") >= 2500L)
        .select($"l_partkey",
          ($"l_quantity".cast("decimal(18,2)") * 100).cast("long"))
        .as[(Long, Long)].collect().sorted.toSeq
      val got = df.as[(Long, Long)].collect().sorted.toSeq
      assert(got === direct)
    } finally TempIo.deleteRecursively(out)
  }

  test("unsupported predicates stay residual and results remain exact") {
    import spark.implicits._
    val out = TempIo.createTempDir("graft-w76b-")
    try {
      Tables.part(spark, sf)
        .select($"p_partkey".as("pk"), $"p_name".as("name"),
          $"p_size".cast("long").as("sz"))
        .write.format("graftsink").mode("append")
        .option("path", out).save()
      // endsWith is NOT in the connector's pushable set
      val df = spark.read.format("graftsink").load(out)
        .filter($"name".endsWith("e") && $"sz" >= 10L)
        .select($"pk")
      val d = scanDescriptions(df).head
      assert(d.contains("GreaterThanOrEqual(sz,10)"), d)
      assert(!d.split("pushedFilters=\\[")(1).takeWhile(_ != ']')
        .contains("EndsWith"), d)
      val direct = Tables.part(spark, sf)
        .filter($"p_name".endsWith("e") && $"p_size" >= 10)
        .select($"p_partkey").as[Long].collect().sorted.toSeq
      assert(df.as[Long].collect().sorted.toSeq === direct)
    } finally TempIo.deleteRecursively(out)
  }

  test("q362 streamed quantiles equal a batch recompute on the grid") {
    import spark.implicits._
    val got = graft.streaming.Streaming.q362StreamHistogram(spark, sf)
      .collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("p50_bucket"),
          r.getAs[Long]("p99_bucket"), r.getAs[Long]("max_bucket"))).toMap
    val vals = Tables.events(spark, sf)
      .select($"event_type",
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) div 2500"))
      .as[(String, Long)].collect()
    val sim = vals.groupBy(_._1).map { case (t, vs) =>
      val bs = vs.map(_._2).sorted
      val n = bs.length.toLong
      def atRank(r: Long): Long = bs((r - 1).toInt)
      t -> ((n, atRank((n + 1) / 2), atRank((99 * n + 99) / 100), bs.max))
    }
    assert(got === sim)
    for ((t, (_, p50, p99, mx)) <- got) {
      assert(p50 <= p99, s"$t p50<=p99")
      assert(p99 <= mx, s"$t p99<=max")
    }
  }
}
