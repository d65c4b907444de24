package graft

import org.apache.spark.sql.DataFrame

import graft.engine.Loops

/** [[graft.engine.Loops.cut]] — the one conf-switched lineage cut every
  * iterative query routes through. Two contracts:
  *
  *  1. the conf actually flips the PHYSICAL mechanism (executor-local
  *     checkpoint blocks vs files under the SparkContext checkpoint
  *     dir — the cluster-durable posture);
  *  2. every iterative query in the library is result-IDENTICAL under
  *     both mechanisms (the cut is an execution concern, never a
  *     semantics one).
  */
class LoopsSpec extends SparkTestBase {
  import spark.implicits._

  private def checkpointedRdd(df: DataFrame) =
    df.queryExecution.analyzed.collect {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
    }.head

  /** Every query whose loop rides Loops.cut — keep in sync with the
    * `.transform(Loops.cut)` sites (PageRank Relational25, alternating-
    * star CC GraphQueries/Dedup.clustersFromPairs, greedy cover
    * Relational49, SSSP Relational56, WL refinement Relational64, MMR
    * Relational66, label-prop curation Relational70). */
  private val loopQueries = Seq(
    "q242_pagerank", "q302_connected_components", "q340_greedy_cover",
    "q360_sssp_minplus", "q383_wl_refinement", "q388_mmr_select",
    "q400_curation_pipeline", "q67_dedup_clusters", "q145_grouped_split")

  private def withCutMode[A](mode: Option[String])(body: => A): A = {
    mode match {
      case Some(m) => spark.conf.set(Loops.ConfKey, m)
      case None => spark.conf.unset(Loops.ConfKey)
    }
    try body finally spark.conf.unset(Loops.ConfKey)
  }

  test("the conf flips the physical cut: local blocks vs checkpoint-dir files") {
    val base = spark.range(0, 1000).select($"id", ($"id" % 7).as("m"))
    val local = withCutMode(None)(Loops.cut(base))
    val localRdd = checkpointedRdd(local)
    assert(localRdd.isCheckpointed,
      "local mode must actually checkpoint (not a no-op)")
    assert(localRdd.getCheckpointFile.isEmpty,
      "local mode must keep blocks executor-local — no checkpoint files")
    val reliable = withCutMode(Some("reliable"))(Loops.cut(base))
    val reliableRdd = checkpointedRdd(reliable)
    assert(reliableRdd.isCheckpointed)
    val file = reliableRdd.getCheckpointFile
    assert(file.isDefined,
      "reliable mode must write to the SparkContext checkpoint dir")
    val ckptDir = spark.sparkContext.getCheckpointDir.get
    assert(file.get.contains(ckptDir.stripPrefix("file:")) ||
      file.get.stripPrefix("file:").startsWith(ckptDir.stripPrefix("file:")),
      s"checkpoint file ${file.get} must live under $ckptDir")
    // both mechanisms preserve the rows
    assert(local.exceptAll(reliable).isEmpty &&
      reliable.exceptAll(local).isEmpty)
    assert(intercept[IllegalArgumentException] {
      withCutMode(Some("bogus"))(Loops.cut(base))
    }.getMessage.contains(Loops.ConfKey))
  }

  test("every loop query is result-identical under local and reliable cuts") {
    val problems = loopQueries.flatMap { name =>
      try {
        val a = withCutMode(None)(SparkEntry.queries(name)(spark, sf))
          .localCheckpoint()
        val b = withCutMode(Some("reliable"))(
          SparkEntry.queries(name)(spark, sf)).localCheckpoint()
        if (a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty) Nil
        else Seq(s"$name: results differ between local and reliable cuts")
      } catch {
        case e: Exception => Seq(s"$name: failed — ${e.getMessage}")
      }
    }
    assert(problems.isEmpty, problems.mkString("\n"))
  }
}
