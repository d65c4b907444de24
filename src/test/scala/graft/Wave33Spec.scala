package graft

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

import graft.engine.{Dedup, Relational25, Similarity, TextQueries}

/** Wave 33 (q238–q242): weighted sampling, containment search, RANGE
  * frames, streaming ANN serving, iterative PageRank. Value-level
  * equivalences the DuckDB oracle can't express (determinism across
  * runs, internal invariants) plus the scale-critical plan shapes. */
class Wave33Spec extends SparkTestBase {

  test("q238 draws exactly K docs, deterministically, via map-side top-K") {
    val a = Relational25.q238WeightedSample(spark, sf)
    assert(a.count() === Relational25.Q238SampleK)
    val b = Relational25.q238WeightedSample(spark, sf)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "re-running the sampler must reproduce the identical sample")
    val p = a.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(p.contains("TakeOrderedAndProject"),
      "the K-smallest-priorities selection must be a map-side partial " +
        "top-K, never a global sort:\n" + p)
  }

  test("q238 sampling is length-biased: sampled docs are longer on average") {
    import spark.implicits._
    val sampled = Relational25.q238WeightedSample(spark, sf)
      .agg(avg($"n_chars")).head.getDouble(0)
    val corpus = graft.engine.Tables.documents(spark, sf)
      .filter($"n_chars" > 0).agg(avg($"n_chars")).head.getDouble(0)
    assert(sampled > corpus,
      s"length-weighted sample mean $sampled must exceed corpus mean $corpus")
  }

  test("q239 finds every probe's own document (self-containment)") {
    import spark.implicits._
    val res = Dedup.q239ContainmentJoin(spark, sf)
    val probesWithPassage = res.select($"probe_id").distinct().count()
    val selfHits = res.filter($"probe_id" === $"doc_id").count()
    assert(probesWithPassage > 0, "fixture must yield at least one probe")
    assert(selfHits === probesWithPassage,
      "each probe's source document contains its own passage by definition")
    assert(res.filter($"qsize" > Dedup.Q239PassageLen).count() === 0)
  }

  test("q240 RANGE frame never plans an unpartitioned window and counts self") {
    import spark.implicits._
    val df = Relational25.q240RangeFrame(spark, sf)
    val bad = df.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window
        if w.partitionSpec.isEmpty => w
    }
    assert(bad.isEmpty, s"q240 must key its window by user_id: $bad")
    assert(df.filter($"trailing_n" < 1).count() === 0,
      "a RANGE frame ending at CURRENT ROW always includes the row itself")
  }

  test("q241 serves contiguous descending top-k per query") {
    import spark.implicits._
    val res = Similarity.q241StreamAnnServe(spark, sf).cache()
    try {
      val perQuery = res.groupBy($"query_id")
        .agg(count(lit(1)).as("n"), max($"rank").as("mx"),
          min($"rank").as("mn"))
      assert(perQuery.filter($"mn" =!= 1 || $"mx" =!= $"n").count() === 0,
        "ranks must be the contiguous 1..n prefix per query")
      val nonDesc = res.as[(Long, Int, Long, Double)]
        .groupByKey(_._1).flatMapGroups { (_, it) =>
          val rows = it.toSeq.sortBy(_._2)
          rows.zip(rows.tail).filter { case (a, b) => a._4 < b._4 }
        }.count()
      assert(nonDesc === 0, "cos must be non-increasing in rank")
    } finally { res.unpersist(): Unit }
  }

  test("q243 surprisal is maximal for rare-token docs and bounded by ln(N)") {
    import spark.implicits._
    val res = TextQueries.q243UnigramSurprise(spark, sf)
    assert(res.count() === TextQueries.Q243TopN)
    // mean surprisal can never exceed the singleton-token bound ln(N)·1e6
    val nTotal = graft.engine.Tables.documents(spark, sf)
      .select(explode(graft.functions.TextFunctions.tokens($"text")).as("t"))
      .filter($"t" =!= "").count()
    val bound = (math.log(nTotal.toDouble) * 1e6).toLong
    assert(res.filter($"xent_units" > bound).count() === 0,
      s"no doc can be more surprising than all-singleton tokens ($bound)")
  }

  test("q244 systematic draws partition exactly: counts sum to K") {
    import spark.implicits._
    val res = TextQueries.q244SystematicResample(spark, sf)
    val total = res.agg(sum($"n_draws")).head.getLong(0)
    assert(total === TextQueries.Q244Draws,
      s"the K evenly spaced positions tile [0, W): every draw lands on " +
        s"exactly one doc, got $total of ${TextQueries.Q244Draws}")
    assert(res.filter($"n_draws" > $"wc").count() === 0,
      "a doc cannot receive more draws than it has tokens when K <= W")
  }

  test("q242 ranks stay on the damped integer grid with full mass accounted") {
    import spark.implicits._
    val res = Relational25.q242PageRank(spark, sf)
    assert(res.filter($"rank_units" < 150000L).count() === 0,
      "every node keeps at least the 0.15 teleport mass")
    assert(res.filter(!$"node".startsWith("s")).count() === 0,
      "output is the supplier side only")
  }

  test("q246 Gram never joins the data: marginals broadcast onto the pair frame") {
    import spark.implicits._
    val df = Similarity.q246Covariance(spark, sf)
    assert(df.count() === Similarity.Q246TopN)
    assert(df.filter($"di" >= $"dj").count() === 0,
      "output is the strict upper triangle")
    val p = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(!p.contains("SortMergeJoin"),
      "the only joins are the 64-row marginal broadcasts — a shuffle " +
        "join means the corpus-sized frame is on a join path:\n" + p)
  }

  test("q245 merged read backfills v1 rows with NULL, never a default") {
    import spark.implicits._
    val res = graft.engine.Formats.q245SchemaEvolution(spark, sf)
    val bad = res.filter($"n_with_hv" >= $"n_total").count()
    assert(bad === 0,
      "every type has v1 (even-id) rows, so n_with_hv < n_total — a " +
        "default-valued backfill would inflate n_with_hv to n_total")
  }
}
