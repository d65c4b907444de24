package graft

import org.apache.spark.sql.functions._

import graft.engine.{Dedup, GraphQueries, Relational8, Tables}

/** Eleventh query wave: graph analytics over the near-dup candidate
  * graph (triangles, fixed-point PageRank) and the approx-percentile
  * rank-bound validation. */
class GraphQueriesSpec extends SparkTestBase {
  import spark.implicits._

  private def edges(): Array[(Long, Long)] =
    Dedup.q21MinhashLsh(spark, sf)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect()

  test("q124 triangle credits equal 3x the brute-force triangle count") {
    val es = edges().toSet
    val nodes = es.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    var bruteTriangles = 0L
    for {
      i <- nodes.indices; j <- (i + 1) until nodes.length
      if es.contains((nodes(i), nodes(j)))
      k <- (j + 1) until nodes.length
      if es.contains((nodes(j), nodes(k))) && es.contains((nodes(i), nodes(k)))
    } bruteTriangles += 1
    val rows = GraphQueries.q124Triangles(spark, sf).collect()
    val credits = rows.map(_.getAs[Long]("n_triangles")).sum
    assert(credits == 3 * bruteTriangles,
      s"each triangle credits its 3 members once: $credits != 3*$bruteTriangles")
    // participation is bounded by the wedge count at each doc
    val deg = edges().flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    rows.foreach { r =>
      val d = deg(r.getAs[Long]("doc"))
      assert(r.getAs[Long]("n_triangles") <= d * (d - 1) / 2)
    }
  }

  test("q125 fixed-point PageRank matches an exact driver-side replay") {
    val es = edges()
    val dir = es ++ es.map(e => (e._2, e._1))
    val deg = dir.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val nodes = deg.keySet
    val pr1 = dir.groupBy(_._2).view.mapValues { in =>
      150000L + in.map { case (src, _) => (1000000L * 17 / 20) / deg(src) }.sum
    }.toMap
    val pr2 = dir.groupBy(_._2).view.mapValues { in =>
      150000L + in.map { case (src, _) => (pr1(src) * 17 / 20) / deg(src) }.sum
    }.toMap
    val got = GraphQueries.q125PagerankExact(spark, sf).collect()
      .map(r => r.getAs[Long]("doc") -> r.getAs[Long]("rank_micro")).toMap
    assert(got.keySet == nodes)
    got.foreach { case (doc, r) =>
      assert(r == pr2(doc), s"doc $doc: $r != replay ${pr2(doc)}")
      assert(r >= 150000L, "teleport floor holds")
    }
  }

  test("q130 suppression conserves the corpus and drops exactly the non-canonicals") {
    val rows = Dedup.q130DedupApply(spark, sf).collect()
    val nDocs = Tables.documents(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == nDocs)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_kept") + r.getAs[Long]("n_dropped") ==
        r.getAs[Long]("n_docs"))
    }
    val expectedDrops = Dedup.q67DedupClusters(spark, sf)
      .filter(col("doc") =!= col("canonical")).count()
    assert(rows.map(_.getAs[Long]("n_dropped")).sum == expectedDrops,
      "exactly the non-canonical cluster members are dropped")
    assert(expectedDrops > 0, "the corpus contains near-dup clusters to act on")
  }

  test("q132 precision audit: candidates conserved, truth matches brute force") {
    val rows = Dedup.q132LshPrecision(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("n_candidates")).sum ==
      Dedup.q21MinhashLsh(spark, sf).count(),
      "every LSH candidate is judged exactly once")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_true") <= r.getAs[Long]("n_candidates"))
      val p = r.getAs[Double]("prec")
      assert(p >= 0.0 && p <= 1.0)
    }
    // brute-force ground truth over the collected corpus
    def shingles(text: String): Set[String] = {
      val t = text.trim.split("\\s+").toSeq
      if (t.length < 3) Set.empty
      else t.sliding(3).map(_.mkString(" ")).toSet
    }
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    val pairs = Dedup.q21MinhashLsh(spark, sf)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect()
    val expectTrue = pairs.count { case (a, b) =>
      val (sa, sb) = (shingles(docs(a)), shingles(docs(b)))
      3L * (sa & sb).size >= sa.size + sb.size
    }
    assert(rows.map(_.getAs[Long]("n_true")).sum == expectTrue,
      "integer Jaccard test must agree with a driver-side replay")
  }

  test("q126 approx-median rank bound holds and counts are exact") {
    val rows = Relational8.q126ApproxPercentileBounds(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Boolean]("within_bound")),
      "GK sketch must honor its rank-error contract")
    val exact = Tables.events(spark, sf)
      .groupBy($"event_type").count().as[(String, Long)].collect().toMap
    rows.foreach(r =>
      assert(r.getAs[Long]("n") == exact(r.getAs[String]("event_type"))))
  }
}
