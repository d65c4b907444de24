package graft

import org.apache.spark.sql.functions._

import graft.engine.{Similarity, Tables}
import graft.functions.VectorExpressions

class VectorExpressionsSpec extends SparkTestBase {
  import spark.implicits._

  test("codegen dot_product is bit-identical to the HOF fold") {
    val emb = Tables.embeddings(spark, sf)
    val pairs = emb.as("a").join(emb.as("b"), $"a.vec_id" + 1 === $"b.vec_id")
      .select(
        VectorExpressions.dot_product($"a.embedding", $"b.embedding").as("native"),
        Similarity.dotHof($"a.embedding", $"b.embedding").as("hof"))
      .collect()
    assert(pairs.nonEmpty)
    // Bit-level equality, not tolerance: same sequential fold.
    pairs.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("codegen l2_distance_sq is bit-identical to the HOF fold, whole and sliced") {
    val emb = Tables.embeddings(spark, sf)
    val pairs = emb.as("a").join(emb.as("b"), $"a.vec_id" + 1 === $"b.vec_id")
      .select(
        VectorExpressions.l2_distance_sq($"a.embedding", $"b.embedding").as("native"),
        Similarity.l2Hof($"a.embedding", $"b.embedding").as("hof"),
        VectorExpressions.l2_distance_sq(
          slice($"a.embedding", 9, 8), slice($"b.embedding", 9, 8)).as("nslice"),
        Similarity.l2Hof(
          slice($"a.embedding", 9, 8), slice($"b.embedding", 9, 8)).as("hslice"))
      .collect()
    assert(pairs.nonEmpty)
    pairs.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
      assert(java.lang.Double.doubleToLongBits(r.getDouble(2)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(3)))
    }
  }

  test("l2_distance_sq is NULL on ragged lengths, like the HOF's zip_with padding") {
    val df = Seq(
      (Seq(1.0f, 2.0f), Seq(3.0f, 4.0f)),
      (Seq(1.0f, 2.0f, 5.0f), Seq(3.0f, 4.0f)))
      .toDF("a", "b")
    val got = df.select(VectorExpressions.l2_distance_sq($"a", $"b").as("d"))
      .collect().map(r => Option(r.get(0)))
    assert(got(0).contains(8.0) && got(1).isEmpty)
  }

  test("dot_product rejects non-array inputs at analysis") {
    val err = intercept[Exception] {
      Tables.documents(spark, sf)
        .select(VectorExpressions.dot_product($"text", $"text")).collect()
    }
    assert(err.getMessage.toLowerCase.contains("dot_product") ||
      err.getMessage.toLowerCase.contains("data type"))
  }

  test("dot_product is NULL on ragged lengths and null elements, like the HOF") {
    val df = Seq(
      (Seq(1.0f, 2.0f), Seq(3.0f, 4.0f)),          // well-formed
      (Seq(1.0f, 2.0f, 5.0f), Seq(3.0f, 4.0f)))    // ragged
      .toDF("a", "b")
    val got = df.select(VectorExpressions.dot_product($"a", $"b").as("d"))
      .collect().map(r => Option(r.get(0)))
    assert(got(0).contains(11.0))
    assert(got(1).isEmpty, "length mismatch must yield NULL, not a truncated dot")
    val withNullElem = Seq((Seq[java.lang.Float](1.0f, null), Seq[java.lang.Float](2.0f, 3.0f)))
      .toDF("a", "b")
      .select(VectorExpressions.dot_product($"a", $"b").as("d"))
      .collect().map(r => Option(r.get(0)))
    assert(withNullElem(0).isEmpty, "null element must yield NULL")
  }

  test("cosine_similarity of a vector with itself is 1") {
    val cos = Tables.embeddings(spark, sf).limit(50)
      .select(VectorExpressions.cosine_similarity($"embedding", $"embedding").as("c"))
      .as[Double].collect()
    cos.foreach(c => assert(math.abs(c - 1.0) < 1e-12))
  }

  test("sorted_intersect_count equals size(array_intersect) on fixture token sets") {
    // every consecutive doc pair's sorted distinct token sets — the
    // merge loop must agree with the builtin on real data
    val sets = Tables.documents(spark, sf)
      .select($"doc_id", sort_array(array_distinct(
        graft.functions.TextFunctions.tokens($"text"))).as("set"))
    val pairs = sets.as("a").join(sets.as("b"), $"a.doc_id" + 1 === $"b.doc_id")
      .select($"a.set".as("sa"), $"b.set".as("sb"))
    val got = pairs.select(
        VectorExpressions.sorted_intersect_count($"sa", $"sb").as("m"),
        size(array_intersect($"sa", $"sb")).cast("long").as("e"))
      .collect()
    assert(got.nonEmpty)
    got.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("sorted_intersect_count null contract: null element poisons, empty is 0") {
    val df = Seq(
      (Seq("a", "b", "c"), Seq("b", "c", "d")),
      (Seq.empty[String], Seq("x")))
      .toDF("a", "b")
    val got = df.select(VectorExpressions.sorted_intersect_count($"a", $"b").as("m"))
      .collect().map(r => Option(r.get(0)))
    assert(got(0).contains(2L))
    assert(got(1).contains(0L))
    val withNull = Seq((Seq[String]("a", null), Seq("a", "b")))
      .toDF("a", "b")
      .select(VectorExpressions.sorted_intersect_count($"a", $"b").as("m"))
      .collect().map(r => Option(r.get(0)))
    assert(withNull(0).isEmpty, "null element must yield NULL, not a partial count")
  }
}
