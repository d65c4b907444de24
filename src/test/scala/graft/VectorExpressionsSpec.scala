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
}
