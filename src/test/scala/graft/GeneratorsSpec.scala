package graft

import org.apache.spark.sql.functions._

import graft.functions.{Generators, TextFunctions}

class GeneratorsSpec extends SparkTestBase {
  import spark.implicits._

  test("WordShingles UDTF emits the same shingle multiset as the lambda shingler") {
    val docs = engine.Tables.documents(spark, sf)
      .filter($"doc_id" % 7 === 0)
      .select($"doc_id", TextFunctions.tokens($"text").as("toks"))
    val viaUdtf = docs
      .select($"doc_id", Generators.wordShingles($"toks", 3))
      .groupBy($"doc_id", $"shingle").agg(count(lit(1)).as("n"))
    // lambda-based reference: transform over a materialized token array
    val viaLambda = docs
      .select($"doc_id", explode(
        when(size($"toks") >= 3,
          transform(sequence(lit(1), size($"toks") - 2), i =>
            concat_ws(" ", element_at($"toks", i), element_at($"toks", i + 1),
              element_at($"toks", i + 2))))
          .otherwise(array().cast("array<string>"))).as("shingle"))
      .groupBy($"doc_id", $"shingle").agg(count(lit(1)).as("n"))
    assert(viaUdtf.exceptAll(viaLambda).isEmpty && viaLambda.exceptAll(viaUdtf).isEmpty)
  }

  test("WordShingles yields nothing for docs shorter than n and idx starts at 0") {
    val tiny = Seq((1L, Array("a", "b")), (2L, Array("a", "b", "c", "d")))
      .toDF("id", "toks")
    val out = tiny.select($"id", Generators.wordShingles($"toks", 3)).collect()
    assert(out.forall(_.getLong(0) == 2L))
    assert(out.map(r => (r.getInt(1), r.getString(2))).toSeq ==
      Seq((0, "a b c"), (1, "b c d")))
  }
}
