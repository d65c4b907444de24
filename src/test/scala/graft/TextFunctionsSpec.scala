package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.engine.TextQueries
import graft.functions.TextFunctions

class TextFunctionsSpec extends SparkTestBase {
  import spark.implicits._

  /** Deterministic pseudo-random texts over the lexicon vocabulary. */
  private def sampleTexts(seed: Int, n: Int): Seq[String] = {
    val vocab = Vector("fast", "slow", "spark", "join", "data", "the", "a", "x", "big", "small")
    val rnd = new Random(seed)
    (1 to n).map(_ => Vector.fill(1 + rnd.nextInt(30))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
  }

  test("sentiment codomain is {positive, negative, neutral}") {
    val labels = sampleTexts(1, 200).toDF("text")
      .select(TextFunctions.sentiment($"text")).as[String].collect()
    assert(labels.forall(Set("positive", "negative", "neutral")))
  }

  test("emotion codomain is the fixed 6-label set") {
    val labels = sampleTexts(2, 200).toDF("text")
      .select(TextFunctions.emotion($"text")).as[String].collect()
    assert(labels.forall(TextFunctions.EmotionLabels.toSet))
  }

  test("tokenOccurrences is TRUE token frequency (adjacent repeats all count)") {
    val texts = sampleTexts(3, 100)
    val got = texts.toDF("text")
      .select(TextFunctions.tokenOccurrences($"text", "fast")).as[Int].collect()
    val expected = texts.map(_.trim.split("\\s+").count(_ == "fast"))
    assert(got.toSeq == expected)
    // the case the old padded-replace formulation undercounted
    val repeats = Seq("fast fast fast fast").toDF("text")
      .select(TextFunctions.tokenOccurrences($"text", "fast")).as[Int].head()
    assert(repeats == 4)
  }

  test("quality score lies in [0,1]") {
    val scores = engine.Tables.documents(spark, sf)
      .select(TextFunctions.qualityScore($"text")).as[Double].collect()
    assert(scores.forall(q => q >= 0.0 && q <= 1.0))
  }

  test("fingerprint is whitespace-insensitive") {
    val df = Seq("a  b   c", "a b c", " a b c ").toDF("text")
    val fps = df.select(TextFunctions.fingerprint($"text")).as[String].collect()
    assert(fps.distinct.length == 1)
  }

  test("q15 emotion pivot cells sum to document count") {
    val cells = TextQueries.q15EmotionPivot(spark, sf)
      .select(TextFunctions.EmotionLabels.map(l => sum(col(l))): _*)
      .collect().head.toSeq.map(_.asInstanceOf[Long]).sum
    val docs = engine.Tables.documents(spark, sf).count()
    assert(cells == docs)
  }

  test("q20 flagship positivity in [0,1] and pivot row sums equal counts") {
    val rows = TextQueries.q20Flagship(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val p = r.getAs[Double]("positivity_rate")
      assert(p >= 0.0 && p <= 1.0)
      val emotionSum = TextFunctions.EmotionLabels.map(r.getAs[Long]).sum
      assert(emotionSum == r.getAs[Long]("counts"))
    }
  }
}
