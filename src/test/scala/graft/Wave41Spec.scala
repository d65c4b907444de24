package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.engine.{Relational31, Tables}

/** Wave 41 (q271–q273): SCD2 interval build, grouped OLS from exact
  * moments, tokenizer fertility. Invariants the row-hash oracle gate
  * cannot see: interval-algebra laws for the SCD2 build, the centroid
  * and perfect-fit laws for the regression, and byte/char ordering for
  * the fertility audit. */
class Wave41Spec extends SparkTestBase {

  test("q271 SCD2 intervals: one open interval per changed user, disjoint coverage, collapse works") {
    import spark.implicits._
    val byUser = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val changes = Tables.events(spark, sf)
      .filter($"event_type" === "purchase")
      .select($"user_id", $"ts", $"event_id",
        (graft.engine.Exact.cents($"value") % 3).as("tier"))
      .withColumn("prev_tier", lag($"tier", 1).over(byUser))
      .filter($"prev_tier".isNull || $"tier" =!= $"prev_tier")
    // collapse really collapses: no surviving row repeats its predecessor
    assert(changes.filter($"tier" === $"prev_tier").count() === 0)
    val iv = changes
      .withColumn("from_us", unix_micros($"ts"))
      .withColumn("to_us", lead(unix_micros($"ts"), 1).over(byUser))
    // exactly one open interval per user that has any change
    val openPerUser = iv.groupBy($"user_id")
      .agg(count(when($"to_us".isNull, 1)).as("n_open"))
    assert(openPerUser.filter($"n_open" =!= 1).count() === 0)
    // intervals are disjoint and ordered: to_us is the NEXT from_us
    val overlap = iv.withColumn("next_from",
        lead($"from_us", 1).over(byUser))
      .filter($"to_us".isNotNull && $"to_us" =!= $"next_from")
    assert(overlap.count() === 0, "each closed interval must end exactly " +
      "where the next begins — no gaps, no overlaps")
    // the audit's n_current equals the number of users with >=1 change
    val audited = Relational31.q271Scd2Build(spark, sf)
      .agg(sum($"n_current")).head().getLong(0)
    assert(audited === changes.select($"user_id").distinct().count())
  }

  test("q272 regression passes through the group centroid and nails a perfect line") {
    import spark.implicits._
    // centroid law: intercept + slope * mean(x) == mean(y) (exact in the
    // fitted doubles up to the published rounding)
    val base = Tables.events(spark, sf)
      .agg(min(expr("unix_micros(ts) div 3600000000")).as("h0"))
    val pts = Tables.events(spark, sf)
      .select($"event_type",
        expr("unix_micros(ts) div 3600000000").as("h"),
        graft.engine.Exact.cents($"value").as("y"))
      .crossJoin(broadcast(base))
      .withColumn("x", $"h" - $"h0")
    val centroids = pts.groupBy($"event_type")
      .agg((sum($"x") / count(lit(1))).as("mx"),
        (sum($"y") / count(lit(1))).as("my"))
    val joined = Relational31.q272GroupOls(spark, sf)
      .join(centroids, "event_type")
      .select($"event_type",
        abs($"intercept_cents" + $"slope_cents_per_h" * $"mx" - $"my")
          .as("err"))
      .collect()
    joined.foreach { r =>
      assert(r.getDouble(1) < 1e-4,
        s"${r.getString(0)}: centroid residual ${r.getDouble(1)}")
    }
    // perfect-fit law on a synthetic exact line y = 7x + 40 — the same
    // moment arithmetic must recover the coefficients exactly
    val line = spark.range(0, 1000)
      .select(lit("synth").as("event_type"), $"id".as("x"),
        ($"id" * 7 + 40).as("y"))
    val m = line.groupBy($"event_type")
      .agg(count(lit(1)).as("n"), sum($"x").as("sx"), sum($"y").as("sy"),
        sum($"x" * $"y").as("sxy"), sum($"x" * $"x").as("sxx"))
      .select((($"n" * $"sxy" - $"sx" * $"sy") /
        ($"n" * $"sxx" - $"sx" * $"sx")).as("slope"))
      .head()
    assert(m.getDouble(0) === 7.0)
  }

  test("q273 fertility: bytes >= chars, every ratio positive, doc totals conserved") {
    import spark.implicits._
    val f = Relational31.q273TokenizerFertility(spark, sf)
    assert(f.filter($"n_bytes" < $"n_chars").count() === 0,
      "UTF-8 byte length is never below character length")
    assert(f.filter($"bytes_per_word" <= 0 || $"words_per_doc" <= 0)
      .count() === 0)
    val total = f.agg(sum($"n_docs")).head().getLong(0)
    assert(total === Tables.documents(spark, sf).count(),
      "every document lands in exactly one language row")
  }
}
