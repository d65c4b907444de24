package graft

import org.apache.spark.sql.functions._

import graft.engine.{Formats, Tables}

class FormatsWave25Spec extends SparkTestBase {
  import spark.implicits._

  test("q186 binary round-trip preserves every payload byte per source") {
    val rows = Formats.q186BinarySource(spark, sf).collect()
    val expect = Tables.documents(spark, sf)
      .filter($"doc_id" % 7 === 0)
      .groupBy($"source")
      .agg(count(lit(1)).as("n"), sum(length($"text")).as("bytes"))
      .collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("n"), r.getAs[Long]("bytes")))
      .toMap
    assert(rows.length == expect.size)
    rows.foreach { r =>
      val (n, bytes) = expect(r.getString(0))
      assert(r.getAs[Long]("n_files") == n)
      assert(r.getAs[Long]("total_bytes") == bytes, "ASCII corpus: chars == bytes")
    }
  }

  test("q187 text source reads exactly one line per document") {
    val r = Formats.q187TextSource(spark, sf).collect().head
    assert(r.getAs[Long]("n_lines") == Tables.documents(spark, sf).count())
    val bytes = Tables.documents(spark, sf)
      .agg(sum(octet_length($"text"))).as[Long].head()
    assert(r.getAs[Long]("n_bytes") == bytes)
  }

  test("documents fixture contract: no embedded newlines (one line per doc)") {
    // q187's line-oriented round trip (and its oracle) assume the text
    // source reads back exactly |documents| lines; an embedded \n or \r
    // would silently split a doc. Asserted, not assumed.
    assert(Tables.documents(spark, sf)
      .filter($"text".contains("\n") || $"text".contains("\r")).count() == 0)
  }

  test("q188 csv codec inverts including quoted JSON props") {
    val out = Formats.q188CsvExpr(spark, sf)
    val src = Tables.events(spark, sf)
      .select($"event_id", $"event_type", $"props")
    assert(out.exceptAll(src).count() == 0 && src.exceptAll(out).count() == 0)
    // props contain the CSV delimiter and quotes — the quoting path ran
    assert(Tables.events(spark, sf)
      .filter($"props".contains(",") || $"props".contains("\"")).count() > 0)
  }

  test("q189 dynamic overwrite touches exactly one partition") {
    val rows = Formats.q189DynamicOverwrite(spark, sf).collect()
    assert(rows.count(_.getAs[Boolean]("overwritten")) == 1)
    val base = Tables.events(spark, sf)
      .groupBy(date_format($"ts", "yyyy-MM-dd").as("date"))
      .agg(sum(graft.engine.Exact.cents($"value")).as("cents"))
      .collect().map(r => r.getString(0) -> r.getAs[Long]("cents")).toMap
    rows.foreach { r =>
      val mult = if (r.getAs[Boolean]("overwritten")) 2L else 1L
      assert(r.getAs[Long]("cents") == base(r.getString(0)) * mult)
    }
  }
}
