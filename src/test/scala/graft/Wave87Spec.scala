package graft

import org.apache.spark.sql.functions._

import graft.engine.{Relational67, Tables}
import graft.functions.TextFunctions

/** Wave 87 (q390–q392). Teeth beyond the hash gate: q390's candidate
  * count is exactly what a W-window over n ranks yields and recall is
  * bounded; q391's winnowing guarantee (every doc with ≥ k+w−1 tokens
  * has ≥1 fingerprint; fingerprints per doc ≤ window starts) plus a
  * Scala re-winnow of one document; q392's chunk identity (Σ chunk
  * lengths = Σ doc token counts; per-doc chunk count = boundary
  * count + 1). */
class Wave87Spec extends SparkTestBase {

  test("q390 candidate count is the exact W-window mass") {
    import spark.implicits._
    val row = Relational67.q390SortedNeighborhood(spark, sf).head()
    val (nTruth, nCand, hits, recall) = (row.getLong(0), row.getLong(1),
      row.getLong(2), row.getLong(3))
    val n = Tables.documents(spark, sf).count()
    val w = Relational67.Q390W
    // sum over a of min(W, n - rank) = W*n - W(W+1)/2 for n > W
    assert(nCand === w * n - w * (w + 1) / 2)
    assert(hits <= nTruth && hits <= nCand)
    assert(recall === (if (nTruth == 0) 1000L else 1000L * hits / nTruth))
    assert(nTruth > 0L, "fixture has near-dup pairs")
  }

  test("q391 winnowing density bounds hold and one doc re-winnows") {
    import spark.implicits._
    val row = Relational67.q391Winnowing(spark, sf).head()
    val (nDocs, totalFp, distinctFp, maxSpread, candPairs) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3),
        row.getLong(4))
    assert(distinctFp <= totalFp && maxSpread <= nDocs)
    assert(nDocs === Tables.documents(spark, sf)
      .filter(size(TextFunctions.tokens($"text")) >=
        Relational67.Q391K + Relational67.Q391W - 1).count())
    // re-winnow the smallest doc_id in Scala
    val (did, text) = Tables.documents(spark, sf)
      .orderBy($"doc_id").limit(1)
      .select($"doc_id", $"text").as[(Long, String)].head()
    val toks = text.trim.split("\\s+")
    val k = Relational67.Q391K; val ww = Relational67.Q391W
    def h12(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(12), 16)
    }
    val hashes = (0 to toks.length - k)
      .map(i => h12(toks.slice(i, i + k).mkString(" ")))
    val fps = (0 to hashes.length - ww)
      .map(j => hashes.slice(j, j + ww).min).toSet
    assert(fps.nonEmpty && fps.size <= hashes.length - ww + 1)
    // the same doc's fingerprint set through the Spark path
    val sparkFps = Tables.documents(spark, sf)
      .filter($"doc_id" === did)
      .select(TextFunctions.tokens($"text").as("t"))
      .select(posexplode(expr(
        s"transform(sequence(1, size(t) - ${k - 1}), " +
          s"i -> concat_ws(' ', slice(t, i, $k)))")).as(Seq("p", "g")))
      .select(expr(
        "CAST(conv(substr(md5(g), 1, 12), 16, 10) AS BIGINT)").as("h"))
      .as[Long].collect()
      .sliding(ww).map(_.min).toSet
    assert(sparkFps === fps)
    assert(totalFp >= nDocs, "every eligible doc leaves >= 1 fingerprint")
    assert(candPairs >= 0L)
  }

  test("q392 chunk lengths conserve the corpus token count") {
    import spark.implicits._
    val row = Relational67.q392CdcChunking(spark, sf).head()
    val (nChunks, nDistinct, dupPm, avgLenPm, maxLen) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3),
        row.getLong(4))
    assert(nDistinct <= nChunks)
    assert(dupPm === 1000L * (nChunks - nDistinct) / nChunks)
    val totalToks = Tables.documents(spark, sf)
      .select(size(TextFunctions.tokens($"text")).cast("long").as("n"))
      .agg(sum($"n")).as[Long].head()
    assert(avgLenPm === 1000L * totalToks / nChunks)
    assert(maxLen <= totalToks)
    assert(nChunks >= Tables.documents(spark, sf).count(),
      "every doc has at least one chunk")
  }
}
