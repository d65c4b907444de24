package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** The library's `SparkSessionExtensions` hook — SQL-name registration
  * for the expressions the engine adds beyond `functions._`. A
  * deployment opts in with
  * `.withExtensions(new GraftExtensions)` or
  * `--conf spark.sql.extensions=graft.GraftExtensions`;
  * [[GraftExtensions.install]] registers the same functions on an
  * already-built session (the path Verify/Bench/tests use, since they
  * receive a session they didn't build).
  *
  * Registered SQL surface:
  *  - `graft_bloom_agg(xxhash64(k), nItems)` → binary bloom filter
  *  - `graft_bloom_might_contain(bloom, xxhash64(k))` → boolean probe
  *  - `graft_kmv_distinct(hash, k)` → KMV distinct-count estimate
  *  - `graft_l2_distance_sq(a, b)` → codegen squared L2 over vectors
  *  - `graft_bitmap_bits(key, capacity)` → exact presence bitmap words
  *  - `graft_hilbert_d(x, y[, bits])` → codegen Hilbert curve position
  * (Spark ships the bloom expressions for its internal runtime filters
  * but leaves them unregistered; the Column-API twins live in
  * [[graft.functions.BloomFunctions]] / [[graft.functions.KmvAggregate]].)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.registrations.foreach { case (ident, info, builder) =>
      ext.injectFunction((ident, info, builder))
    }
}

object GraftExtensions {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  private[graft] val registrations
      : Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_bloom_agg"),
      info("graft_bloom_agg",
        "graft_bloom_agg(hash, nItems) - aggregates xxhash64 values into a bloom filter"),
      (args: Seq[Expression]) => args match {
        case Seq(child) => new BloomFilterAggregate(child).toAggregateExpression()
        case Seq(child, n) =>
          // SQL integer literals arrive as INT; the aggregate requires a
          // foldable BIGINT item count (Cast of a literal stays foldable)
          new BloomFilterAggregate(child,
            org.apache.spark.sql.catalyst.expressions.Cast(
              n, org.apache.spark.sql.types.LongType)).toAggregateExpression()
        case _ => throw new IllegalArgumentException(
          "graft_bloom_agg expects (hash[, nItems])")
      }),
    (FunctionIdentifier("graft_bloom_might_contain"),
      info("graft_bloom_might_contain",
        "graft_bloom_might_contain(bloom, hash) - bloom membership probe"),
      (args: Seq[Expression]) => args match {
        case Seq(bloom, hash) => BloomFilterMightContain(bloom, hash)
        case _ => throw new IllegalArgumentException(
          "graft_bloom_might_contain expects (bloom, hash)")
      }),
    (FunctionIdentifier("graft_kmv_distinct"),
      info("graft_kmv_distinct",
        "graft_kmv_distinct(hash, k) - KMV (k-minimum-values) distinct estimate " +
          "over BIGINT hashes; order-independent, exactly reproducible"),
      (args: Seq[Expression]) => args match {
        case Seq(hash, k) if k.foldable =>
          graft.functions.KmvSketch(hash,
            k.eval().asInstanceOf[Number].intValue()).toAggregateExpression()
        case _ => throw new IllegalArgumentException(
          "graft_kmv_distinct expects (hash, k-literal)")
      }),
    (FunctionIdentifier("graft_l2_distance_sq"),
      info("graft_l2_distance_sq",
        "graft_l2_distance_sq(a, b) - codegen squared L2 distance over " +
          "array<float|double>; sequential fold, NULL on ragged/null input"),
      (args: Seq[Expression]) => args match {
        case Seq(a, b) => graft.functions.VectorExpressions.L2DistanceSq(a, b)
        case _ => throw new IllegalArgumentException(
          "graft_l2_distance_sq expects (a, b)")
      }),
    (FunctionIdentifier("graft_bitmap_bits"),
      info("graft_bitmap_bits",
        "graft_bitmap_bits(key, capacityBits) - exact presence bitmap " +
          "(array<bigint> words) over a dense BIGINT key in [0, capacityBits); " +
          "out-of-domain keys fail loudly"),
      (args: Seq[Expression]) => args match {
        case Seq(key, cap) if cap.foldable =>
          graft.functions.BitmapBits(key,
            cap.eval().asInstanceOf[Number].intValue()).toAggregateExpression()
        case _ => throw new IllegalArgumentException(
          "graft_bitmap_bits expects (key, capacity-literal)")
      }),
    (FunctionIdentifier("graft_hilbert_d"),
      info("graft_hilbert_d",
        "graft_hilbert_d(x, y[, bits]) - Hilbert curve position of (x, y) " +
          "on a 2^bits grid (default 8); codegen single-loop form of the " +
          "chained-projection SQL transform"),
      (args: Seq[Expression]) => args match {
        case Seq(x, y) => graft.functions.LayoutExpressions.HilbertIndex(x, y, 8)
        case Seq(x, y, b) if b.foldable =>
          graft.functions.LayoutExpressions.HilbertIndex(x, y,
            b.eval().asInstanceOf[Number].intValue())
        case _ => throw new IllegalArgumentException(
          "graft_hilbert_d expects (x, y[, bits-literal])")
      }))

  /** Register on a live session (idempotent — re-registration of the
    * same name just overwrites with the same builder). */
  def install(spark: SparkSession): Unit =
    registrations.foreach { case (ident, inf, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, inf, builder)
    }
}
