package graft

/** Shuffle-width invariance: the engine's core discipline is that no
  * output bit depends on partial-aggregation or shuffle order. This
  * spec enforces it mechanically — representative queries (every
  * numeric recipe family: exact decimal sums, windowed shares, float
  * chains behind round(6), fixed-point integer iteration, sketch
  * buffers) must produce byte-identical rows at parallelism 4 and 7.
  * A query that only "usually" agrees with the oracle fails here long
  * before the gate sees it.
  */
class DeterminismSpec extends SparkTestBase {

  private val families = Seq(
    "q01_flag_share_count",   // conditional avg (exact decimal recipe)
    "q06_window_share",       // windowed percent-of-group
    "q21_minhash_lsh",        // hash-signature banding
    "q43_percentiles",        // exact order statistics
    "q44_tfidf",              // log + round(6) float chain
    "q72_centroids",          // power-of-two scaled means
    "q95_distribution_drift", // 64-bit cross products, one division
    "q105_budget_sample",     // stateless hash-threshold membership
    "q113_winsorize",         // percentile broadcast + clipped mean
    "q121_linear_trend",      // integer moments regression
    "q125_pagerank_exact",    // fixed-point iteration
    "q127_kmv_distinct",      // min-k sketch buffer merge
    "q135_local_supplier",    // decimal grid + ORDER BY revenue DESC
    "q136_ivm_merge",         // partial-state decimal merge
    "q139_checksum_diff",     // commutative mod-sum checksum
    "q142_concurrency_gauge") // sweep-line running sum with tie order

  private def run(name: String): Seq[Seq[Any]] =
    SparkEntry.queries(name)(spark, sf).collect().toSeq.map(_.toSeq)

  test("outputs are bit-identical at shuffle parallelism 4 and 7") {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    val at4 = families.map(n => n -> run(n)).toMap
    spark.conf.set(key, "7")
    try {
      families.foreach { n =>
        assert(run(n) == at4(n),
          s"$n output depends on shuffle width — a partial-order leak")
      }
    } finally spark.conf.set(key, prev)
  }
}
