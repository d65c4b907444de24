package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table support — the co-located-join scale path.
  *
  * At 100 TB a fact⋈fact equi-join (e.g. lineitem⋈orders) shuffles both
  * sides on every run. Writing both tables bucketed (and sorted) by the
  * join key moves that shuffle to write time, once: subsequent joins plan
  * as a sort-merge join over pre-bucketed scans with NO Exchange on
  * either side (asserted by BucketedJoinSpec). The bucket count is the
  * join parallelism — size it to the cluster (a few × total cores).
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted EXTERNAL table at `path` — the
    * explicit path keeps the data out of the default warehouse dir, but
    * it means DROP TABLE removes only the catalog entry: callers own
    * deleting `path` (q116 and BucketedJoinSpec pair the drop with a
    * recursive delete of the scratch dir). */
  def writeBucketed(df: DataFrame, name: String, path: String,
      key: String, buckets: Int): Unit =
    df.write
      .mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .option("path", path)
      .saveAsTable(name)

  /** Join two same-bucket-count tables on their bucket keys — shuffle-free
    * when both sides were written via [[writeBucketed]] with equal bucket
    * counts. The Datasets are bound ONCE and the condition built from
    * those bindings: resolving `spark.table` again for the condition
    * would lean on the analyzer's relation cache for exprId stability
    * and break outright on a self-join (ambiguous attributes). */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
      leftKey: String, rightKey: String): DataFrame = {
    val l = spark.table(left)
    val r = spark.table(right)
    l.join(r, l(leftKey) === r(rightKey))
  }
}
