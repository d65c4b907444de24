package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-validating memoization for localCheckpoint'ed shared
  * derivations (extracted from Dedup so non-dedup query families can
  * share heavy frames the same way): checkpoint blocks live on the
  * CREATING session's executors, so a cached frame is only reusable by
  * the session that built it. A hit from a different session (same-JVM
  * session restart, or two sessions sharing the JVM) evicts the stale
  * entry — best-effort unpersisting its blocks — and rebuilds, instead
  * of silently serving a frame bound to a dead session. */
private[engine] object Memo {
  def byDir(cache: scala.collection.concurrent.TrieMap[String, DataFrame],
      spark: SparkSession, sfDir: String)(build: => DataFrame): DataFrame =
    cache.get(sfDir) match {
      case Some(df) if df.sparkSession eq spark => df
      case stale =>
        stale.foreach(df => try df.unpersist() catch { case _: Throwable => () })
        val built = build
        cache.put(sfDir, built)
        built
    }
}
