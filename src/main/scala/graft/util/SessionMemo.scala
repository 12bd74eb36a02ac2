package graft.util

import org.apache.spark.sql.SparkSession

/** Session-scoped memo: `(SparkSession, K) → V`, weakly keyed on the
  * session.
  *
  * The weak-key/value-capture subtlety lives HERE, once: a weak key alone
  * cannot free a retired session when V (directly or transitively)
  * references its session — e.g. a cached DataFrame strongly references
  * `df.sparkSession`, pinning the key for the JVM lifetime. Retirement is
  * therefore detected explicitly: every access sweeps out sessions whose
  * SparkContext has stopped, whose cached values are unusable anyway.
  * Callers that cache only session-free values (paths, collected rows)
  * get the sweep for free; callers that cache plans rely on it.
  *
  * All access is synchronized on the memo — builds are rare (fixture
  * construction, plan assembly) and correctness beats concurrency here:
  * two racing builders for the same key would each run `build` and tear
  * down each other's fixture dirs.
  */
final class SessionMemo[K, V] {

  private val cache =
    new java.util.WeakHashMap[SparkSession, scala.collection.mutable.Map[K, V]]()

  def getOrElseUpdate(spark: SparkSession, key: K)(build: => V): V =
    cache.synchronized {
      val it = cache.keySet.iterator()
      while (it.hasNext) if (it.next().sparkContext.isStopped) it.remove()
      cache
        .computeIfAbsent(spark, _ => scala.collection.mutable.Map.empty)
        .getOrElseUpdate(key, build)
    }
}
