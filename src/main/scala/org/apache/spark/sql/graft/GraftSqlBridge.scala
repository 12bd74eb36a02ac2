package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** The one `private[sql]` doorway the engine needs: turning a custom
  * [[LogicalPlan]] node into a user-facing DataFrame. Spark exposes every
  * EXTENSION seam publicly (`injectPlannerStrategy`, optimizer rules,
  * expressions) but keeps plan→DataFrame construction `private[sql]`, so
  * libraries that ship whole custom operators (here:
  * `graft.plans.AsofJoinExec`) conventionally open it from inside the
  * package — the same move delta/iceberg/spark-rapids make. Nothing else
  * of Spark's internals is re-exported: this object is the complete
  * surface area of the trick.
  */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Frees the executor blocks behind a `localCheckpoint(eager = true)`d
    * Dataset. `spark.catalog.clearCache()` only empties the CacheManager;
    * checkpoint blocks are plain persisted RDDs the ContextCleaner frees
    * only when the driver GCs — which a large-heap, 300-query sweep may
    * not do for minutes, so each iterative query's superseded rounds pile
    * up in executor storage. Call this on a round's Dataset ONLY once it
    * is provably never read again (a local checkpoint discards lineage,
    * so the data cannot be recomputed). Reliable (file-based) checkpoints
    * are untouched: their RDDs are not persisted, so `unpersist` is a
    * no-op and the files stay owned by the checkpoint dir's lifecycle.
    */
  /** RDD ids whose checkpoint blocks OUTLIVE a single query — memoized /
    * session-shared checkpointed Datasets register here so a caller-side
    * [[releaseLocalCheckpoint]] (Bench/Verify free every returned result's
    * blocks after consuming it) cannot destroy them: a local checkpoint
    * has no lineage, so an unpersisted one is unrecoverable, and every
    * later query sharing the memo would fail. Today all SessionMemos
    * store paths or collected rows, so the set stays empty — this guard
    * exists so the NEXT memo that caches a checkpointed plan is safe by
    * construction (register at memo-build time).
    */
  private val protectedRddIds =
    java.util.concurrent.ConcurrentHashMap.newKeySet[(String, Int)]()

  // RDD ids restart from 0 when a SparkContext is recreated in the same
  // JVM, so the key carries the owning context's applicationId — a stale
  // protection from a stopped context can never shield an unrelated new
  // checkpoint that happens to reuse the integer id.
  private def key(lr: org.apache.spark.sql.execution.LogicalRDD): (String, Int) =
    (lr.rdd.context.applicationId, lr.rdd.id)

  /** Marks a checkpointed Dataset as shared: [[releaseLocalCheckpoint]]
    * will skip its blocks. Call once, when the Dataset is built, before
    * handing it to any registry query.
    */
  def protectSharedCheckpoint(df: DataFrame): Unit =
    df.queryExecution.logical.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        val _ = protectedRddIds.add(key(lr))
      case _ => ()
    }

  def releaseLocalCheckpoint(df: DataFrame): Unit =
    df.queryExecution.logical.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD
          if !protectedRddIds.contains(key(lr)) =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** RDD ids of the LogicalRDD leaves in a plan — test-only introspection
    * (LogicalRDD is private[sql]) for pinning the protect/release guard.
    */
  def logicalRddIds(df: DataFrame): Seq[Int] =
    df.queryExecution.logical.collect {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.id
    }

  /** True when the session's CacheManager holds no cached relations —
    * the invariant QueryHygieneSpec pins after every hygienic query
    * (Spark exposes no public "list cached relations" API).
    */
  def cacheManagerEmpty(spark: SparkSession): Boolean =
    spark.asInstanceOf[classic.SparkSession].sharedState.cacheManager.isEmpty
}
