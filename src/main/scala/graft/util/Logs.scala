package graft.util

import org.apache.logging.log4j.Level
import org.apache.logging.log4j.core.config.Configurator

/** Log hygiene for the harness mains (Bench/Verify).
  *
  * Hygienic registry queries return a MATERIALIZED local checkpoint and
  * the harness frees its blocks as soon as the count/dump is done
  * (`GraftSqlBridge.releaseLocalCheckpoint`). Spark's `RDD.unpersist`
  * logs a WARN for every locally-checkpointed RDD it frees ("lineage …
  * truncated and cannot be recomputed after unpersisting") — correct in
  * general, pure noise here BY DESIGN: the blocks are dead, nothing will
  * ever recompute them. Hundreds of such lines per sweep would bury a
  * REAL warning (a lost shuffle, an OOM kill), so the mains route the
  * two emitting categories to ERROR. Scoped to the concrete RDD classes
  * the checkpoint release touches — NOT the whole `org.apache.spark.rdd`
  * package — so genuine warnings from other RDD machinery stay visible.
  * See USAGE.md ("Log noise") for the user-facing note.
  */
object Logs {

  /** Categories that emit the expected dead-block unpersist WARN: the
    * logger is the RDD's CONCRETE class, and a checkpointed Dataset's
    * backing RDD is a MapPartitionsRDD; LocalRDDCheckpointData covers the
    * checkpoint-machinery side.
    */
  private val ExpectedUnpersistWarnCategories = Seq(
    "org.apache.spark.rdd.MapPartitionsRDD",
    "org.apache.spark.rdd.LocalRDDCheckpointData")

  def suppressExpectedUnpersistWarnings(): Unit =
    ExpectedUnpersistWarnCategories.foreach(Configurator.setLevel(_, Level.ERROR))
}
