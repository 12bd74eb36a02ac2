package graft.util

import org.apache.logging.log4j.LogManager
import org.apache.logging.log4j.core.{Filter, LoggerContext}
import org.apache.logging.log4j.core.config.{Configurator, LoggerConfig}
import org.apache.logging.log4j.core.filter.RegexFilter
import org.apache.logging.log4j.Level

/** Log hygiene for the harness mains (Bench/Verify).
  *
  * Hygienic registry queries return a MATERIALIZED local checkpoint and
  * the harness frees its blocks as soon as the count/dump is done
  * (`GraftSqlBridge.releaseLocalCheckpoint`). Spark's `RDD.unpersist`
  * logs a WARN for every locally-checkpointed RDD it frees ("lineage …
  * truncated and cannot be recomputed after unpersisting") — correct in
  * general, pure noise here BY DESIGN: the blocks are dead, nothing will
  * ever recompute them. Hundreds of such lines per sweep would bury a
  * REAL warning (a lost shuffle, an OOM kill), so the mains DENY exactly
  * that one message via a log4j2 RegexFilter on the two emitting
  * categories. Scoped twice over: only the named concrete-class
  * categories are touched — NOT the whole `org.apache.spark.rdd`
  * package — and within them only events whose formatted message matches
  * the known dead-block text are dropped, so every OTHER warning those
  * loggers can emit (e.g. "local checkpointing with dynamic allocation")
  * stays visible. (The previous implementation floored the categories at
  * ERROR, which silenced those too.) See USAGE.md ("Log noise").
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

  /** The one known-noise message (Spark core's exact wording). */
  private val ExpectedUnpersistWarnRegex =
    ".*truncated and cannot be recomputed after unpersisting.*"

  def suppressExpectedUnpersistWarnings(): Unit =
    try {
      val ctx = LogManager.getContext(false).asInstanceOf[LoggerContext]
      val cfg = ctx.getConfiguration
      ExpectedUnpersistWarnCategories.foreach { cat =>
        val filter = RegexFilter.createFilter(
          ExpectedUnpersistWarnRegex, null, java.lang.Boolean.FALSE,
          Filter.Result.DENY, Filter.Result.NEUTRAL)
        val existing = cfg.getLoggerConfig(cat)
        if (existing.getName == cat) existing.addFilter(filter)
        else {
          // no config node for this category yet: add one at the current
          // EFFECTIVE level (the parent's — captured once; the mains set
          // their level before calling this), additive so events still
          // route to the parent's appenders
          val lc = new LoggerConfig(cat, existing.getLevel, true)
          lc.addFilter(filter)
          cfg.addLogger(cat, lc)
        }
      }
      ctx.updateLoggers()
    } catch {
      case e: Throwable =>
        // filter construction is version-sensitive API; fall back to the
        // coarse category-level floor rather than letting the expected
        // WARN storm bury real warnings
        System.err.println(
          s"[logs] regex filter unavailable (${e.getMessage}); " +
            "falling back to category-level ERROR floor")
        ExpectedUnpersistWarnCategories.foreach(Configurator.setLevel(_, Level.ERROR))
    }
}
