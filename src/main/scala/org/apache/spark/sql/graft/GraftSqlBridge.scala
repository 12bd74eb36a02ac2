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
}
