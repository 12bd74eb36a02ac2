package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Full-scan governance guard — the analyzer CHECK-rule tier of the
  * extension ladder (`injectCheckRule` via [[graft.GraftExtensions]]).
  *
  * At 100 TB the cheapest query is the one that never runs: a scan of a
  * guarded fact table with no predicate on its partition/time column is
  * almost always a mistake (a BI tool exploring `SELECT *`, a join that
  * lost its pushed filter), and it costs a full-table read before anyone
  * notices. The guard REJECTS such plans at analysis time — before a
  * single task launches — unless some Filter over a time column stands
  * between the query and the guarded relation.
  *
  * Conf surface (all session-settable, default OFF so the guard is
  * strictly opt-in):
  *   - `spark.graft.scanGuard.enabled`  — master switch
  *   - `spark.graft.scanGuard.paths`    — comma-separated path substrings
  *     naming the guarded relations
  *   - `spark.graft.scanGuard.columns`  — comma-separated column names
  *     accepted as a qualifying predicate (default `ts,event_date,day`)
  *
  * The walk is top-down with a "covered" flag: a Filter whose condition
  * references any qualifying column covers every guarded leaf BELOW it,
  * so `scan → filter(ts) → join → agg` passes while a bare
  * `scan → agg` throws. Subqueries are walked too (a guard a subquery
  * can bypass is not a guard).
  *
  * One deliberate exemption: a plan that IS just the guarded relation
  * (the `spark.read.parquet(...)` handle, nothing applied yet) passes —
  * Datasets are eagerly analyzed, so the handle must be constructible
  * for the caller to add the qualifying filter at all. Any operator on
  * top (project, aggregate, join, limit) makes it a query and the guard
  * applies.
  */
object ScanGuard {

  val EnabledKey = "spark.graft.scanGuard.enabled"
  val PathsKey = "spark.graft.scanGuard.paths"
  val ColumnsKey = "spark.graft.scanGuard.columns"

  def check(session: SparkSession)(plan: LogicalPlan): Unit = {
    if (!session.conf.get(EnabledKey, "false").toBoolean) return
    val guarded = session.conf.get(PathsKey, "").split(",").map(_.trim)
      .filter(_.nonEmpty).toSeq
    if (guarded.isEmpty) return
    val cols = session.conf.get(ColumnsKey, "ts,event_date,day")
      .split(",").map(_.trim.toLowerCase).filter(_.nonEmpty).toSet

    def guardedPath(l: LogicalRelation): Option[String] = l.relation match {
      case fs: HadoopFsRelation =>
        fs.location.rootPaths.map(_.toString)
          .find(p => guarded.exists(p.contains))
      case _ => None
    }

    // the bare-handle exemption: exactly the relation leaf (possibly
    // under its SubqueryAlias), no operators yet
    plan match {
      case _: LogicalRelation => return
      case org.apache.spark.sql.catalyst.plans.logical.SubqueryAlias(_, _: LogicalRelation) =>
        return
      case _ =>
    }

    def walk(node: LogicalPlan, covered: Boolean): Unit = {
      val nowCovered = covered || (node match {
        case f: Filter =>
          f.condition.references.exists(a => cols(a.name.toLowerCase))
        case _ => false
      })
      node match {
        case l: LogicalRelation if !nowCovered =>
          guardedPath(l).foreach { p =>
            throw new IllegalStateException(
              s"scan guard: query reads guarded table at $p without a filter " +
                s"on any of [${cols.toSeq.sorted.mkString(", ")}] — a full scan " +
                "of this relation is blocked by " +
                s"$EnabledKey; add a time predicate or unset the guard")
          }
        case _ =>
      }
      node.children.foreach(walk(_, nowCovered))
      // a filter above a subquery does NOT constrain the subquery's own
      // scan — subquery plans start uncovered
      node.subqueries.foreach(walk(_, covered = false))
    }
    walk(plan, covered = false)
  }
}
