package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Alias, ExprId, WindowExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project, Window}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** COLUMN-LEVEL LINEAGE extraction from any engine query — the data-
  * catalog feed every governed warehouse maintains (the reference's
  * BigQuery estate surfaces exactly this in Dataplex): for each output
  * column of a DataFrame, which physical source columns feed its VALUE.
  * The walk is pure plan metadata — the analyzed `LogicalPlan` already
  * carries the full expression graph — so lineage costs zero data work
  * at any table size and can run against a 100 TB pipeline's plan as a
  * pre-flight step.
  *
  * Semantics: VALUE flow only. A column's lineage is the transitive leaf
  * references of the expression that produces it (through Project /
  * Aggregate / Window aliases); join keys and filter predicates steer
  * WHICH rows flow but put no bytes in the column, so they are not
  * lineage here — the standard catalog convention. Outputs with no leaf
  * reference (e.g. `COUNT(*)`, literals) have no source rows.
  */
object ColumnLineage {

  /** (output column, source table, source column) triples, one per
    * distinct source column feeding the output, sorted for determinism.
    * Source tables are named by their file relation's root path basename
    * (minus a `.parquet` suffix) — the fixture layout's table name.
    */
  def of(df: DataFrame): Seq[(String, String, String)] = {
    val plan = df.queryExecution.analyzed
    val traced = trace(plan)
    plan.output.flatMap { a =>
      traced.getOrElse(a.exprId, Set.empty).toSeq.sorted
        .map { case (t, c) => (a.name, t, c) }
    }.sorted
  }

  private def tableName(l: LogicalRelation): String = l.relation match {
    case fs: HadoopFsRelation =>
      val base = fs.location.rootPaths.head.getName
      base.stripSuffix(".parquet")
    case other => other.toString
  }

  /** exprId → the set of (table, column) leaves whose values feed it. */
  private def trace(plan: LogicalPlan): Map[ExprId, Set[(String, String)]] = {
    val fromChildren: Map[ExprId, Set[(String, String)]] =
      plan.children.map(trace).foldLeft(Map.empty[ExprId, Set[(String, String)]])(_ ++ _)
    def resolve(refs: Iterable[ExprId]): Set[(String, String)] =
      refs.flatMap(id => fromChildren.getOrElse(id, Set.empty[(String, String)])).toSet
    plan match {
      case l: LogicalRelation =>
        l.output.map(a => a.exprId -> Set((tableName(l), a.name))).toMap
      case p: Project =>
        fromChildren ++ p.projectList.collect {
          case a: Alias => a.exprId -> resolve(a.child.references.map(_.exprId))
        }
      case ag: Aggregate =>
        fromChildren ++ ag.aggregateExpressions.collect {
          case a: Alias => a.exprId -> resolve(a.child.references.map(_.exprId))
        }
      case w: Window =>
        // only the window FUNCTION's inputs are value flow; the
        // partition/order spec steers which rows enter the frame — the
        // same row-steering class as join keys and filters
        fromChildren ++ w.windowExpressions.collect {
          case a @ Alias(we: WindowExpression, _) =>
            a.exprId -> resolve(we.windowFunction.references.map(_.exprId))
          case a: Alias => a.exprId -> resolve(a.child.references.map(_.exprId))
        }
      // joins, filters, sorts, limits, aliases: attributes pass through
      // unchanged, and predicates/keys are row-steering, not value flow
      case _ => fromChildren
    }
  }
}
