package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.logical.{AddCheckConstraint, LogicalPlan}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2Relation, DataSourceV2ScanRelation, LeafV2CommandExec, V2CommandExec}
import graft.sources.{Changelog, GraftLog}

/** Plans `ALTER TABLE … ADD CONSTRAINT <n> CHECK (<expr>)` on graft
  * changelog tables. Spark's own `AddCheckConstraintExec` validates
  * existing rows by EXECUTING the scan child — a shape this table
  * cannot serve (the snapshot is a keyed merge-on-read plan resolved
  * by rule, not a row-serving scan; the same reason ResolveGraftLog
  * exists). This strategy replaces the whole command with the
  * engine's own exec: [[Changelog.addCheckConstraint]] resolves the
  * predicate against the LOGICAL schema, validates the head snapshot
  * through the library's resolved plan, and lands the properties
  * commit + marker. Non-graft tables fall through to Spark's
  * strategy untouched.
  */
case class GraftConstraintStrategy(spark: SparkSession)
    extends SparkStrategy {

  private def logTableIn(p: LogicalPlan): Option[GraftLog.LogTable] =
    p.collectFirst {
      case r: DataSourceV2Relation
          if r.table.isInstanceOf[GraftLog.LogTable] =>
        r.table.asInstanceOf[GraftLog.LogTable]
      case s: DataSourceV2ScanRelation
          if s.relation.table.isInstanceOf[GraftLog.LogTable] =>
        s.relation.table.asInstanceOf[GraftLog.LogTable]
    }

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case a: AddCheckConstraint =>
      logTableIn(a.child) match {
        case Some(table) =>
          GraftAddCheckConstraintExec(table,
            a.checkConstraint.name, a.checkConstraint.condition) :: Nil
        case None => Nil
      }
    case _ => Nil
  }
}

/** The add-constraint command over a changelog table: one library
  * call (predicate resolution + existing-row validation + the
  * properties commit and marker), no rows out — the V2CommandExec
  * discipline, so eager command execution runs it exactly once.
  */
case class GraftAddCheckConstraintExec(table: GraftLog.LogTable,
                                       constraintName: String,
                                       conditionSql: String)
    extends V2CommandExec with LeafV2CommandExec {

  override def output: Seq[Attribute] = Nil

  override protected def run(): Seq[InternalRow] = {
    Changelog.addCheckConstraint(session, table.opts.path,
      table.opts.keys, constraintName, conditionSql)
    Nil
  }
}
