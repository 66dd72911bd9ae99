package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality audit — the expectations/constraint layer
  * (dbt tests, Deequ-style checks) a pipeline runs before promoting a
  * table: null keys, domain violations, duplicate keys, orphaned
  * foreign keys. The reference runs exactly these checks imperatively
  * (skip-if-missing-stock `Summary.py:289–291`, dedup-before-upsert);
  * here they are one declarative report.
  *
  * Scale shapes: N predicate rules cost ONE scan total — each rule is a
  * conditional-sum aggregate, all N fold into a single combinable
  * aggregation (map-side partials, one 1-row exchange). The duplicate-
  * key check is one combinable groupBy on the key. The orphan-FK check
  * is a left-anti join on the key — the same shuffle any FK validation
  * needs, broadcast when the parent's key set fits. Nothing touches the
  * driver except the final ≤(N+2)-row report.
  */
object Quality {

  /** One-scan rule audit: each rule is (name, violation predicate);
    * output is one row per rule — (check, n_bad). All rules evaluate in
    * a single aggregation pass over the table.
    */
  def ruleAudit(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "at least one rule required")
    // rule names become column identifiers inside a stack() expr
    // string — restrict to a safe charset so a quote/backtick can't
    // silently change the expression
    rules.foreach { case (name, _) =>
      require(name.matches("[A-Za-z0-9_]+"),
        s"rule name must match [A-Za-z0-9_]+: '$name'")
    }
    require(rules.map(_._1).distinct.size == rules.size,
      "rule names must be unique")
    // coalesce: sum over an EMPTY table is NULL, but "no rows" means
    // zero violations (the duplicateKeys convention, and what the
    // count(*) FILTER oracle form returns)
    val aggs = rules.map { case (name, pred) =>
      coalesce(sum(when(pred, 1L).otherwise(0L)), lit(0L)).as(name)
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = rules
      .map { case (name, _) => s"'$name', `$name`" }.mkString(", ")
    one.select(expr(s"stack(${rules.size}, $stackArgs) AS (check, n_bad)"))
  }

  /** Duplicate-key audit: number of SURPLUS rows (rows beyond the first
    * per key — the count an upsert would collapse away).
    */
  def duplicateKeys(df: DataFrame, keys: Seq[String],
                    label: String): DataFrame = {
    require(keys.nonEmpty, "at least one key column required")
    df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("_n"))
      .agg(coalesce(sum(col("_n") - 1L), lit(0L)).as("n_bad"))
      .select(lit(label).as("check"), col("n_bad"))
  }

  /** Orphan-FK audit: NON-NULL child keys with no parent. A NULL child
    * key is "key missing", not "key orphaned" — it is the ruleAudit
    * null-key check's job (and SQL's NOT IN / NOT EXISTS drop NULL
    * child keys the same way), so a plain left_anti (which would count
    * every NULL-keyed row as an orphan) is explicitly narrowed here.
    */
  def orphans(child: DataFrame, childKey: String, parent: DataFrame,
              parentKey: String, label: String): DataFrame =
    child.select(col(childKey))
      .filter(col(childKey).isNotNull)
      .join(parent.select(col(parentKey).as(childKey)).distinct(),
        Seq(childKey), "left_anti")
      .agg(count(lit(1)).as("n_bad"))
      .select(lit(label).as("check"), col("n_bad"))
}
