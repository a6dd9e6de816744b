package graft.tables

import org.apache.spark.sql.Column

/** Clause model for the general (multi-clause) MERGE INTO
  * [[GraftTable.mergeIntoClauses]] — the superset of the reference's
  * restricted upsert translation (SURVEY.md §2.8 C5,
  * rules/PreprocessTableMergeInto.scala:17-92): conditional matched clauses,
  * explicit assignments, DELETE actions, and NOT MATCHED BY SOURCE.
  *
  * Clause conditions and assignment/insert values are Columns over the merge
  * join frame, where the current table row is aliased `_g_target` and the
  * source row `_g_source` (use [[GraftMerge.target]] / [[GraftMerge.source]]).
  * Clauses are evaluated in order; the first clause whose condition holds
  * applies (SQL MERGE semantics).
  */
object GraftMerge {
  val TargetAlias = "_g_target"
  val SourceAlias = "_g_source"

  /** Column of the current table row inside clause expressions. `name`
    * may be a nested path (`"st.a"`); quote a literal-dot column yourself
    * (`` "`a.b`" ``) — or use [[targetTop]] for a top-level name. */
  def target(name: String): Column =
    org.apache.spark.sql.functions.col(s"$TargetAlias.$name")

  /** Column of the source row inside clause expressions (see [[target]]
    * for path semantics). */
  def source(name: String): Column =
    org.apache.spark.sql.functions.col(s"$SourceAlias.$name")

  /** TOP-LEVEL table column by exact name — backtick-quoted so a column
    * whose name contains a literal dot is not re-parsed as nesting. The
    * internal merge rebuild uses this wherever it iterates schema field
    * names (mirrors NestedUpdate.topCol on the UPDATE side). */
  private[graft] def targetTop(name: String): Column =
    org.apache.spark.sql.functions.col(
      s"$TargetAlias.`${name.replace("`", "``")}`")

  private[graft] def sourceTop(name: String): Column =
    org.apache.spark.sql.functions.col(
      s"$SourceAlias.`${name.replace("`", "``")}`")
}

/** WHEN MATCHED (or WHEN NOT MATCHED BY SOURCE) clause:
  * `set = Some(assignments)` is UPDATE SET, `set = None` is DELETE. */
case class MergeMatchedClause(
    condition: Option[Column],
    set: Option[Map[String, Column]])

/** WHEN NOT MATCHED clause: INSERT with the given values (columns absent
  * from `values` insert NULL; primary-key columns must be covered — the
  * write-path invariant check rejects NULL keys). */
case class MergeNotMatchedClause(
    condition: Option[Column],
    values: Map[String, Column])
