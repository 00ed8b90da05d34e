package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.UnresolvedTableValuedFunction
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.types.{IntegerType, LongType, StringType}

import graft.sources.GraftCatalog

/** `SELECT … FROM table_changes('cat.t', from [, to])` — the pure-SQL
  * face of the change feed (round 15; the Delta `table_changes` TVF
  * shape). The option-read form (`changesFrom`/`changesTo`) needs a
  * DataFrameReader; this rule lets a SQL-only consumer (dashboards, dbt
  * models, scheduled audits) read the same feed: it rewrites the
  * unresolved TVF into the EXACT change-feed relation the reader API
  * builds — same cdfFileDiffs planning, same `_change_type` /
  * `_commit_version` columns, same op-header honesty (OPTIMIZE silent,
  * overwrite loud) — so there is one CDF implementation with two doors.
  *
  * Args: table name as a string literal, `'cat.t'` (explicitly
  * catalog-qualified) or `'t'` (resolved against the session's CURRENT
  * catalog — which must be a graft catalog); `from` and optional `to`
  * as integer version literals with the reader options' exclusive-from
  * / inclusive-to semantics. Non-graft names fall through untouched so
  * another source's TVF of the same name could still resolve. */
case class GraftTableChangesRule(session: SparkSession) extends Rule[LogicalPlan] {

  private def graftCatalog(name: String): Option[GraftCatalog] =
    try session.sessionState.catalogManager.catalog(name) match {
      case g: GraftCatalog => Some(g)
      case _ => None
    } catch { case scala.util.control.NonFatal(_) => None }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case u: UnresolvedTableValuedFunction
          if u.name.map(_.toLowerCase(java.util.Locale.ROOT))
            .lastOption.contains("table_changes") &&
            u.name.length <= 2 && resolveArgs(u).isDefined =>
        val (path, from, to) = resolveArgs(u).get
        val reader = session.read.format("graft.sources.GraftStore")
          .option("path", path)
          .option("changesFrom", from.toString)
        to.foreach(t => reader.option("changesTo", t.toString))
        SubqueryAlias("table_changes", reader.load().queryExecution.analyzed)
    }

  /** (table path, from, to) when the TVF call addresses a graft table
    * with literal args; None lets the node fall through untouched. */
  private def resolveArgs(u: UnresolvedTableValuedFunction)
    : Option[(String, Long, Option[Long])] = {
    if (u.functionArgs.length < 2 || u.functionArgs.length > 3) return None
    val table = u.functionArgs.head match {
      case Literal(s, StringType) if s != null => s.toString
      case _ => return None
    }
    def asLong(e: org.apache.spark.sql.catalyst.expressions.Expression)
      : Option[Long] = e match {
      case Literal(v: Int, IntegerType) => Some(v.toLong)
      case Literal(v: Long, LongType) => Some(v)
      case _ => None
    }
    val from = asLong(u.functionArgs(1)).getOrElse(return None)
    val to =
      if (u.functionArgs.length == 3)
        Some(asLong(u.functionArgs(2)).getOrElse(return None))
      else None
    val parts = table.split('.')
    val (g, ident) =
      if (parts.length >= 2 && graftCatalog(parts.head).isDefined)
        (graftCatalog(parts.head).get,
          Identifier.of(parts.tail.init, parts.last))
      else {
        val cur = session.sessionState.catalogManager.currentCatalog.name()
        graftCatalog(cur) match {
          case Some(gc) => (gc, Identifier.of(parts.init, parts.last))
          case None => return None
        }
      }
    Some((g.tablePath(ident), from, to))
  }
}
