package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.UnresolvedTableValuedFunction
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.types.{IntegerType, LongType, StringType}

import graft.sources.{GraftCatalog, GraftStore}

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
  * catalog — which must be a graft catalog). `from` and optional `to`
  * are each EITHER an integer version literal or a string timestamp
  * literal (UTC, `'yyyy-MM-dd HH:mm:ss[.fff]'`), with Delta's
  * `table_changes` boundary semantics — both INCLUSIVE: `from` names
  * the first version whose changes are emitted (the reader options'
  * exclusive-from takes `from - 1`; porting Delta SQL must not lose
  * the start version — round-16 fix of the r15 off-by-one), `to` the
  * last. A timestamp `from` resolves to the EARLIEST snapshot committed
  * at or after it, a timestamp `to` to the LATEST committed at or
  * before it (the Delta resolution rule; same `!ts=` commit index
  * TIMESTAMP AS OF consults). Non-graft names — including a 2-part
  * call whose qualifier is not a graft catalog — fall through
  * untouched so another source's TVF of the same name still resolves. */
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
            u.name.length <= 2 &&
            // a qualified call must name a GRAFT catalog — never hijack
            // `othercat.table_changes(…)` aimed at another source just
            // because the string arg happens to resolve here
            (u.name.length == 1 || graftCatalog(u.name.head).isDefined) =>
        resolveArgs(u) match {
          case Some((path, fromExcl, to)) =>
            val reader = session.read.format("graft.sources.GraftStore")
              .option("path", path)
              .option("changesFrom", fromExcl.toString)
            to.foreach(t => reader.option("changesTo", t.toString))
            SubqueryAlias("table_changes", reader.load().queryExecution.analyzed)
          case None => u
        }
    }

  /** UTC millis for a `'yyyy-MM-dd HH:mm:ss[.fff]'` literal, None if the
    * string doesn't parse as a timestamp. */
  private def parseTsMillis(s: String): Option[Long] =
    org.apache.spark.sql.catalyst.util.DateTimeUtils.stringToTimestamp(
      org.apache.spark.unsafe.types.UTF8String.fromString(s),
      java.time.ZoneOffset.UTC).map(micros => Math.floorDiv(micros, 1000L))

  /** (table path, exclusive-from for the reader option, inclusive-to)
    * when the TVF call addresses a graft table with literal args; None
    * lets the node fall through untouched. Boundary args resolve
    * per-arg: integer = version (inclusive), string = UTC timestamp
    * resolved through the commit-timestamp index. */
  private def resolveArgs(u: UnresolvedTableValuedFunction)
    : Option[(String, Long, Option[Long])] = {
    if (u.functionArgs.length < 2 || u.functionArgs.length > 3) return None
    val table = u.functionArgs.head match {
      case Literal(s, StringType) if s != null => s.toString
      case _ => return None
    }
    val parts = table.split('.')
    val (g, ident) =
      graftCatalog(parts.head) match {
        case Some(gc) if parts.length >= 2 =>
          (gc, Identifier.of(parts.tail.init, parts.last))
        case _ =>
          val cur = session.sessionState.catalogManager.currentCatalog.name()
          graftCatalog(cur) match {
            case Some(gc) => (gc, Identifier.of(parts.init, parts.last))
            case None => return None
          }
      }
    val path = g.tablePath(ident)
    // the name addresses a graft table: from here an unresolvable
    // boundary arg is the USER's error and throws loudly (falling
    // through would surface as an unrelated "could not resolve TVF")
    def boundary(e: org.apache.spark.sql.catalyst.expressions.Expression,
        isFrom: Boolean): Option[Long] = e match {
      case Literal(v: Int, IntegerType) => Some(v.toLong)
      case Literal(v: Long, LongType) => Some(v)
      case Literal(s, StringType) if s != null =>
        val ms = parseTsMillis(s.toString).getOrElse(throw new IllegalArgumentException(
          s"table_changes: '$s' is not a version or UTC timestamp literal"))
        val commits = GraftStore.commitTimestamps(path)
        if (isFrom)
          // earliest snapshot committed at or after the instant
          Some(commits.find(_._2 >= ms).map(_._1).getOrElse(
            throw new IllegalArgumentException(
              s"table_changes: no commit at or after timestamp '$s' at $path")))
        else
          // latest snapshot committed at or before the instant
          Some(commits.filter(_._2 <= ms).lastOption.map(_._1).getOrElse(
            throw new IllegalArgumentException(
              s"table_changes: no commit at or before timestamp '$s' at $path")))
      case _ => None
    }
    val from = boundary(u.functionArgs(1), isFrom = true).getOrElse(return None)
    val to =
      if (u.functionArgs.length == 3)
        Some(boundary(u.functionArgs(2), isFrom = false).getOrElse(return None))
      else None
    // inclusive `from` → the reader option's exclusive-from; version 0
    // (the empty CREATE snapshot) has no changes, so the clamp at 0 is
    // content-neutral
    Some((path, math.max(0L, from - 1L), to))
  }
}
