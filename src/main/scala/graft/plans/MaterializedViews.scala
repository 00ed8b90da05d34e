package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.IntegerType

/** Materialized-view auto-rewrite (the lakehouse pre-aggregation story):
  * a registered MV is a tiny stored rollup of a big fact table at a finer
  * grain than most queries ask for; the optimizer rule below recognizes an
  * `Aggregate` over the fact scan whose grouping columns are a SUBSET of
  * the MV's grain and whose measures are all derivable (SUM re-sums,
  * COUNT(*) re-sums the stored count, MIN/MAX re-min/max), and substitutes
  * a re-aggregation over the MV relation — the petabyte scan becomes a
  * KB-sized one, transparently, with the query text unchanged.
  *
  * Freshness is a hard gate, not a hope: the MV records an md5 fingerprint
  * of the source relation's exact file list at build time, and the rule
  * recomputes it from the candidate plan's own FileIndex — any added,
  * removed, or renamed source file makes the fingerprint differ and the
  * rewrite silently declines (the query computes from source, correct but
  * slower — the safe failure mode). At 100 TB the same contract holds
  * against a table format's snapshot id instead of a file list.
  *
  * Rewrite validity rules (all must hold, else decline):
  *  - every grouping expression is a bare column of the MV's grain;
  *  - every aggregate is non-DISTINCT, unfiltered, and one of
  *    SUM(col-or-cast), COUNT(1), MIN(col), MAX(col) with a registered
  *    MV measure — SUM/COUNT become SUM over the MV (COUNT coalesced to 0
  *    to keep the non-null contract), MIN/MAX stay MIN/MAX;
  *  - output aliases keep their original exprIds and dataTypes (SUM is
  *    cast back: re-summing widens decimal precision), so parent plan
  *    nodes never see the substitution.
  */
object MvCatalog {
  final case class MvDef(
      mvPath: String,
      fingerprint: String,
      groupCols: Set[String],
      // measure key (e.g. "sum:l_quantity:decimal(18,4)", "cnt",
      // "min:l_shipdate") -> MV output column name
      measures: Map[String, String],
      // exact source file list at build time: the staleness DIFF base —
      // incremental maintenance aggregates only (current ∖ files)
      files: Set[String] = Set.empty)

  private val defs = new java.util.concurrent.ConcurrentHashMap[String, MvDef]()

  def register(sourceKey: String, d: MvDef): Unit = defs.put(sourceKey, d)
  def deregister(sourceKey: String): Unit = defs.remove(sourceKey)
  def lookup(sourceKey: String): Option[MvDef] = Option(defs.get(sourceKey))
  def clear(): Unit = defs.clear()

  def sourceKey(lr: LogicalRelation): Option[String] = lr.relation match {
    case h: HadoopFsRelation => Some(h.location.rootPaths.map(_.toString).sorted.mkString(","))
    case _ => None
  }

  def fingerprint(lr: LogicalRelation): Option[String] = lr.relation match {
    case h: HadoopFsRelation =>
      val md = java.security.MessageDigest.getInstance("MD5")
      h.location.inputFiles.sorted.foreach(f => md.update(f.getBytes("UTF-8")))
      Some(md.digest().map("%02x".format(_)).mkString)
    case _ => None
  }

  def inputFiles(lr: LogicalRelation): Set[String] = lr.relation match {
    case h: HadoopFsRelation => h.location.inputFiles.toSet
    case _ => Set.empty
  }

  /** Source-relation extraction for the candidate Aggregate child: the scan
    * itself, reached through any stack of pure column-pruning Projects and
    * Filters (collected — a filter is MV-compatible iff it references only
    * grain columns, so it can replay against the rollup). */
  def sourceOf(plan: LogicalPlan): Option[(LogicalPlan, Seq[Expression])] = plan match {
    case lr: LogicalRelation => Some((lr, Nil))
    // by extraOptimizations time, V2 pushdown has turned the relation into
    // a scan relation — the scan itself knows whether substitution is safe
    case d: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
        if d.scan.isInstanceOf[graft.sources.GraftStoreScan] => Some((d, Nil))
    case Project(pl, child) if pl.forall(_.isInstanceOf[AttributeReference]) =>
      sourceOf(child)
    case Filter(cond, child) =>
      sourceOf(child).map { case (lr, cs) => (lr, cond +: cs) }
    case _ => None
  }

  /** (source key, freshness fingerprint) of a supported scan leaf. For
    * parquet relations the fingerprint is the exact file list; for
    * GraftStore tables it is the CURRENT snapshot version — and any pin
    * (version/time travel, incremental range, pushed filter, metadata agg,
    * provenance column, file subset) disqualifies the scan, because a
    * pinned or filtered read must never be served a current-version
    * rollup. */
  def sourceId(leaf: LogicalPlan): Option[(String, String)] = leaf match {
    case lr: LogicalRelation =>
      for { k <- sourceKey(lr); f <- fingerprint(lr) } yield (k, f)
    case d: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
      d.scan match {
        case sc: graft.sources.GraftStoreScan if sc.isMvSubstitutable =>
          Some((s"graftstore:${sc.scanPath}",
            s"v${graft.sources.GraftStore.readVersion(sc.scanPath)}"))
        case _ => None
      }
    case _ => None
  }

  /** Measure key for an aggregate child expression: a bare column or a
    * single cast of one (the decimal-sum parity convention). */
  def measureKey(prefix: String, e: Expression): Option[String] = e match {
    case a: AttributeReference => Some(s"$prefix:${a.name}")
    case c: Cast => c.child match {
      case a: AttributeReference => Some(s"$prefix:${a.name}:${c.dataType.sql.toLowerCase}")
      case _ => None
    }
    case _ => None
  }
}

object RewriteAggToMv extends Rule[LogicalPlan] {
  import MvCatalog._

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case agg: Aggregate =>
      (for {
        (leaf, conds) <- sourceOf(agg.child)
        (key, fp) <- sourceId(leaf)
        mv <- lookup(key)
        if fp == mv.fingerprint // freshness gate: file list / snapshot version
        // a filter below the aggregate is MV-compatible iff it touches
        // only grain columns — it then replays against the rollup rows
        if conds.forall(_.references.forall(a => mv.groupCols.contains(a.name)))
        rewritten <- tryRewrite(agg, conds, mv)
      } yield rewritten).getOrElse(agg)
  }

  private def tryRewrite(agg: Aggregate, conds: Seq[Expression], mv: MvDef): Option[LogicalPlan] = {
    val mvPlan = SparkSession.active.read.parquet(mv.mvPath).queryExecution.analyzed
    val mvRel = mvPlan.collectFirst { case l: LogicalRelation => l }.getOrElse(return None)
    val mvOut = mvRel.output.map(a => a.name -> a).toMap

    // grouping: bare columns of the MV grain only
    val newGe = agg.groupingExpressions.map {
      case a: AttributeReference if mv.groupCols.contains(a.name) && mvOut.contains(a.name) =>
        mvOut(a.name)
      case _ => return None
    }

    def rewriteFn(fn: AggregateFunction): Option[Expression] = fn match {
      case s: Sum =>
        measureKey("sum", s.child).flatMap(mv.measures.get).map { c =>
          Cast(Sum(mvOut(c)).toAggregateExpression(), fn.dataType)
        }
      case c: Count => c.children match {
        case Seq(Literal(1, IntegerType)) =>
          mv.measures.get("cnt").map { col =>
            Coalesce(Seq(Cast(Sum(mvOut(col)).toAggregateExpression(), fn.dataType), Literal(0L)))
          }
        case _ => None
      }
      case m: Min =>
        measureKey("min", m.child).flatMap(mv.measures.get).map { c =>
          Cast(Min(mvOut(c)).toAggregateExpression(), fn.dataType)
        }
      case m: Max =>
        measureKey("max", m.child).flatMap(mv.measures.get).map { c =>
          Cast(Max(mvOut(c)).toAggregateExpression(), fn.dataType)
        }
      case _ => None
    }

    // rewrite a result-expression tree; None bubbles up on any
    // unsupported node so the whole Aggregate is left untouched
    def rewriteNode(e: Expression): Option[Expression] = e match {
      case a: AttributeReference =>
        if (mv.groupCols.contains(a.name)) mvOut.get(a.name) else None
      case ae: AggregateExpression if !ae.isDistinct && ae.filter.isEmpty =>
        rewriteFn(ae.aggregateFunction)
      case _ =>
        val kids = e.children.map(rewriteNode)
        if (kids.exists(_.isEmpty)) None
        else Some(e.withNewChildren(kids.map(_.get)))
    }

    val newAe = agg.aggregateExpressions.map {
      case a: AttributeReference =>
        val r = mvOut.getOrElse(a.name, return None)
        Alias(r, a.name)(exprId = a.exprId)
      case al: Alias =>
        val r = rewriteNode(al.child).getOrElse(return None)
        Alias(r, al.name)(exprId = al.exprId)
      case _ => return None
    }

    // replay grain-column filters against the rollup (exprIds remapped)
    val newChild = if (conds.isEmpty) mvRel else {
      val remapped = conds.map(_.transform {
        case a: AttributeReference => mvOut.getOrElse(a.name, return None)
      })
      Filter(remapped.reduce(And), mvRel)
    }
    Some(agg.copy(groupingExpressions = newGe, aggregateExpressions = newAe, child = newChild))
  }
}
