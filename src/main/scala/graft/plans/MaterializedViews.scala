package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Join, LogicalPlan, Project}
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
  *
  * Round 9 generalizations, both with real-engine precedent:
  *  - MULTI-MV SELECTION BY COST: a source may carry several rollups at
  *    different grains; among the candidates that are fresh, filter-
  *    compatible, and measure-complete, the rule substitutes the one
  *    with the FEWEST stored rows (the recorded build-time count) — the
  *    finest query still matches its minimal rollup, the coarse
  *    dashboard query its 6-row one.
  *  - JOIN-AWARE MATCHING: an MV may be a rollup over an inner equi-JOIN
  *    of two scans (fact ⋈ dim). The rule recognizes the same join tree
  *    (both source fingerprints must match; orientation-normalized join
  *    keys) under the Aggregate and substitutes the pre-joined rollup —
  *    at 100 TB this removes the join shuffle, not just the fact scan.
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
      files: Set[String] = Set.empty,
      // stored rollup size (build-time count): the COST key when several
      // MVs serve the same query; -1 = unknown (sorts last)
      rows: Long = -1L)

  /** A rollup over `leftSource ⋈ rightSource` on normalized equi-keys.
    * Both fingerprints gate freshness independently — either side's
    * ingest declines the rewrite. */
  final case class JoinMvDef(
      mvPath: String,
      leftFingerprint: String,
      rightFingerprint: String,
      groupCols: Set[String],
      measures: Map[String, String],
      rows: Long = -1L)

  // several MVs per source key, latest registration first; register
  // upserts by mvPath so re-registering a refreshed MV replaces itself
  private val defs =
    new java.util.concurrent.ConcurrentHashMap[String, List[MvDef]]()
  private val joinDefs =
    new java.util.concurrent.ConcurrentHashMap[String, List[JoinMvDef]]()

  def register(sourceKey: String, d: MvDef): Unit =
    defs.compute(sourceKey, (_, old) =>
      d :: Option(old).getOrElse(Nil).filterNot(_.mvPath == d.mvPath))
  def deregister(sourceKey: String): Unit = defs.remove(sourceKey)
  /** All MVs registered for the source, latest-first. */
  def lookup(sourceKey: String): List[MvDef] =
    Option(defs.get(sourceKey)).getOrElse(Nil)

  def registerJoin(joinKey: String, d: JoinMvDef): Unit =
    joinDefs.compute(joinKey, (_, old) =>
      d :: Option(old).getOrElse(Nil).filterNot(_.mvPath == d.mvPath))
  def lookupJoin(joinKey: String): List[JoinMvDef] =
    Option(joinDefs.get(joinKey)).getOrElse(Nil)

  def clear(): Unit = { defs.clear(); joinDefs.clear() }

  /** Orientation-free key for a two-source equi-join: sides are ordered
    * lexicographically by source key and the column pairs flipped to
    * match, so `a ⋈ b` and `b ⋈ a` land on the same registration. */
  def joinKey(leftKey: String, rightKey: String,
      pairs: Seq[(String, String)]): String = {
    val (lk, rk, ps) =
      if (leftKey <= rightKey) (leftKey, rightKey, pairs)
      else (rightKey, leftKey, pairs.map(_.swap))
    s"$lk⋈$rk⋈${ps.map { case (a, b) => s"$a=$b" }.sorted.mkString(",")}"
  }

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
      rewritePlain(agg).orElse(rewriteJoin(agg)).getOrElse(agg)
  }

  /** Single-source match: among the registered MVs that are fresh,
    * whose grain covers every filter below the aggregate, and that can
    * actually serve the aggregate, substitute the SMALLEST (stored
    * rows) — the cost-based selection when a source carries rollups at
    * several grains. */
  private def rewritePlain(agg: Aggregate): Option[LogicalPlan] =
    for {
      (leaf, conds) <- sourceOf(agg.child)
      (key, fp) <- sourceId(leaf)
      rewritten <- lookup(key).iterator
        .filter(_.fingerprint == fp) // freshness gate: file list / snapshot
        // a filter below the aggregate is MV-compatible iff it touches
        // only grain columns — it then replays against the rollup rows
        .filter(mv => conds.forall(
          _.references.forall(a => mv.groupCols.contains(a.name))))
        .toSeq
        .sortBy(mv => if (mv.rows < 0) Long.MaxValue else mv.rows)
        .iterator
        .flatMap(mv => tryRewrite(agg, conds, mv.mvPath, mv.groupCols, mv.measures))
        .nextOption()
    } yield rewritten

  /** Join-tree match: Aggregate over Inner-equi-Join of two clean scans
    * (filters above the join replay on grain columns; any filter BELOW
    * the join declines — the rollup pre-joined unfiltered sources). */
  private def rewriteJoin(agg: Aggregate): Option[LogicalPlan] = {
    def peel(p: LogicalPlan, conds: Seq[Expression]): Option[(Join, Seq[Expression])] =
      p match {
        case j: Join => Some((j, conds))
        case Project(pl, c) if pl.forall(_.isInstanceOf[AttributeReference]) =>
          peel(c, conds)
        case Filter(cond, c) => peel(c, cond +: conds)
        case _ => None
      }
    for {
      (j, conds) <- peel(agg.child, Nil)
      if j.joinType == Inner
      (ll, lcs) <- sourceOf(j.left)
      (rr, rcs) <- sourceOf(j.right)
      (lk, lfp) <- sourceId(ll)
      (rk, rfp) <- sourceId(rr)
      (pairs, lKeys, rKeys) <- eqPairs(j.condition, ll, rr)
      // below-join filters: ONLY the IsNotNull(join key) conjuncts the
      // optimizer itself infers from the inner equi-join are admissible
      // (null keys never match, so the rollup already excludes them);
      // anything else means the rollup pre-joined rows this query
      // filters out — decline. Admissibility is checked PER SIDE and by
      // exprId (AttributeSet), never by name: an IsNotNull on a non-key
      // column that merely shares its NAME with the other side's join
      // key is a real filter and must decline the rewrite.
      if lcs.forall(c => splitConjuncts(c).forall {
        case IsNotNull(a: AttributeReference) => lKeys.contains(a)
        case _ => false
      })
      if rcs.forall(c => splitConjuncts(c).forall {
        case IsNotNull(a: AttributeReference) => rKeys.contains(a)
        case _ => false
      })
      // normalize fingerprint orientation along with the key
      (fpA, fpB) = if (lk <= rk) (lfp, rfp) else (rfp, lfp)
      rewritten <- lookupJoin(joinKey(lk, rk, pairs)).iterator
        .filter(mv => mv.leftFingerprint == fpA && mv.rightFingerprint == fpB)
        .filter(mv => conds.forall(
          _.references.forall(a => mv.groupCols.contains(a.name))))
        .toSeq
        .sortBy(mv => if (mv.rows < 0) Long.MaxValue else mv.rows)
        .iterator
        .flatMap(mv => tryRewrite(agg, conds, mv.mvPath, mv.groupCols, mv.measures))
        .nextOption()
    } yield rewritten
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConjuncts(a) ++ splitConjuncts(b)
    case other => Seq(other)
  }

  /** The join condition as bare-attribute equi-pairs oriented (left
    * column, right column), plus the actual key attributes per side
    * (exprId-keyed — the admissibility check above must not conflate a
    * name collision across sides); anything else (residual predicates,
    * casts, null-safe equality) declines the match. */
  private def eqPairs(cond: Option[Expression], l: LogicalPlan, r: LogicalPlan)
      : Option[(Seq[(String, String)], AttributeSet, AttributeSet)] =
    cond.flatMap { c =>
      val lset = l.outputSet
      val rset = r.outputSet
      def split(e: Expression): Option[Seq[(Attribute, Attribute)]] = e match {
        case And(a, b) => for { x <- split(a); y <- split(b) } yield x ++ y
        case EqualTo(a: AttributeReference, b: AttributeReference) =>
          if (lset.contains(a) && rset.contains(b)) Some(Seq((a, b)))
          else if (lset.contains(b) && rset.contains(a)) Some(Seq((b, a)))
          else None
        case _ => None
      }
      split(c).map { ps =>
        (ps.map { case (a, b) => (a.name, b.name) },
          AttributeSet(ps.map(_._1)), AttributeSet(ps.map(_._2)))
      }
    }

  private def tryRewrite(agg: Aggregate, conds: Seq[Expression],
      mvPath: String, groupCols: Set[String],
      measures: Map[String, String]): Option[LogicalPlan] = {
    val mvPlan = SparkSession.active.read.parquet(mvPath).queryExecution.analyzed
    val mvRel = mvPlan.collectFirst { case l: LogicalRelation => l }.getOrElse(return None)
    val mvOut = mvRel.output.map(a => a.name -> a).toMap

    // grouping: bare columns of the MV grain only
    val newGe = agg.groupingExpressions.map {
      case a: AttributeReference if groupCols.contains(a.name) && mvOut.contains(a.name) =>
        mvOut(a.name)
      case _ => return None
    }

    def rewriteFn(fn: AggregateFunction): Option[Expression] = fn match {
      case s: Sum =>
        measureKey("sum", s.child).flatMap(measures.get).map { c =>
          Cast(Sum(mvOut(c)).toAggregateExpression(), fn.dataType)
        }
      case c: Count => c.children match {
        case Seq(Literal(1, IntegerType)) =>
          measures.get("cnt").map { col =>
            Coalesce(Seq(Cast(Sum(mvOut(col)).toAggregateExpression(), fn.dataType), Literal(0L)))
          }
        case _ => None
      }
      case m: Min =>
        measureKey("min", m.child).flatMap(measures.get).map { c =>
          Cast(Min(mvOut(c)).toAggregateExpression(), fn.dataType)
        }
      case m: Max =>
        measureKey("max", m.child).flatMap(measures.get).map { c =>
          Cast(Max(mvOut(c)).toAggregateExpression(), fn.dataType)
        }
      case _ => None
    }

    // rewrite a result-expression tree; None bubbles up on any
    // unsupported node so the whole Aggregate is left untouched
    def rewriteNode(e: Expression): Option[Expression] = e match {
      case a: AttributeReference =>
        if (groupCols.contains(a.name)) mvOut.get(a.name) else None
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
