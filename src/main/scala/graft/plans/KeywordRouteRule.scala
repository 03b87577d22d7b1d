package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, Cast, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, NamedExpression, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{BROADCAST, Filter, HintInfo, Join, JoinHint, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

import graft.functions.{Bm25QueryModel, Bm25Score}

/** OPT-IN optimizer rule — the lexical twin of [[AnnRouteRule]]: route
  * `keyword_score('terms') > 0`-guarded SQL onto a registered
  * [[graft.operators.Bm25Index]]'s bucket-pruned postings.
  *
  * The per-row [[Bm25Score]] kernel already avoids joins and shuffles,
  * but it still makes the scan read and TOKENIZE every row's text —
  * the measured cost driver at corpus scale (BASELINE.md: ~350 s per
  * ad-hoc query at 5M docs vs ~2 s pruned). When the session's active
  * `keyword_score` stats source is an index registered with a
  * `routeIdCol` ([[graft.Keyword.registerIndex]]) and
  * `spark.graft.ann.autoRoute=true`, a Filter whose condition
  * contains a positive-threshold guard (`keyword_score(...) > t`,
  * t ≥ 0 — the shape that makes join-matching and kernel-filtering
  * agree, since unmatched rows score 0) is rewritten:
  *
  *  - the guarded relation joins `Bm25Index.scores(terms)` — the
  *    pruned-postings score set, broadcast (bounded by the query
  *    terms' posting lists) — on `cast(idCol as bigint) = docid`;
  *  - every `keyword_score` occurrence (filter + projections above)
  *    becomes a reference to the joined `bm25_micros` column, which is
  *    bit-identical to the kernel score by construction (same stats,
  *    same literal math — pinned in KeywordScoreSpec);
  *  - the corpus scan then no longer references `text` at all, so
  *    column pruning drops it: the 100 TB table contributes an
  *    id-plus-projected-columns scan, and the tokenization disappears.
  *
  * Sound only when the index covers the scanned table (the
  * registerIndex(_, routeIdCol) contract); rows absent from the index
  * silently drop, exactly as a stale ANN index misses vectors. The
  * rewrite bails — returning the untouched plan — unless the final
  * output is bit-identical in names and exprIds (e.g. `SELECT *`
  * would leak the joined column). */
case class KeywordRouteRule(spark: SparkSession) extends Rule[LogicalPlan]
    with PredicateHelper {

  private val RoutedName = "__graft_routed_bm25"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!spark.conf.getOption("spark.graft.ann.autoRoute")
        .exists(_.toBoolean)) return plan
    val route = graft.Keyword.activeRoute(spark)
    if (route.isEmpty) return plan
    val (idx, idCol) = route.get
    var routed: Option[(Attribute, Bm25QueryModel)] = None
    val rewritten = plan.transformUp {
      case f @ Filter(cond, child) if routed.isEmpty && eligible(cond) &&
          child.output.exists(_.name.equalsIgnoreCase(idCol)) =>
        cond.collect { case b: Bm25Score => b.model }.distinct match {
          case Seq(model) =>
            // the OPTIMIZED subplan: this rule runs after the main
            // optimizer batches (EliminateResolvedHint included), so an
            // analyzed subtree would smuggle un-eliminated ResolvedHint
            // nodes (scores() broadcasts its df join) into planning
            val scores = idx.scores(model.terms).queryExecution.optimizedPlan
            val docid = scores.output.find(_.name == "docid").get
            val micros = scores.output.find(_.name == "bm25_micros").get
            val marker = Alias(micros, RoutedName)()
            val scoresProj = Project(
              Seq(docid, marker).map(_.asInstanceOf[NamedExpression]), scores)
            val idAttr = child.output
              .find(_.name.equalsIgnoreCase(idCol)).get
            val joined = Join(child, scoresProj, Inner,
              Some(EqualTo(Cast(idAttr, LongType), docid)),
              JoinHint(None, Some(HintInfo(strategy = Some(BROADCAST)))))
            val ref = marker.toAttribute
            routed = Some((ref, model))
            Filter(substitute(cond, model, ref), joined)
          case _ => f // several distinct queries in one filter: bail
        }
      case p if routed.isDefined &&
          p.children.exists(_.output.exists(
            _.exprId == routed.get._1.exprId)) &&
          p.expressions.exists(_.exists(_.isInstanceOf[Bm25Score])) =>
        val (ref, model) = routed.get
        p.transformExpressions {
          case b: Bm25Score if b.model == model => ref
        }
    }
    routed match {
      // accept only an output-preserving rewrite: same attributes, and
      // the internal joined column pruned away by a projection above
      case Some((ref, _))
        if rewritten.output.map(a => (a.name, a.exprId)) ==
             plan.output.map(a => (a.name, a.exprId)) &&
           !rewritten.output.exists(_.exprId == ref.exprId) =>
        // this rule runs AFTER the ColumnPruning batch, and the new
        // join blocks physical-planning projection pruning
        // (PhysicalOperation stops at joins) — so the corpus scan
        // would still read `text`, forfeiting the rewrite's point.
        // Re-run pruning over the rewritten plan to push a pruned
        // Project under the join.
        org.apache.spark.sql.catalyst.optimizer.CollapseProject(
          org.apache.spark.sql.catalyst.optimizer.ColumnPruning(rewritten))
      case _ => plan
    }
  }

  /** A conjunct that makes join-matching equal kernel-filtering:
    * unmatched rows kernel-score 0 (or null for null text — dropped by
    * both), so a `score > t, t ≥ 0` (or `score ≥ t, t > 0`) guard
    * excludes exactly the rows the inner join would drop. */
  private def eligible(cond: Expression): Boolean =
    splitConjunctivePredicates(cond).exists {
      case GreaterThan(_: Bm25Score, r) => foldsTo(r, minInclusive = 0L)
      case GreaterThanOrEqual(_: Bm25Score, r) => foldsTo(r, 1L)
      case LessThan(l, _: Bm25Score) => foldsTo(l, 0L)
      case LessThanOrEqual(l, _: Bm25Score) => foldsTo(l, 1L)
      case _ => false
    }

  private def foldsTo(e: Expression, minInclusive: Long): Boolean =
    e.foldable && (e.eval() match {
      case i: Int => i >= minInclusive
      case l: Long => l >= minInclusive
      case _ => false
    })

  private def substitute(cond: Expression, model: Bm25QueryModel,
      ref: Attribute): Expression =
    cond.transform { case b: Bm25Score if b.model == model => ref }
}
