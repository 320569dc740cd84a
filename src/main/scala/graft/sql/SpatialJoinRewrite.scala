package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/**
 * Optimizer rule (SURVEY.md §4.2 row "st_intersects join-condition
 * auto-rewrite"): an inner join whose ONLY condition is the PIP predicate
 * `st_intersects_xy(geom, lon, lat)` would plan as a nested-loop join —
 * O(|points|·|zones|). Rewrite it to the cell-prefix form the manual API
 * (SpatialJoins.pipJoin) uses:
 *
 *   points ⋈_{pip(g,x,y)} zones
 *     ⇒ (points + st_cellid(x,y,L)) ⋈_{cell = cover_cell ∧ pip(g,x,y)}
 *       (zones + explode(st_cover(g, L)))
 *
 * The added equi-key lets the planner pick hash joins (and AQE handle
 * sizing); the original predicate remains as the exact refine, so results
 * are identical. Injected via `spark.experimental.extraOptimizations` or
 * the [[GraftExtensions]] SparkSessionExtensions class.
 */
case class SpatialJoinRewrite(level: Int = 8) extends Rule[LogicalPlan]
    with PredicateHelper {

  /** First PIP-or-radius conjunct (the original predicate stays as the
    * exact refine either way). The optional 4th element is the dwithin
    * radius: the cover side then covers the d-EXPANDED envelope, exactly
    * SpatialJoins.dwithinJoin's manual form. The radius must not depend
    * on the POINT side (it feeds the geometry-side cover) — geometry-side
    * columns and foldable literals are both fine. */
  private def pipConjunct(cond: Expression): Option[(Expression, Expression, Expression, Option[Expression])] =
    splitConjunctivePredicates(cond).collectFirst {
      case StIntersectsXY(g, lon, lat) => (g, lon, lat, None)
      case StContainsXY(g, lon, lat)   => (g, lon, lat, None)
      case StDwithinXY(g, lon, lat, d) => (g, lon, lat, Some(d))
    }

  /** Already rewritten? (the added equi-key would match again → fixpoint guard) */
  private def alreadyRewritten(cond: Expression): Boolean =
    splitConjunctivePredicates(cond).exists {
      case EqualTo(a: AttributeReference, _) if a.name == "_pip_cell" => true
      case EqualTo(_, b: AttributeReference) if b.name == "_pip_cover_cell" => true
      case _ => false
    }

  /**
   * Does the join already carry an extractable equi-join key — an `a = b`
   * conjunct whose sides come one from each input? If so the planner will
   * pick a hash join on its own and this rule MUST NOT fire: it exists
   * solely to rescue joins that would otherwise plan as nested loops.
   * (Round-2 regression: the manual pipJoin already joins on its own cover
   * cell — named `cell`, so the name guard above missed it — and the rule
   * stacked a second explode(st_cover), a broadcast quadratic in cover
   * size. See VERDICT r2 "What's wrong #1".)
   */
  private def hasEquiJoinKey(left: LogicalPlan, right: LogicalPlan,
                             cond: Expression): Boolean = {
    def spansSides(a: Expression, b: Expression): Boolean =
      a.references.nonEmpty && b.references.nonEmpty &&
        ((a.references.subsetOf(left.outputSet) && b.references.subsetOf(right.outputSet)) ||
         (a.references.subsetOf(right.outputSet) && b.references.subsetOf(left.outputSet)))
    splitConjunctivePredicates(cond).exists {
      case EqualTo(a, b)       => spansSides(a, b)
      case EqualNullSafe(a, b) => spansSides(a, b)
      case _ => false
    }
  }

  /** Geometry × geometry conjunct (st_intersects / st_dwithin over two
    * geometry columns) — rescued to the BOTH-sides-cover form
    * (SpatialJoins.polyJoin / dwithinPolyJoin). */
  private def geomPairConjunct(cond: Expression): Option[(Expression, Expression, Option[Expression])] =
    splitConjunctivePredicates(cond).collectFirst {
      case StIntersects(a, b) => (a, b, None)
      case StDwithin(a, b, d) => (a, b, Some(d))
    }

  /**
   * Rewrite a geometry×geometry join: explode covers on BOTH sides and
   * equi-join on the cell. Unlike the point case (a point has exactly one
   * cell, so multiplicity is automatic), two covers can share several
   * cells — each candidate pair is therefore kept only at its CANONICAL
   * shared cell (`coverL = array_min(array_intersect(coverA, coverB))`),
   * which preserves the join's exact row multiplicity. The original
   * predicate stays as the exact refine.
   */
  private def rewriteGeomPair(j: Join, left: LogicalPlan, right: LogicalPlan,
                              cond: Expression, hint: JoinHint): LogicalPlan = {
    val (ga, gb, dOpt) = geomPairConjunct(cond).get
    val sides =
      if (ga.references.subsetOf(left.outputSet) && gb.references.subsetOf(right.outputSet))
        Some((ga, gb))
      else if (ga.references.subsetOf(right.outputSet) && gb.references.subsetOf(left.outputSet))
        Some((gb, ga)) // dwithin and intersects are symmetric in (a, b)
      else None
    sides match {
      case Some((gl, gr)) if dOpt.forall(_.foldable) =>
        val glCover = dOpt.fold(gl)(d => StExpand(gl, d))
        val attrL = AttributeReference("_pip_cell", LongType, nullable = false)()
        val attrR = AttributeReference("_pip_cover_cell", LongType, nullable = false)()
        val genL = Generate(Explode(StCover(glCover, Literal(level))),
          unrequiredChildIndex = Nil, outer = false, qualifier = None,
          generatorOutput = Seq(attrL), child = left)
        val genR = Generate(Explode(StCover(gr, Literal(level))),
          unrequiredChildIndex = Nil, outer = false, qualifier = None,
          generatorOutput = Seq(attrR), child = right)
        val canonical = EqualTo(attrL,
          ArrayMin(ArrayIntersect(StCover(glCover, Literal(level)),
            StCover(gr, Literal(level)))))
        val newCond = And(And(EqualTo(attrL, attrR), canonical), cond)
        Project(j.output, Join(genL, genR, Inner, Some(newCond), hint))
      case _ => j
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, Inner, Some(cond), hint)
        if !alreadyRewritten(cond) && !hasEquiJoinKey(left, right, cond) &&
           pipConjunct(cond).isEmpty && geomPairConjunct(cond).isDefined =>
      rewriteGeomPair(j, left, right, cond, hint)

    case j @ Join(left, right, Inner, Some(cond), hint)
        if !alreadyRewritten(cond) && !hasEquiJoinKey(left, right, cond) &&
           pipConjunct(cond).isDefined =>
      val (g, lon, lat, dOpt) = pipConjunct(cond).get
      val sides =
        if (g.references.subsetOf(right.outputSet) &&
            (lon.references ++ lat.references).subsetOf(left.outputSet))
          Some((left, right, false))
        else if (g.references.subsetOf(left.outputSet) &&
                 (lon.references ++ lat.references).subsetOf(right.outputSet))
          Some((right, left, true))
        else None
      sides match {
        case Some((ptSide, geomSide, flipped))
            if dOpt.forall(d => d.foldable || d.references.subsetOf(geomSide.outputSet)) =>
          val cellAlias = Alias(StCellId(lon, lat, Literal(level)), "_pip_cell")()
          val newPts = Project(ptSide.output :+ cellAlias, ptSide)
          val coverAttr = AttributeReference("_pip_cover_cell", LongType, nullable = false)()
          val coverTarget = dOpt.fold(g)(d => StExpand(g, d))
          val gen = Generate(Explode(StCover(coverTarget, Literal(level))),
            unrequiredChildIndex = Nil, outer = false, qualifier = None,
            generatorOutput = Seq(coverAttr), child = geomSide)
          val newCond = And(EqualTo(cellAlias.toAttribute, coverAttr), cond)
          val rewritten =
            if (flipped) Join(gen, newPts, Inner, Some(newCond), hint)
            else Join(newPts, gen, Inner, Some(newCond), hint)
          Project(j.output, rewritten)
        case _ => j // unmatched sides, or a radius depending on the point side
      }
  }
}

/** `spark.sql.extensions=org.apache.spark.sql.graft.GraftExtensions` —
  * injects the spatial-join rewrite (functions install via GraftFunctions). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => SpatialJoinRewrite())
  }
}
