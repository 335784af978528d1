package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, IntegerType, LongType}

/** Optimizer rule completing the SURVEY §7.3 custom-Catalyst ladder:
  * recognizes the NAIVE declarative top-k similarity plan —
  *
  * {{{
  *   Filter (rank <= k)
  *     Window [row_number() over (partition by qid
  *                                order by sim desc, nid asc) AS rank]
  *       Project [qid, nid, ArrayDot(qv, nv) AS sim]
  *         Join [Inner|Cross], optional NOT (qid = nid)
  * }}}
  *
  * — and rewrites it to the broadcast-heap [[KnnJoinPlan]] operator, so
  * a user who writes the textbook cross-join + window-rank formulation
  * gets the O(k)-memory zero-shuffle execution instead of the Q×N
  * materialization. The replacement aliases the operator's output back
  * to the original expression ids, so every downstream reference
  * resolves unchanged; `rank` is cast back to the window's int type.
  *
  * Rewrite fires only when the projection carries NO payload columns
  * beyond (qid, nid, sim) — extra attached columns would be lost, so
  * such plans are left to the regular planner.
  */
object KnnRewriteRule extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(LessThanOrEqual(rankRef: AttributeReference, Literal(k: Int, IntegerType)),
                    w @ Window(Seq(rankAlias @ Alias(WindowExpression(_: RowNumber, spec), _)),
                               _, _, child, _))
        if rankAlias.exprId == rankRef.exprId =>
      rewrite(f, w, rankAlias, spec, k, child).getOrElse(f)
  }

  /** Spark's own InsertWindowGroupLimit may already have slotted a
    * WindowGroupLimit below the Window by the time extension rules
    * run — transparent for our purposes (the kNN operator IS a group
    * limit), so unwrap it. */
  private def unwrapGroupLimit(p: LogicalPlan): LogicalPlan = p match {
    case WindowGroupLimit(_, _, _, _, child) => unwrapGroupLimit(child)
    case other => other
  }

  private def rewrite(filter: Filter, window: Window, rankAlias: Alias,
                      spec: WindowSpecDefinition, k: Int,
                      child: LogicalPlan): Option[LogicalPlan] = unwrapGroupLimit(child) match {
    case Project(projList, join @ Join(left, right, joinType, cond, _))
        if joinType == Inner || joinType == Cross =>
      for {
        // window: partitioned by exactly the query id, ordered by
        // (sim desc, neighbor id asc) — the kNN tie discipline
        qid <- spec.partitionSpec match {
          case Seq(a: AttributeReference) => Some(a)
          case _ => None
        }
        (simRef, nid) <- spec.orderSpec match {
          case Seq(SortOrder(s: AttributeReference, Descending, _, _),
                   SortOrder(n: AttributeReference, Ascending, _, _)) => Some((s, n))
          case _ => None
        }
        // projection: exactly (qid, nid, ArrayDot(...) AS sim)
        simAlias <- projList.collectFirst {
          case a @ Alias(ArrayDot(_, _), _) if a.exprId == simRef.exprId => a
        }
        if projList.size == 3
        if projList.exists { case a: AttributeReference => a.exprId == qid.exprId; case _ => false }
        if projList.exists { case a: AttributeReference => a.exprId == nid.exprId; case _ => false }
        ArrayDot(qv, nv) = simAlias.child
        // sides: qid/qv from the left child, nid/nv from the right
        if left.outputSet.contains(qid) && qv.references.subsetOf(left.outputSet)
        if right.outputSet.contains(nid) && nv.references.subsetOf(right.outputSet)
        if qid.dataType == LongType && nid.dataType == LongType
        if qv.dataType == ArrayType(DoubleType, true) ||
           qv.dataType == ArrayType(DoubleType, false)
        // join condition: none, or exactly the self-exclusion
        excludeSelf <- cond match {
          case None => Some(false)
          case Some(Not(EqualTo(a: AttributeReference, b: AttributeReference)))
              if Set(a.exprId, b.exprId) == Set(qid.exprId, nid.exprId) => Some(true)
          case _ => None
        }
      } yield {
        val out = Seq(
          AttributeReference("query_id", LongType, nullable = false)(),
          AttributeReference("rank", LongType, nullable = false)(),
          AttributeReference("neighbor_id", LongType, nullable = false)(),
          AttributeReference("sim", DoubleType, nullable = false)())
        val knn = KnnJoinPlan(
          Project(Seq(qid, Alias(qv, "v")()), left),
          Project(Seq(nid, Alias(nv, "v")()), right),
          k, excludeSelf, out)
        // re-expose under the ORIGINAL expression ids so parents of the
        // Filter keep resolving (rank cast back to the window's int)
        Project(Seq(
          Alias(out(0), qid.name)(exprId = qid.exprId),
          Alias(Cast(out(1), rankAlias.dataType), rankAlias.name)(exprId = rankAlias.exprId),
          Alias(out(2), nid.name)(exprId = nid.exprId),
          Alias(out(3), simAlias.name)(exprId = simAlias.exprId)), knn)
      }
    case _ => None
  }
}
