package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{And, AttributeSet, ExpressionInfo, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

import graft.functions.VectorFunctions
import graft.plans.AsOfJoin.{AsOfJoinPlan, AsOfStrategy}

/** The library's cluster-wide integration point: set
  *
  * {{{ spark.sql.extensions=graft.GraftExtensions }}}
  *
  * (or `SparkSession.builder().withExtensions(new GraftExtensions)`)
  * and every session gets, with no per-session setup code:
  *
  *  - the custom Catalyst expressions as SQL functions (`cosine_sim`,
  *    `simhash64`, `shingle_hashes`, …) — one registry, shared with the
  *    session-local `VectorFunctions.registerSqlFunctions` path;
  *  - the as-of-join planner strategy, so [[graft.plans.AsOfJoin]]
  *    plans are executable without touching
  *    `spark.experimental.extraStrategies`;
  *  - [[PushFilterThroughAsOfJoin]], the optimizer rule that restores
  *    predicate pushdown across the custom join operator (Catalyst's
  *    own pushdown rules don't know the node, so without this a filter
  *    above an as-of join would scan both sides in full).
  *
  * This is the (reference-free) Spark-idiomatic packaging of what the
  * reference wires by hand at site boot
  * (`QueryService.asmx.cs:34-49`): capabilities arrive with the
  * session, not with imperative registration calls.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    VectorFunctions.sqlFunctionBuilders.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft", name), builder))
    }
    ext.injectPlannerStrategy(_ => AsOfStrategy)
    ext.injectOptimizerRule(_ => PushFilterThroughAsOfJoin)
    ext.injectOptimizerRule(_ => PruneColumnsThroughAsOfJoin)
  }
}

/** Push the LEFT-side conjuncts of a Filter below an [[AsOfJoinPlan]].
  *
  * Only left-side predicates are sound to push: each left row's match is
  * independent of other left rows, so dropping left rows early never
  * changes surviving rows' matches. A right-side predicate is NOT
  * pushable — filtering the right side before the join would let an
  * older right row become "the latest ≤ ts" where the unfiltered join
  * would have matched (then discarded) a newer one.
  *
  * At scale this is the difference between scanning the full left side
  * and scanning a pruned one: the pushed Filter reaches the parquet
  * reader via the normal Catalyst pushdown rules once it sits directly
  * on the scan side of the join.
  */
object PushFilterThroughAsOfJoin extends Rule[LogicalPlan]
    with PredicateHelper {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, j: AsOfJoinPlan) =>
      val (pushable, rest) = splitConjunctivePredicates(cond)
        .partition(p =>
          p.deterministic && p.references.subsetOf(j.left.outputSet))
      if (pushable.isEmpty) f
      else {
        val pushed = j.copy(left = Filter(pushable.reduce(And), j.left))
        if (rest.isEmpty) pushed else Filter(rest.reduce(And), pushed)
      }
  }
}

/** Column pruning through an [[AsOfJoinPlan]]: Catalyst's own
  * ColumnPruning rule treats unknown nodes conservatively, so without
  * this a narrow Project above an as-of join still scans EVERY column
  * of both inputs. Keep only the attributes the projection and the
  * join's key/timestamp expressions reference; the inserted child
  * Projects then flow into the normal pruning rules and reach the
  * parquet readers' ReadSchema. Exactness is trivial — dropped columns
  * are referenced by nothing above. */
object PruneColumnsThroughAsOfJoin extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case p @ Project(projList, j: AsOfJoinPlan) =>
      val needed = AttributeSet(projList.flatMap(_.references)) ++
        AttributeSet(Seq(j.leftKey, j.rightKey, j.leftTs, j.rightTs)
          .flatMap(_.references))
      def prune(child: LogicalPlan): LogicalPlan = {
        val kept = child.output.filter(needed.contains)
        if (kept.size == child.output.size) child else Project(kept, child)
      }
      val (newLeft, newRight) = (prune(j.left), prune(j.right))
      if (newLeft.eq(j.left) && newRight.eq(j.right)) p
      else Project(projList, j.copy(left = newLeft, right = newRight))
  }
}
