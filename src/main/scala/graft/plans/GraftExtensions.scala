package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{LongType, StringType}

import graft.functions.WordCount
import graft.ops.TextOps

/** Catalyst optimizer rule (SURVEY.md §4.2 "optional future" item, made
  * real): rewrite the built-ins word-count combo
  *
  *   cast(size(filter(split(text, WsRe), t -> t <> '')) as bigint)
  *
  * into the fused native [[WordCount]] expression — one string pass, no
  * token array. The match is deliberately narrow: the split pattern must
  * be exactly TextOps.WsRe and the filter lambda exactly the non-empty
  * check, so semantics are preserved by construction.
  */
object FuseWordCount extends Rule[LogicalPlan] {

  private def isEmptyLiteral(e: Expression): Boolean = e match {
    case Literal(s, StringType) => s != null && s.toString.isEmpty
    case _ => false
  }

  private def isWsSplit(e: Expression): Option[Expression] = e match {
    case StringSplit(child, Literal(re, StringType), Literal(limit, _))
        if re != null && re.toString == TextOps.WsRe &&
          (limit == -1 || limit == null) =>
      Some(child)
    case _ => None
  }

  private def isNonEmptyPredicate(f: Expression): Boolean = f match {
    case LambdaFunction(Not(EqualTo(_: NamedLambdaVariable, lit)), _, _) => isEmptyLiteral(lit)
    case LambdaFunction(Not(EqualTo(lit, _: NamedLambdaVariable)), _, _) => isEmptyLiteral(lit)
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      // Size(_, true) (legacySizeOfNull) returns -1 for null input while
      // WordCount returns null, so the fusion is only semantics-preserving
      // for the non-legacy form.
      case Cast(Size(ArrayFilter(splitExpr, f), false), LongType, _, _)
          if isWsSplit(splitExpr).isDefined && isNonEmptyPredicate(f) =>
        WordCount(isWsSplit(splitExpr).get)
    }
}

/** Session extension wiring (`SparkSessionExtensions`) — install with
  * `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.plans.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => FuseWordCount)
    e.injectPlannerStrategy(_ => AsOfJoinStrategy)
  }
}
