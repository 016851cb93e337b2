package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Optimizer rule: rewrite the declarative higher-order-function dot
  * product
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0.0, (acc, v) -> acc + v)
  *
  * into the native codegen'd [[DotProduct]] expression. HOF lambdas are
  * interpreted per element; the native form runs a primitive loop inside
  * whole-stage codegen — same arithmetic order, so results are
  * bit-identical: both accumulate left-to-right, and both yield NULL when
  * the array lengths differ (`zip_with` null-pads the shorter array, so
  * the HOF form is NULL there; [[DotProduct]] mirrors that exactly).
  *
  * The match is deliberately conservative: exact shape only (Multiply
  * inside the zip lambda, literal 0.0 seed, Add-accumulator merge,
  * identity finish, all double-typed). Anything else is left untouched.
  */
object RewriteVectorHof extends Rule[LogicalPlan] {

  private object HofDot {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case ArrayAggregate(
          ZipWith(a, b,
            LambdaFunction(Multiply(x: NamedExpression, y: NamedExpression, _), Seq(lx, ly), _)),
          Literal(zero, DoubleType),
          LambdaFunction(mergeExpr, Seq(acc, v), _),
          LambdaFunction(finishExpr: NamedExpression, Seq(fin), _))
          if zero == 0.0 &&
            x.exprId == lx.exprId && y.exprId == ly.exprId &&
            isAccPlusV(mergeExpr, acc, v) &&
            finishExpr.exprId == fin.exprId &&
            a.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType] &&
            b.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType] =>
        Some((a, b))
      case _ => None
    }

    private def isAccPlusV(merge: Expression, acc: NamedExpression,
        v: NamedExpression): Boolean = merge match {
      case Add(l: NamedExpression, r: NamedExpression, _) =>
        (l.exprId == acc.exprId && r.exprId == v.exprId) ||
          (l.exprId == v.exprId && r.exprId == acc.exprId)
      case _ => false
    }
  }

  private def doubleArray(e: Expression): Boolean = e.dataType match {
    case org.apache.spark.sql.types.ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case HofDot(a, b) if doubleArray(a) && doubleArray(b) =>
        DotProduct(a, b)
    }
}
