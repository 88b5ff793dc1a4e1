package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Optimizer rule: recognize the declarative higher-order-function
  * spellings of float-vector dot product / L2 norm and replace them with
  * the codegen'd native expressions.
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0.0, (acc, v) -> acc + v)
  *     ==> dot_f32(a, b)
  *   sqrt(aggregate(transform(a, x -> x * x), 0.0, (acc, v) -> acc + v))
  *     ==> norm_f32(a)
  *
  * Sound because DotF32/NormF32 reproduce the HOF chain exactly on EVERY
  * input: same accumulation order and precision (left-to-right, double),
  * and the same null semantics — ragged arrays and null elements yield
  * NULL (zip_with null-pads, `acc + NULL` poisons the aggregate), which
  * the native expressions implement directly. That full equivalence is
  * what lets this stay a session-wide rule over ArrayType(FloatType, _)
  * with any containsNull (parquet reads arrays as containsNull=true, so
  * a containsNull=false guard would turn the rule off on real tables).
  * Guarded to exact multiply/add/identity lambda shapes; anything else
  * is left untouched.
  *
  * Registered by [[GraftExtensions]] (injectOptimizerRule) or at runtime
  * via `spark.experimental.extraOptimizations`.
  */
object RewriteVectorHofs extends Rule[LogicalPlan] {

  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  /** x (possibly double-cast) resolving to one of the lambda vars. */
  private def asVar(e: Expression): Option[ExprId] = e match {
    case v: NamedLambdaVariable => Some(v.exprId)
    case Cast(v: NamedLambdaVariable, DoubleType, _, _) => Some(v.exprId)
    case _ => None
  }

  /** body is `u * v` (either order) over exactly the given two vars. */
  private def isPairProduct(body: Expression, u: NamedLambdaVariable, v: NamedLambdaVariable): Boolean =
    body match {
      case Multiply(l, r, _) =>
        (asVar(l), asVar(r)) match {
          case (Some(a), Some(b)) =>
            Set(a, b) == Set(u.exprId, v.exprId) || (u.exprId == v.exprId && a == u.exprId && b == u.exprId)
          case _ => false
        }
      case _ => false
    }

  /** body is `acc + v` (either order). */
  private def isAccumulate(body: Expression, acc: NamedLambdaVariable, v: NamedLambdaVariable): Boolean =
    body match {
      case Add(l, r, _) =>
        (asVar(l), asVar(r)) match {
          case (Some(a), Some(b)) => Set(a, b) == Set(acc.exprId, v.exprId)
          case _ => false
        }
      case _ => false
    }

  private def isIdentity(fin: Expression): Boolean = fin match {
    case LambdaFunction(body, Seq(arg: NamedLambdaVariable), _) =>
      asVar(body).contains(arg.exprId)
    case _ => false
  }

  private def isZeroDouble(e: Expression): Boolean = e match {
    case Literal(0.0, DoubleType) => true
    case _ => false
  }

  private val rewrite: PartialFunction[Expression, Expression] = {
    // sqrt(aggregate(transform(a, x -> x*x), 0.0, +)) => norm_f32(a)
    case Sqrt(ArrayAggregate(
        ArrayTransform(a, LambdaFunction(sq, Seq(x: NamedLambdaVariable), _)),
        zero,
        LambdaFunction(addBody, Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _),
        fin))
      if isFloatArray(a) && isZeroDouble(zero) && isPairProduct(sq, x, x) &&
        isAccumulate(addBody, acc, v) && isIdentity(fin) =>
      NormF32(a)

    // aggregate over ZipWith => dot_f32(a, b)
    case ArrayAggregate(
        ZipWith(a, b, LambdaFunction(mult, Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
        zero,
        LambdaFunction(addBody, Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _),
        fin)
      if isFloatArray(a) && isFloatArray(b) && isZeroDouble(zero) &&
        isPairProduct(mult, x, y) && isAccumulate(addBody, acc, v) && isIdentity(fin) =>
      DotF32(a, b)
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case e if rewrite.isDefinedAt(e) => rewrite(e)
    }
}
