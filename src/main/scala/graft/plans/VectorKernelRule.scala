package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.graftshims.{DotProduct, L2Norm}
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Rewrites the interpreted higher-order-function spellings of the two
  * vector kernels into their codegen'd native forms:
  *
  *  - `aggregate(zip_with(a, b, (x, y) -> x * y), 0.0, (acc, v) -> acc + v)`
  *    → `vec_dot(a, b)` ([[DotProduct]])
  *  - `sqrt(aggregate(v, 0.0, (acc, x) -> acc + x * x))`
  *    → `vec_l2norm(v)` ([[L2Norm]])
  *
  * `ArrayAggregate`/`ZipWith` are CodegenFallback — per-element
  * interpreted lambda dispatch plus a materialized zipped array — so on
  * embedding-scale data the rewrite is ~5× per row and, more
  * importantly, keeps the surrounding projection inside whole-stage
  * codegen. The rewrite is exactly semantics-preserving: the native
  * kernels return null for null arrays, unequal lengths (`zip_with`
  * pads with nulls, poisoning the fold), and null elements, and
  * accumulate in the same index order (IEEE addition is commutative,
  * so matching `acc + v` and `v + acc` is still bit-exact).
  *
  * Registered through [[graft.GraftExtensions]]
  * (`injectOptimizerRule`), the standard extension point a library
  * uses to add optimizations without forking Spark.
  */
object VectorKernelRule extends Rule[LogicalPlan] {

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  private def isZeroD(e: Expression): Boolean =
    e.foldable && (e.eval() match {
      case d: java.lang.Double => d.doubleValue == 0.0
      case _ => false
    })

  /** `(acc, v) -> acc + v` over exactly the two lambda variables. */
  private def isPlainSum(f: LambdaFunction): Boolean = f match {
    case LambdaFunction(
        Add(l: NamedLambdaVariable, r: NamedLambdaVariable, _),
        Seq(a: NamedLambdaVariable, v: NamedLambdaVariable), _) =>
      (l.exprId == a.exprId && r.exprId == v.exprId) ||
        (l.exprId == v.exprId && r.exprId == a.exprId)
    case _ => false
  }

  /** `(acc, x) -> acc + x * x`. */
  private def isSquareSum(f: LambdaFunction): Boolean = f match {
    case LambdaFunction(
        Add(acc: NamedLambdaVariable,
          Multiply(x1: NamedLambdaVariable, x2: NamedLambdaVariable, _), _),
        Seq(a: NamedLambdaVariable, x: NamedLambdaVariable), _) =>
      acc.exprId == a.exprId && x1.exprId == x.exprId && x2.exprId == x.exprId
    case _ => false
  }

  /** `(x, y) -> x * y` over exactly zip_with's two lambda variables. */
  private def isPairProduct(f: LambdaFunction): Boolean = f match {
    case LambdaFunction(
        Multiply(l: NamedLambdaVariable, r: NamedLambdaVariable, _),
        Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _) =>
      (l.exprId == x.exprId && r.exprId == y.exprId) ||
        (l.exprId == y.exprId && r.exprId == x.exprId)
    case _ => false
  }

  /** ArrayAggregate's default finish lambda, `acc -> acc`. */
  private def isIdentityFinish(f: Expression): Boolean = f match {
    case LambdaFunction(body: NamedLambdaVariable, Seq(a: NamedLambdaVariable), _) =>
      body.exprId == a.exprId
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Sqrt(ArrayAggregate(arg, zero, merge: LambdaFunction, finish))
          if isDoubleArray(arg) && isZeroD(zero) && isSquareSum(merge) &&
            isIdentityFinish(finish) =>
        L2Norm(arg)
      case ArrayAggregate(
            ZipWith(a, b, pair: LambdaFunction), zero, merge: LambdaFunction, finish)
          if isDoubleArray(a) && isDoubleArray(b) && isZeroD(zero) &&
            isPairProduct(pair) && isPlainSum(merge) && isIdentityFinish(finish) =>
        DotProduct(a, b)
    }
}
