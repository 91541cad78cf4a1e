package graft.rules

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}
import graft.expressions.CosineSim

/** Kernel-specialization rule (the `LikeSimplification` pattern): rewrite
  * the declarative composed cosine —
  * `CASE WHEN √Σa²·√Σb² = 0 THEN NULL ELSE Σaᵢbᵢ / (√Σa²·√Σb²)` built from
  * `transform`/`zip_with`/`aggregate` ([[graft.functions.VectorOps.cosine]])
  * — into the codegen'd [[CosineSim]] expression (measured 128× on the
  * interpreted-lambda form). Users writing the readable declarative shape
  * get the fast kernel automatically; anything that doesn't match the
  * shape exactly is left untouched.
  *
  * Injected through `SparkSessionExtensions.injectOptimizerRule`
  * ([[graft.GraftExtensions]]).
  */
object CosineFusion extends Rule[LogicalPlan] {

  /** `transform(arr, x -> cast(x as double))` over a float array → arr */
  private def castTransformArg(e: Expression): Option[Expression] = e match {
    case ArrayTransform(arr,
        LambdaFunction(Cast(_: NamedLambdaVariable, DoubleType, _, _), _, _))
        if arr.dataType.isInstanceOf[ArrayType] &&
          arr.dataType.asInstanceOf[ArrayType].elementType == FloatType =>
      Some(arr)
    case _ => None
  }

  /** `aggregate(zip_with(ta, tb, (x,y) -> x*y), 0.0, (acc,v) -> acc+v)` */
  private def dotArgs(e: Expression): Option[(Expression, Expression)] = e match {
    case ArrayAggregate(
        ZipWith(ta, tb,
          LambdaFunction(Multiply(_: NamedLambdaVariable, _: NamedLambdaVariable, _), _, _)),
        Literal(0.0, DoubleType),
        LambdaFunction(Add(_: NamedLambdaVariable, _: NamedLambdaVariable, _), _, _),
        _) =>
      for (a <- castTransformArg(ta); b <- castTransformArg(tb)) yield (a, b)
    case _ => None
  }

  /** `sqrt(aggregate(t, 0.0, (acc,v) -> acc + v*v))` → t's array */
  private def normArg(e: Expression): Option[Expression] = e match {
    case Sqrt(ArrayAggregate(t, Literal(0.0, DoubleType),
        LambdaFunction(
          Add(_: NamedLambdaVariable, Multiply(y1: NamedLambdaVariable, y2: NamedLambdaVariable, _), _),
          _, _),
        _)) if y1.exprId == y2.exprId =>
      castTransformArg(t)
    case _ => None
  }

  private def fuse(cw: CaseWhen): Option[Expression] = cw match {
    case CaseWhen(
        Seq((EqualTo(Multiply(na1, nb1, _), Literal(0.0, DoubleType)), nullBranch)),
        Some(Divide(dot, Multiply(na2, nb2, _), _)))
        if nullBranch.foldable && nullBranch.eval(null) == null =>
      for {
        (a, b) <- dotArgs(dot)
        a1 <- normArg(na1); b1 <- normArg(nb1)
        a2 <- normArg(na2); b2 <- normArg(nb2)
        if a.semanticEquals(a1) && a.semanticEquals(a2) &&
          b.semanticEquals(b1) && b.semanticEquals(b2)
      } yield CosineSim(a, b)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case cw: CaseWhen => fuse(cw).getOrElse(cw)
    }
}
