package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

import graft.functions.DotProduct

/** Optimizer rule: rewrite the interpreted higher-order dot-product pattern
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0.0D, (acc, v) -> acc + v)
  *
  * into the codegen [[graft.functions.DotProduct]] expression. Higher-order
  * functions evaluate interpreted (no doGenCode) and allocate an
  * intermediate array per row, so users writing the idiomatic built-in
  * formulation silently pay ~100× in pairwise-join hot loops; after this
  * rule they get the generated loop automatically. Semantics are identical:
  * both accumulate left-to-right in double precision, and both yield NULL on
  * unequal-length inputs (zip_with's null padding poisons the sum;
  * DotProduct returns null on length mismatch to match).
  *
  * A `transform(x, v -> CAST(v AS DOUBLE))` wrapper around either input is
  * peeled off — DotProduct casts elements internally.
  *
  * Registration: `spark.experimental.extraOptimizations` on a live session,
  * or `withExtensions(GraftExtensions)` / `spark.sql.extensions` at build
  * time.
  */
object RewriteDotProduct extends Rule[LogicalPlan] {

  private def isIdentityLambda(f: Expression): Boolean = f match {
    case LambdaFunction(body: NamedLambdaVariable, Seq(arg: NamedLambdaVariable), _) =>
      body.exprId == arg.exprId
    case _ => false
  }

  /** Peel `transform(base, v -> cast(v as double))` → `base`. */
  private def peelDoubleCast(e: Expression): Expression = e match {
    case ArrayTransform(base,
        LambdaFunction(Cast(v: NamedLambdaVariable, DoubleType, _, _), Seq(arg: NamedLambdaVariable), _))
        if v.exprId == arg.exprId => base
    case other => other
  }

  private def isFloatingArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(l, r,
              LambdaFunction(Multiply(x: NamedLambdaVariable, y: NamedLambdaVariable, _),
                Seq(ax: NamedLambdaVariable, ay: NamedLambdaVariable), _)),
            Literal(0.0, DoubleType),
            LambdaFunction(Add(acc: NamedLambdaVariable, v: NamedLambdaVariable, _),
              Seq(aacc: NamedLambdaVariable, av: NamedLambdaVariable), _),
            finish)
          if x.exprId == ax.exprId && y.exprId == ay.exprId &&
            acc.exprId == aacc.exprId && v.exprId == av.exprId &&
            isIdentityLambda(finish) => {
        val (pl, pr) = (peelDoubleCast(l), peelDoubleCast(r))
        if (isFloatingArray(pl) && isFloatingArray(pr)) DotProduct(pl, pr)
        else ArrayAggregate(ZipWith(l, r,
          LambdaFunction(Multiply(x, y), Seq(ax, ay))),
          Literal(0.0, DoubleType),
          LambdaFunction(Add(acc, v), Seq(aacc, av)), finish)
      }
    }
}

/** Session-extension registration (`spark.sql.extensions=graft.plans.GraftExtensions`). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    e.injectOptimizerRule(_ => RewriteDotProduct)
}
