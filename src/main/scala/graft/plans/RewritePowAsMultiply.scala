package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Literal, Multiply, Pow}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Custom optimizer rule (the Rule[LogicalPlan] extension point, injected
  * via spark.experimental.extraOptimizations): rewrite pow(x, 2.0) to
  * x * x — one codegen'd multiply instead of a transcendental Math.pow
  * call per row. Exact for doubles: pow(x,2) and x*x are both correctly
  * rounded to the same value, so the rewrite is result-preserving and the
  * DuckDB oracle (which computes x*x directly) stays bit-identical. */
object RewritePowAsMultiply extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Pow(base, Literal(2.0, org.apache.spark.sql.types.DoubleType)) =>
        Multiply(base, base)
    }
}
