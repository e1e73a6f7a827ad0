package graft.plans

import graft.functions.UrlExpressions
import graft.functions.UrlExpressions.{CanonicalizeUrl, ResolveUrl}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Catalyst optimizer rule: collapse nested URL canonicalizations.
  * `canonicalize_url` is idempotent (property-tested in PropertySpec) and
  * `resolve_url` already canonicalizes its output, so
  *   CanonicalizeUrl(CanonicalizeUrl(x))  →  CanonicalizeUrl(x)
  *   CanonicalizeUrl(ResolveUrl(b, r))    →  ResolveUrl(b, r)
  * This fires in real plans: the frontier stores canonical URLs, and
  * defensive re-canonicalization at operator boundaries would otherwise
  * run the parser twice per row. (Constant folding of literal URLs is
  * free — the expressions are deterministic non-stateful, so Catalyst's
  * ConstantFolding already evaluates them at plan time.)
  */
object CollapseCanonicalize extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case CanonicalizeUrl(inner @ CanonicalizeUrl(_)) => inner
      case CanonicalizeUrl(inner @ ResolveUrl(_, _)) => inner
    }
}

/** Session extensions: SQL-callable URL functions + the canonicalize
  * collapse rule. Register with
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.plans.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => CollapseCanonicalize)
    e.injectFunction(
      (new org.apache.spark.sql.catalyst.FunctionIdentifier("canonicalize_url"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[CanonicalizeUrl].getName, "canonicalize_url"),
        (es: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          CanonicalizeUrl(es.head)))
    e.injectFunction(
      (new org.apache.spark.sql.catalyst.FunctionIdentifier("resolve_url"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[ResolveUrl].getName, "resolve_url"),
        (es: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          ResolveUrl(es.head, es(1))))
  }
}
