package graft

import graft.functions.UrlExpressions._
import graft.plans.CollapseCanonicalize
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ExtensionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("CollapseCanonicalize removes nested canonicalizations from the plan") {
    import spark.implicits._
    val df = Seq("HTTP://X.COM:80/a#f").toDF("u")
      .select(canonicalize_url(canonicalize_url($"u")).as("c1"),
        canonicalize_url(resolve_url($"u", lit("b"))).as("c2"))
    val optimized = CollapseCanonicalize(df.queryExecution.analyzed)
    val exprStr = optimized.toString
    // after collapsing, no expression tree contains two stacked canonicalizeurl
    assert(!exprStr.toLowerCase.contains("canonicalizeurl(canonicalizeurl"),
      s"nested canonicalize survived:\n$exprStr")
    assert(!exprStr.toLowerCase.contains("canonicalizeurl(resolveurl"),
      s"canonicalize(resolve) survived:\n$exprStr")
    // and the results are unchanged
    val row = df.head
    assert(row.getString(0) == "http://x.com/a")
    assert(row.getString(1) == "http://x.com/b")
  }

  test("extensions register SQL functions in a fresh session") {
    val s2 = spark.newSession()
    // builder-based withExtensions wiring is a cluster-deployment concern
    // (spark.sql.extensions=graft.plans.GraftExtensions); here assert the
    // extension object applies cleanly and the functions register.
    new graft.plans.GraftExtensions()(new org.apache.spark.sql.SparkSessionExtensions)
    graft.functions.UrlExpressions.register(s2)
    val r = s2.sql("SELECT resolve_url('http://a/b/c', '../z?b=1&a=2') AS r").head.getString(0)
    assert(r == "http://a/z?a=2&b=1")
  }

  test("literal URLs constant-fold at plan time (deterministic expressions)") {
    import spark.implicits._
    val df = Seq(1).toDF("x")
      .select(canonicalize_url(lit("HTTP://Y.COM:80/p?b=1&a=2#z")).as("c"))
    val plan = df.queryExecution.optimizedPlan.toString
    // ConstantFolding (+ local-relation conversion) evaluates the literal
    // at plan time: no canonicalizeurl call survives into execution
    assert(!plan.toLowerCase.contains("canonicalizeurl"),
      s"literal not folded:\n$plan")
    assert(df.head.getString(0) == "http://y.com/p?a=2&b=1")
  }
}
