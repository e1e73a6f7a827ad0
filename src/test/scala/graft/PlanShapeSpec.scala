package graft

import graft.model.RobotsRule
import graft.operators.Robots
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Plan-quality gates: the scale claims in README/SURVEY §4, asserted on
  * actual physical plans so regressions surface as test failures. */
class PlanShapeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("kernel plan has no single-partition exchange") {
    val frontier = BenchKernelRunner.frontierDf(spark, 10000, 4)
    val seen = BenchKernelRunner.seenDf(spark, 10000, 4)
    val bloom = seen.stat.bloomFilter("url_hash", 10000, 0.01)
    // build the kernel's plan (un-executed) by reproducing its stages
    val (fetch, _) = graft.operators.Politeness.select(
      frontier, BenchKernelRunner.benchRules, 100, 4)
    val ranked = graft.operators.Ranker.orderIsomorphicId(
      fetch, Seq(col("depth"), col("parent_ord"), col("link_index")), "ord", 0L, 4)
    val plan = ranked.queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"),
      s"single-partition exchange in kernel plan:\n${plan.take(3000)}")
  }

  test("robots compile constant-folds into the scan filter") {
    val rules = Seq(
      RobotsRule("a.com", "/", allow = true, 1),
      RobotsRule("a.com", "/private", allow = false, 1))
    import spark.implicits._
    val df = Seq(("a.com", "/private/x"), ("a.com", "/public"), ("b.com", "/private"))
      .toDF("host", "path")
      .filter(Robots.compile(rules, col("host"), col("path")))
    val got = df.collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("a.com", "/public"), ("b.com", "/private")))
    // the predicate is a pure expression tree — no join/aggregate nodes
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("Aggregate"),
      s"robots compile should be a filter only:\n$plan")
  }

  test("robotsJoin variant (large rule tables) agrees with compile") {
    import spark.implicits._
    val rules = Seq(
      RobotsRule("a.com", "/", allow = true, 1),
      RobotsRule("a.com", "/private", allow = false, 1),
      RobotsRule("a.com", "/private/open", allow = true, 1), // longest wins
      RobotsRule("c.com", "/", allow = false, 1))
    val rows = Seq(
      ("a.com", "/private/x"), ("a.com", "/private/open/y"), ("a.com", "/"),
      ("b.com", "/anything"), ("c.com", "/z"))
    val df = rows.toDF("host", "path")
    val viaCompile = df.filter(Robots.compile(rules, col("host"), col("path")))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val rulesDf = rules.toDF()
    val viaJoin = Robots.robotsJoin(df, rulesDf, "host", "path")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(viaCompile == viaJoin, s"compile=$viaCompile join=$viaJoin")
    assert(viaCompile == Set(
      ("a.com", "/private/open/y"), ("a.com", "/"), ("b.com", "/anything")))
  }

  test("a4 IVF plan broadcasts both the centroid table and the query set") {
    val plan = graft.operators.AnnOps.ivfTopK(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    // both small sides are hinted broadcast — the big vector table never
    // shuffles for the joins (only for the per-vector window)
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"no broadcast in IVF plan:\n${plan.take(3000)}")
  }

  test("d5 near-dup self-join shuffles on the LSH bucket key, not all pairs") {
    val df = graft.operators.DedupOps.embeddingNearDup(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"all-pairs product in near-dup plan:\n${plan.take(3000)}")
  }

  test("fetch join broadcasts the small frontier side when hinted") {
    import spark.implicits._
    val docs = (0 until 1000).map(i => (s"http://h/$i", i)).toDF("doc_id", "x")
    val frontier = Seq("http://h/1", "http://h/2").toDF("url")
    val joined = docs.join(broadcast(frontier), docs("doc_id") === frontier("url"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join:\n$plan")
  }
}
