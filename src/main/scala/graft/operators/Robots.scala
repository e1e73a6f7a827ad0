package graft.operators

import graft.model.RobotsRule
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** robots.txt rules compiled to Catalyst filter predicates (north_rule;
  * reference analog: colly's temoto/robotstxt integration, go.mod:22,
  * active because IgnoreRobotsTxt defaults to false at crawler.go:76).
  *
  * Longest-prefix-match-wins over the URL path. The rule set is driver
  * resident (robots tables are tiny next to the frontier — even 10^7 hosts
  * × a few rules fit, and the compiled predicate constant-folds into
  * whole-stage codegen, so the frontier side pays zero shuffle). A
  * join-based variant ([[robotsJoin]]) covers the degenerate case of a
  * rule set too large to compile.
  */
object Robots {

  /** Compile rules into a Boolean Column over (host, path).
    * For each host, conditions are tested longest-prefix-first, so the
    * first hit IS the longest match; hosts without rules are allowed. */
  def compile(rules: Seq[RobotsRule], host: Column, path: Column): Column = {
    val byHost = rules.groupBy(_.host)
    byHost.foldLeft(lit(true)) { case (acc, (h, hostRules)) =>
      val ordered = hostRules.sortBy(-_.path_prefix.length)
      val hostDecision = ordered.foldRight(lit(true)) { (r, elseCol) =>
        when(startswith(path, lit(r.path_prefix)), lit(r.allow)).otherwise(elseCol)
      }
      when(host === lit(h), hostDecision).otherwise(acc)
    }
  }

  /** Per-host politeness budget from crawl_delay (FIXTURES.md §3):
    * budget = max(1, hostBudget / max(1, crawl_delay)); hosts without a
    * rule get hostBudget. Compiled to a Column the same way. */
  def budgetColumn(rules: Seq[RobotsRule], host: Column, hostBudget: Int): Column = {
    val delays: Map[String, Int] =
      rules.groupBy(_.host).map { case (h, rs) => h -> rs.map(_.crawl_delay).max }
    delays.foldLeft(lit(hostBudget)) { case (acc, (h, d)) =>
      when(host === lit(h), lit(math.max(1, hostBudget / math.max(1, d)))).otherwise(acc)
    }
  }

  /** Join-based longest-prefix match for rule sets too large for the
    * driver: broadcast the rules, keep the longest matching prefix per URL
    * via max_by, allow URLs with no matching rule. Returns df filtered to
    * allowed rows (same semantics as [[compile]]). */
  def robotsJoin(df: org.apache.spark.sql.DataFrame, rulesDf: org.apache.spark.sql.DataFrame,
      hostCol: String, pathCol: String): org.apache.spark.sql.DataFrame = {
    val joined = df.join(broadcast(rulesDf),
      df(hostCol) === rulesDf("host") && startswith(df(pathCol), rulesDf("path_prefix")),
      "left_outer")
    val keys = df.columns.map(df(_))
    joined
      .groupBy(keys: _*)
      .agg(max_by(coalesce(col("allow"), lit(true)),
        coalesce(length(col("path_prefix")), lit(-1))).as("__allow"))
      .filter(col("__allow"))
      .drop("__allow")
  }
}
