package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode
import java.nio.file.{Files, Paths}

/** Writes PLANS.md: `explain("formatted")` for the plans that carry the
  * scale claims (pushdown/pruning on the scan, broadcast on the small
  * side, no single-partition exchange in the kernel) so reviewers can see
  * the physical shape without running anything.
  *
  * Usage: `sbt "runMain graft.PlanDump [sfDir]"` (default sf0.001).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def fmt(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.explainString(FormattedMode)

    val kernel = {
      val frontier = BenchKernelRunner.frontierDf(spark, 10000, 4)
      val (fetch, _) = operators.Politeness.select(
        frontier, BenchKernelRunner.benchRules, 100, 4)
      operators.Ranker.orderIsomorphicId(
        fetch, Seq(org.apache.spark.sql.functions.col("depth"),
          org.apache.spark.sql.functions.col("parent_ord"),
          org.apache.spark.sql.functions.col("link_index")), "ord", 0L, 4)
    }

    // The LSM seen-state anti-join (SURVEY §7.5(4)): candidates exchange
    // ONCE into the bucket partitioning, then the whole piece chain joins
    // with zero further exchanges and zero sorts on the seen side (the
    // pieces are retained pre-partitioned + pre-sorted). AQE's final plan
    // is what matters, so execute before dumping.
    val seenPlan = {
      import org.apache.spark.sql.functions.{col, xxhash64}
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val seen = new plans.SeenState(spark, buckets = 4, useCuckoo = false,
        expectedItems = 10000L, fpp = 0.01, compactAt = 8)
      try {
        seen.bootstrap(spark.range(0, 1000).select(xxhash64(col("id")).as("url_hash"),
          col("id").cast("string").as("url")))
        seen.addWave(spark.range(1000, 1200).select(xxhash64(col("id")).as("url_hash")))
        seen.addWave(spark.range(1200, 1400).select(xxhash64(col("id")).as("url_hash")))
        val out = seen.antiJoin(
          spark.range(500, 2000).select(xxhash64(col("id")).as("url_hash")))
        out.collect() // force the final AQE plan
        out.queryExecution.explainString(FormattedMode)
      } finally {
        seen.close() // ADVICE r3: must run even when collect/explain throws
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      }
    }

    // The production wave-dedup plan (SeenState.freshAndConfirmed): ONE
    // candidate exchange into the bucket partitioning, THEN the layered
    // prefilter probe (MightContainLong over the FileBank base + delta
    // broadcasts) runs post-exchange — task p faults in only bucket p's
    // image, so executor residency is O(seen/B). Filter-negatives skip
    // the exact anti-join chain entirely.
    val probePlan = {
      import org.apache.spark.sql.functions.{col, xxhash64}
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val seen = new plans.SeenState(spark, buckets = 4, useCuckoo = false,
        expectedItems = 10000L, fpp = 0.01, compactAt = 8)
      try {
        seen.bootstrap(spark.range(0, 1000).select(xxhash64(col("id")).as("url_hash"),
          col("id").cast("string").as("url")))
        seen.addWave(spark.range(1000, 1200).select(xxhash64(col("id")).as("url_hash")))
        val out = seen.freshAndConfirmed(
          spark.range(500, 2000).select(xxhash64(col("id")).as("url_hash")))
        out.collect()
        out.queryExecution.explainString(FormattedMode)
      } finally {
        seen.close() // ADVICE r3: must run even when collect/explain throws
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      }
    }

    // Joined robots past the broadcast cutover (VERDICT r3 #2): the packed
    // one-row-per-host rules table joins by SHUFFLE-HASH on host, so at
    // 10^7 ruled hosts nothing O(rules) is broadcast or resident-per-
    // executor; each task builds a hash map over its packed-rules slice.
    val robotsShufflePlan = {
      import org.apache.spark.sql.functions.{col, concat, lit, pmod}
      val packed = operators.Robots.packRules(
        BenchKernelRunner.benchRulesDf(spark, 1000)).persist()
      try {
        val policy = operators.Robots.Joined(packed,
          operators.Robots.MaxBroadcastHosts + 1)
        val df = spark.range(0, 5000)
          .select(concat(lit("h"), pmod(col("id"), lit(1200)),
            lit(".example.org")).as("host"),
            concat(lit("/p/"), pmod(col("id"), lit(7))).as("path"))
        val out = policy.withAllowed(df, col("path"), "ok")
        out.collect() // force the final AQE plan
        out.queryExecution.explainString(FormattedMode)
      } finally { packed.unpersist(); () }
    }

    // Politeness per-host STATE joins past the host cutover (round 5):
    // the virtual-clock table and the contended-host tag join by
    // SHUFFLE-HASH on host, so at the 10^7–10^8-host regime no O(hosts)
    // per-host state is ever broadcast or re-shipped per wave.
    val politenessShufflePlan = {
      import org.apache.spark.sql.functions.{col, concat, lit}
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      try {
        // every one of the 100k hosts is contended (2 rows vs budget 1),
        // so the MEASURED cutover keeps the shuffle join — the regime a
        // politeness-bound 10^7-host crawl runs in
        val wide = spark.range(0, 200000)
          .select(concat(lit("w"), (col("id") / 2).cast("long"),
              lit(".example.org")).as("host"),
            col("id").as("url_hash"), lit(1).as("depth"),
            col("id").as("parent_ord"), lit(0).as("link_index"))
        val policy = operators.Robots.Compiled(BenchKernelRunner.benchRules)
        val clock = spark.range(0, 100)
          .select(concat(lit("h"), col("id"), lit(".example.org")).as("host"),
            col("id").as("next_ts"))
        val over = operators.Robots.MaxBroadcastHosts + 1
        val (fetch, _) = operators.Politeness.selectWith(
          wide,
          operators.Politeness.clockedBudgeter(policy, clock, wave = 0,
            ticksPerWave = 1, clockHosts = over),
          saltBuckets = 4, hostsHint = over)
        fetch.collect() // force the final AQE plan
        fetch.queryExecution.explainString(FormattedMode)
      } finally {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      }
    }

    val sections: Seq[(String, String, String)] = Seq(
      ("q1_agg — filter pushdown + column pruning",
        "The shipdate filter reaches the parquet scan (PushedFilters) and " +
          "ReadSchema carries only the touched columns.",
        fmt(SparkEntry.queries("q1_agg")(spark, sfDir))),
      ("q2_join — broadcast of the small dimension",
        "nation/region resolve to BroadcastHashJoin; the fact table never " +
          "shuffles for them.",
        fmt(SparkEntry.queries("q2_join")(spark, sfDir))),
      ("kernel (politeness → visit ids) — no single-partition exchange",
        "Contended-host split + salted windows + range-partitioned ids: " +
          "every exchange is hash/range, never SinglePartition.",
        fmt(kernel)),
      ("a4_ann_ivf_topk — broadcast centroids + cell-local search",
        "Both small sides (centroids, query set) broadcast; the vector " +
          "table shuffles only for its per-vector window.",
        fmt(SparkEntry.queries("a4_ann_ivf_topk")(spark, sfDir))),
      ("seen-state anti-join (3-piece LSM chain) — one candidate-side exchange",
        "The wave's candidates exchange once into the url_hash bucket " +
          "partitioning; every left-anti join in the piece chain then reuses " +
          "it — the seen side shows NO Exchange and NO Sort (pieces are " +
          "retained pre-partitioned + pre-sorted), so bytes shuffled per " +
          "wave are O(candidates), never O(seen). PlanShapeSpec asserts " +
          "exchanges==1 and sorts==1 on this exact plan.",
        seenPlan),
      ("wave dedup probe (freshAndConfirmed) — post-exchange O(seen/B) probe",
        "The layered prefilter (FileBank base + wave-delta broadcasts, " +
          "`might_contain_any`) filters AFTER the candidate bucket " +
          "exchange: the Filter sits above the Exchange, so task p faults " +
          "in only bucket p's bank image — executor residency is " +
          "O(seen/B), and the base broadcast carries only dir paths, " +
          "never filter bytes (SeenStateSpec asserts the FileBank " +
          "payload). Filter-negatives ('provably unseen') bypass the " +
          "exact anti-join chain; positives confirm against the " +
          "pre-partitioned pieces with zero seen-side exchange.",
        probePlan),
      ("joined robots past the broadcast cutover — shuffle-hash rules join",
        "Above Robots.MaxBroadcastHosts (2^16) packed rows, the rules join " +
          "on host is a ShuffledHashJoin — NO BroadcastExchange/" +
          "BroadcastHashJoin of the O(rules) packed table anywhere, so a " +
          "10^7-ruled-host crawl never ships or holds the rule set whole " +
          "(PlanShapeSpec asserts this plan shape; RobotsScaleSpec proves " +
          "decision-identity with the broadcast path at 10^5 hosts).",
        robotsShufflePlan),
      ("politeness state joins past the host cutover — no O(hosts) broadcast",
        "Above Robots.MaxBroadcastHosts (2^16) distinct frontier hosts, " +
          "the virtual-clock join is a plain join (AQE sizes it at " +
          "runtime) and the contended-host tag set takes a MEASURED " +
          "cutover: it is materialized and counted per wave, broadcast " +
          "only when it measures ≤2^16 rows (O(contended), never " +
          "O(hosts)), shuffle-joined otherwise. This dump shows the " +
          "all-contended regime (100k hosts over budget) with size-based " +
          "broadcast disabled: no BroadcastExchange anywhere. " +
          "PlanShapeSpec asserts this shape AND the measured-small case " +
          "where the tag set broadcasts so the frontier is never " +
          "shuffled for the tag join.",
        politenessShufflePlan),
      ("d5_embedding_neardup — bucket-blocked self-join",
        "The pair join is an equi-join on the SRP bucket key (SortMergeJoin/" +
          "ShuffledHashJoin on bucket), not a cartesian product.",
        fmt(SparkEntry.queries("d5_embedding_neardup")(spark, sfDir))))

    val md = new StringBuilder
    md.append("# PLANS — physical plans behind the scale claims\n\n")
    md.append("Generated by `sbt \"runMain graft.PlanDump\"` on ")
    md.append(s"`$sfDir` (plan shape is SF-independent). The same properties ")
    md.append("are asserted as tests in `PlanShapeSpec`/`OperatorsSpec`.\n")
    sections.foreach { case (title, claim, plan) =>
      md.append(s"\n## $title\n\n$claim\n\n```\n${plan.trim}\n```\n")
    }
    Files.writeString(Paths.get("PLANS.md"), md.toString)
    println(s"wrote PLANS.md (${sections.size} sections)")
    spark.stop()
  }
}
