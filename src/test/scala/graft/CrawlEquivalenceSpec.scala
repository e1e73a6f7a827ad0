package graft

import graft.model._
import graft.oracle.CrawlOracle
import graft.plans.CrawlJob
import graft.synth.Corpus
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** North-star gate: the Spark engine must replay the golden oracle
  * bit-for-bit — visit order, URL-seen set, per-row span-sequence
  * (extracted docs), and all four counters — on the synthetic corpus,
  * including the robots-exclusion and duplicate-suppression scenarios. */
class CrawlEquivalenceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def tmpDir(tag: String): String =
    Files.createTempDirectory(s"graft-$tag").toString

  private def corpusDf(corpus: Seq[WebDoc]): DataFrame = {
    import spark.implicits._
    spark.createDataset(corpus).toDF()
  }

  private def docKey(d: CrawlDoc): (String, String, String, String, String, String, Map[String, List[String]]) =
    (d.id, d.uri, d.title, d.description, d.keywords, d.ogimage,
      d.source.map { case (k, v) => k -> v.toList })

  private def runBoth(cfg0: Corpus.Config, seeds: Seq[String], onDomain: Boolean,
      hostBudget: Int = 4, maxWaves: Int = 64, tag: String = "eq"):
      (CrawlOracle.Result, String, Seq[WaveMetrics]) = {
    val corpus = Corpus.generate(cfg0)
    val rules = Corpus.robotsRules(cfg0)
    val oracleRes = CrawlOracle.run(corpus, rules,
      CrawlOracle.CrawlConfig(seeds, onDomain, hostBudget, maxWaves))
    val root = tmpDir(tag)
    val metrics = CrawlJob.run(spark, corpusDf(corpus), rules,
      CrawlJob.Config(seeds, onDomain, hostBudget, maxWaves,
        numPartitions = 4, saltBuckets = 4, bloomItems = 100000L), root)
    (oracleRes, root, metrics)
  }

  private def assertEquivalent(o: CrawlOracle.Result, root: String,
      engineMetrics: Seq[WaveMetrics]): Unit = {
    // 1. visit order: exact (rank, wave, url) sequence
    val vGot = CrawlJob.visitOrder(spark, root, 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
      .sortBy(_._1).toSeq
    val vWant = o.visits.map(v => (v.rank, v.wave, v.url))
    assert(vGot.size == vWant.size, s"visit count ${vGot.size} != ${vWant.size}")
    vWant.zip(vGot).foreach { case (w, g) => assert(g == w, s"visit rank ${w._1}") }

    // 2. URL-seen set: exact set equality on (hash, url)
    val sGot = CrawlJob.seenSet(spark, root)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val sWant = o.seen.map(s => (s.url_hash, s.url)).toSet
    assert((sGot diff sWant).isEmpty && (sWant diff sGot).isEmpty,
      s"seen set: extra=${(sGot diff sWant).take(5)} missing=${(sWant diff sGot).take(5)}")

    // 3. extracted docs: per-row span-sequence equality
    val dGot = CrawlJob.crawlDocs(spark, root).collect().map { r =>
      (r.getString(0), r.getString(1), r.getString(2), r.getString(3),
        r.getString(4), r.getString(5),
        r.getAs[Map[String, scala.collection.Seq[String]]](6)
          .map { case (k, v) => k -> v.toList })
    }.toSet
    val dWant = o.docs.map(docKey).toSet
    assert(dGot == dWant,
      s"docs: extra=${(dGot diff dWant).take(2)} missing=${(dWant diff dGot).take(2)}")

    // 4. counters, per wave
    assert(engineMetrics == o.metrics,
      s"metrics:\n engine=${engineMetrics}\n oracle=${o.metrics}")
  }

  test("tiny corpus, off-domain allowed: engine replays oracle exactly") {
    val cfg = Corpus.Config(nHosts = 4, pagesPerHost = 6, linksPerPage = 4)
    val seeds = Seq("http://HOT.example.com:80/p/0#start")
    val (o, root, m) = runBoth(cfg, seeds, onDomain = false, tag = "tiny")
    assert(o.visits.nonEmpty && o.docs.nonEmpty)
    assertEquivalent(o, root, m)
  }

  test("on-domain crawl restricts to seed host (colly AllowedDomains)") {
    val cfg = Corpus.Config(nHosts = 4, pagesPerHost = 6, linksPerPage = 4, seed = 7L)
    val seeds = Seq("http://site1.example.org/p/0")
    val (o, root, m) = runBoth(cfg, seeds, onDomain = true, tag = "ondom")
    val hosts = o.seen.map(s => graft.functions.UrlOps.hostOf(
      graft.functions.UrlOps.parse(s.url).authority)).toSet
    assert(hosts == Set("site1.example.org"))
    assertEquivalent(o, root, m)
  }

  test("multi-seed, tight budget: deferrals + robots + dedup all exercised") {
    val cfg = Corpus.Config(nHosts = 6, pagesPerHost = 8, linksPerPage = 6, seed = 13L)
    val seeds = Seq(
      "http://hot.example.com/p/0",
      "http://site1.example.org/p/0?b=1&a=1",
      "http://hot.example.com/p/0#dup") // duplicate seed after canonicalization
    val (o, root, m) = runBoth(cfg, seeds, onDomain = false, hostBudget = 2, tag = "multi")
    assert(o.metrics.map(_.deferred).sum > 0, "expected deferrals under tight budget")
    assert(o.metrics.map(_.robots_blocked).sum > 0, "expected robots blocks")
    assert(o.metrics.map(_.dedup_hits).sum > 0, "expected dedup hits")
    assert(o.metrics.map(_.fetch_miss).sum > 0, "expected dangling-link misses")
    assertEquivalent(o, root, m)
  }

  test("cuckoo seen-filter: exactness is prefilter-independent") {
    val cfg = Corpus.Config(nHosts = 4, pagesPerHost = 6, linksPerPage = 4, seed = 55L)
    val corpus = Corpus.generate(cfg)
    val rules = Corpus.robotsRules(cfg)
    val seeds = Seq("http://hot.example.com/p/0")
    val o = CrawlOracle.run(corpus, rules, CrawlOracle.CrawlConfig(seeds))
    val root = tmpDir("cuckoo")
    val m = CrawlJob.run(spark, corpusDf(corpus), rules,
      CrawlJob.Config(seeds, onDomain = false, hostBudget = 4, maxWaves = 64,
        numPartitions = 4, saltBuckets = 4, bloomItems = 100000L,
        seenFilter = "cuckoo"), root)
    assertEquivalent(o, root, m)
  }

  test("bounded retry (cuckoo unsee): engine replays oracle incl. retried counter") {
    val cfg = Corpus.Config(nHosts = 6, pagesPerHost = 8, linksPerPage = 6, seed = 13L)
    val corpus = Corpus.generate(cfg)
    val rules = Corpus.robotsRules(cfg)
    val seeds = Seq("http://hot.example.com/p/0", "http://site1.example.org/p/0")
    val o = CrawlOracle.run(corpus, rules,
      CrawlOracle.CrawlConfig(seeds, onDomain = false, hostBudget = 2, maxRetries = 2))
    assert(o.metrics.map(_.retried).sum > 0, "fixture must exercise retries")
    assert(o.visits.map(_.url).size > o.visits.map(_.url).distinct.size,
      "a retried URL must consume a second rank")
    val root = tmpDir("retry")
    val m = CrawlJob.run(spark, corpusDf(corpus), rules,
      CrawlJob.Config(seeds, onDomain = false, hostBudget = 2, maxWaves = 64,
        numPartitions = 4, saltBuckets = 4, bloomItems = 100000L,
        seenFilter = "cuckoo", maxRetries = 2), root)
    assertEquivalent(o, root, m)
  }

  test("retry survives kill/resume (failed-table round trip)") {
    val cfg = Corpus.Config(nHosts = 6, pagesPerHost = 8, linksPerPage = 6, seed = 13L)
    val corpus = Corpus.generate(cfg)
    val rules = Corpus.robotsRules(cfg)
    val seeds = Seq("http://hot.example.com/p/0")
    val o = CrawlOracle.run(corpus, rules,
      CrawlOracle.CrawlConfig(seeds, onDomain = false, hostBudget = 2, maxRetries = 1))
    val df = corpusDf(corpus)
    val root = tmpDir("retry-resume")
    def cfgJob(waves: Int) = CrawlJob.Config(seeds, onDomain = false, hostBudget = 2,
      maxWaves = waves, numPartitions = 4, saltBuckets = 4, bloomItems = 100000L,
      seenFilter = "cuckoo", maxRetries = 1)
    val m1 = CrawlJob.run(spark, df, rules, cfgJob(3), root)
    val m2 = CrawlJob.run(spark, df, rules, cfgJob(64), root)
    assertEquivalent(o, root, m1 ++ m2)
  }

  test("10^4 ruled hosts: the packed-join robots path replays the oracle") {
    val cfg = Corpus.Config(nHosts = 4, pagesPerHost = 6, linksPerPage = 4, seed = 21L)
    val corpus = Corpus.generate(cfg)
    // pad the real rules with 10^4 hosts the crawl never touches: forces
    // the Joined (broadcast packed-rules) path while keeping the oracle
    // decision surface identical
    val rules = Corpus.robotsRules(cfg) ++ (0 until 10000).map { i =>
      graft.model.RobotsRule(s"pad$i.example.net", "/blocked", allow = false,
        crawl_delay = 1 + i % 5)
    }
    assert(rules.map(_.host).distinct.size > 64)
    val seeds = Seq("http://hot.example.com/p/0")
    val o = CrawlOracle.run(corpus, rules, CrawlOracle.CrawlConfig(seeds, hostBudget = 3))
    val root = tmpDir("bigrules")
    val m = CrawlJob.run(spark, corpusDf(corpus), rules,
      CrawlJob.Config(seeds, onDomain = false, hostBudget = 3, maxWaves = 64,
        numPartitions = 4, saltBuckets = 4, bloomItems = 100000L), root)
    assertEquivalent(o, root, m)
  }

  /** Textify prefix rules into raw robots.txt bodies — the (host, body)
    * shape a real robots corpus has (what `--robots-txt` consumes). */
  private def robotsBodies(rules: Seq[RobotsRule]): Seq[(String, String)] =
    rules.groupBy(_.host).toSeq.map { case (h, rs) =>
      val lines = Seq("User-agent: *") ++
        rs.map(r => s"${if (r.allow) "Allow" else "Disallow"}: ${r.path_prefix}") ++
        Seq(s"Crawl-delay: ${rs.map(_.crawl_delay).max}")
      h -> lines.mkString("\n")
    }

  test("raw robots.txt bodies drive the wave loop (compiled path) — oracle-exact") {
    import spark.implicits._
    val cfg = Corpus.Config(nHosts = 6, pagesPerHost = 8, linksPerPage = 6, seed = 13L)
    val corpus = Corpus.generate(cfg)
    val rules = Corpus.robotsRules(cfg)
    val seeds = Seq("http://hot.example.com/p/0", "http://site1.example.org/p/0")
    val o = CrawlOracle.run(corpus, rules,
      CrawlOracle.CrawlConfig(seeds, onDomain = false, hostBudget = 2))
    assert(o.metrics.map(_.robots_blocked).sum > 0)
    val bodiesDf = robotsBodies(rules).toDF("host", "body")
    val root = tmpDir("txtbodies")
    val m = CrawlJob.runWithPolicy(spark, corpusDf(corpus),
      graft.operators.RobotsTxt.policyFromTxt(bodiesDf, "graftbot"),
      CrawlJob.Config(seeds, onDomain = false, hostBudget = 2, maxWaves = 64,
        numPartitions = 4, saltBuckets = 4, bloomItems = 100000L), root)
    assertEquivalent(o, root, m)
  }

  test("10^4 robots.txt bodies: the packed JoinedTxt path replays the oracle") {
    import spark.implicits._
    val cfg = Corpus.Config(nHosts = 4, pagesPerHost = 6, linksPerPage = 4, seed = 21L)
    val corpus = Corpus.generate(cfg)
    val rules = Corpus.robotsRules(cfg) ++ (0 until 10000).map { i =>
      graft.model.RobotsRule(s"pad$i.example.net", "/blocked", allow = false,
        crawl_delay = 1 + i % 5)
    }
    val seeds = Seq("http://hot.example.com/p/0")
    val o = CrawlOracle.run(corpus, rules, CrawlOracle.CrawlConfig(seeds, hostBudget = 3))
    val bodiesDf = robotsBodies(rules).toDF("host", "body").repartition(8)
    val policy = graft.operators.RobotsTxt.policyFromTxt(bodiesDf, "graftbot")
    assert(policy.isInstanceOf[graft.operators.RobotsTxt.JoinedTxt],
      "10^4 hosts must take the broadcast packed-join path")
    val root = tmpDir("txtbig")
    val m = CrawlJob.runWithPolicy(spark, corpusDf(corpus), policy,
      CrawlJob.Config(seeds, onDomain = false, hostBudget = 3, maxWaves = 64,
        numPartitions = 4, saltBuckets = 4, bloomItems = 100000L), root)
    assertEquivalent(o, root, m)
  }

  test("virtual-clock politeness: ts_next carryover replays the oracle exactly") {
    val cfg = Corpus.Config(nHosts = 6, pagesPerHost = 8, linksPerPage = 6, seed = 13L)
    val corpus = Corpus.generate(cfg)
    val rules = Corpus.robotsRules(cfg) // hot host crawl_delay=2, others 1
    val seeds = Seq("http://hot.example.com/p/0", "http://site1.example.org/p/0")
    val o = CrawlOracle.run(corpus, rules,
      CrawlOracle.CrawlConfig(seeds, onDomain = false, hostBudget = 3,
        virtualClock = true))
    // the carryover must actually bite: some wave's budget differs from the
    // constant-budget model (hot host: T=3, d=2 → budgets 2,1,2,1,… vs
    // constant max(1, 3/2) = 1 every wave)
    val oPlain = CrawlOracle.run(corpus, rules,
      CrawlOracle.CrawlConfig(seeds, onDomain = false, hostBudget = 3))
    assert(o.visits.map(_.url) != oPlain.visits.map(_.url),
      "fixture does not distinguish the clocked schedule from the constant budget")
    val root = tmpDir("vclock")
    val m = CrawlJob.run(spark, corpusDf(corpus), rules,
      CrawlJob.Config(seeds, onDomain = false, hostBudget = 3, maxWaves = 64,
        numPartitions = 4, saltBuckets = 4, bloomItems = 100000L,
        virtualClock = true), root)
    assertEquivalent(o, root, m)
  }

  test("virtual clock survives kill/resume (host_clock table round trip)") {
    val cfg = Corpus.Config(nHosts = 6, pagesPerHost = 8, linksPerPage = 6, seed = 13L)
    val corpus = Corpus.generate(cfg)
    val rules = Corpus.robotsRules(cfg)
    val seeds = Seq("http://hot.example.com/p/0")
    val o = CrawlOracle.run(corpus, rules,
      CrawlOracle.CrawlConfig(seeds, onDomain = false, hostBudget = 3,
        virtualClock = true))
    val df = corpusDf(corpus)
    val root = tmpDir("vclock-resume")
    def cfgJob(waves: Int) = CrawlJob.Config(seeds, onDomain = false, hostBudget = 3,
      maxWaves = waves, numPartitions = 4, saltBuckets = 4, bloomItems = 100000L,
      virtualClock = true)
    val m1 = CrawlJob.run(spark, df, rules, cfgJob(2), root)
    val m2 = CrawlJob.run(spark, df, rules, cfgJob(64), root)
    assertEquivalent(o, root, m1 ++ m2)
  }

  test("graceful stop finishes the wave, commits, and resumes bit-exact") {
    val cfg = Corpus.Config(nHosts = 4, pagesPerHost = 6, linksPerPage = 5, seed = 99L)
    val corpus = Corpus.generate(cfg)
    val rules = Corpus.robotsRules(cfg)
    val seeds = Seq("http://hot.example.com/p/2")
    val o = CrawlOracle.run(corpus, rules,
      CrawlOracle.CrawlConfig(seeds, onDomain = false, hostBudget = 3))
    val df = corpusDf(corpus)
    val root = tmpDir("gstop")
    // stop flag goes true while wave 1 is in flight (the loop polls
    // between waves): 2 waves complete, both committed
    var polls = 0
    val m1 = CrawlJob.run(spark, df, rules,
      CrawlJob.Config(seeds, onDomain = false, hostBudget = 3, maxWaves = 64,
        numPartitions = 4, saltBuckets = 4, bloomItems = 100000L,
        stopRequested = () => { polls += 1; polls > 2 }), root)
    assert(m1.size == 2, s"graceful stop should land after wave 2, got ${m1.size}")
    val m2 = CrawlJob.run(spark, df, rules,
      CrawlJob.Config(seeds, onDomain = false, hostBudget = 3, maxWaves = 64,
        numPartitions = 4, saltBuckets = 4, bloomItems = 100000L), root)
    assertEquivalent(o, root, m1 ++ m2)
  }

  test("crash with seen committed but docs not: resume trims both, stays exact") {
    import spark.implicits._
    val cfg = Corpus.Config(nHosts = 4, pagesPerHost = 6, linksPerPage = 5, seed = 99L)
    val corpus = Corpus.generate(cfg)
    val rules = Corpus.robotsRules(cfg)
    val seeds = Seq("http://hot.example.com/p/2")
    val o = CrawlOracle.run(corpus, rules,
      CrawlOracle.CrawlConfig(seeds, onDomain = false, hostBudget = 3))
    val df = corpusDf(corpus)
    val root = tmpDir("seenfirst")
    val m1 = CrawlJob.run(spark, df, rules,
      CrawlJob.Config(seeds, onDomain = false, hostBudget = 3, maxWaves = 2,
        numPartitions = 4, saltBuckets = 4, bloomItems = 100000L), root)
    // simulate the widest crash interleaving the concurrent doc sinks
    // allow: wave 2's SEEN (and visits) landed, docs/frontier did not
    val t = CrawlJob.tables(root, spark)
    t.seen.append(
      Seq(graft.model.SeenUrl(123456789L, "http://phantom.example.com/x", 2)).toDF(),
      Map("wave" -> 2L))
    t.visits.append(
      Seq((999999L, 2, "http://phantom.example.com/x", 9)).toDF("ord", "wave", "url", "depth"),
      Map("wave" -> 2L))
    val m2 = CrawlJob.run(spark, df, rules,
      CrawlJob.Config(seeds, onDomain = false, hostBudget = 3, maxWaves = 64,
        numPartitions = 4, saltBuckets = 4, bloomItems = 100000L), root)
    assertEquivalent(o, root, m1 ++ m2)
  }

  test("crash with consumed markers committed but frontier marker not: resume trims, stays exact") {
    import spark.implicits._
    val cfg = Corpus.Config(nHosts = 4, pagesPerHost = 6, linksPerPage = 5, seed = 99L)
    val corpus = Corpus.generate(cfg)
    val rules = Corpus.robotsRules(cfg)
    val seeds = Seq("http://hot.example.com/p/2")
    val o = CrawlOracle.run(corpus, rules,
      CrawlOracle.CrawlConfig(seeds, onDomain = false, hostBudget = 3))
    val df = corpusDf(corpus)
    val root = tmpDir("consumedcrash")
    val m1 = CrawlJob.run(spark, df, rules,
      CrawlJob.Config(seeds, onDomain = false, hostBudget = 3, maxWaves = 2,
        numPartitions = 4, saltBuckets = 4, bloomItems = 100000L), root)
    // simulate the delta-commit crash window: wave 2's CONSUMED markers
    // landed (the concurrent append), the frontier commit marker did not.
    // The phantom marker carries a REAL deferred frontier row's hash — if
    // the resume trim failed to roll it back, that row would be silently
    // suppressed from the live frontier and the crawl would diverge.
    val t = CrawlJob.tables(root, spark)
    // victim = a row still LIVE (not suppressed by a real wave-0/1
    // marker), so a non-rolled-back phantom would actually change the crawl
    val live = t.frontier.read().select("url_hash")
      .join(t.consumed.read().select("url_hash"), Seq("url_hash"), "left_anti")
    val victim = live.head().getLong(0)
    t.consumed.append(Seq(victim).toDF("url_hash"), Map("wave" -> 2L))
    val m2 = CrawlJob.run(spark, df, rules,
      CrawlJob.Config(seeds, onDomain = false, hostBudget = 3, maxWaves = 64,
        numPartitions = 4, saltBuckets = 4, bloomItems = 100000L), root)
    assertEquivalent(o, root, m1 ++ m2)
  }

  test("kill after wave k, resume: final state identical to uninterrupted run") {
    val cfg = Corpus.Config(nHosts = 4, pagesPerHost = 6, linksPerPage = 5, seed = 99L)
    val corpus = Corpus.generate(cfg)
    val rules = Corpus.robotsRules(cfg)
    val seeds = Seq("http://hot.example.com/p/2")
    val oracleRes = CrawlOracle.run(corpus, rules,
      CrawlOracle.CrawlConfig(seeds, onDomain = false, hostBudget = 3))
    val df = corpusDf(corpus)
    val root = tmpDir("resume")
    // phase 1: stop after 2 waves (simulated kill between wave commits)
    val m1 = CrawlJob.run(spark, df, rules,
      CrawlJob.Config(seeds, onDomain = false, hostBudget = 3, maxWaves = 2,
        numPartitions = 4, saltBuckets = 4, bloomItems = 100000L), root)
    assert(m1.size == 2)
    // phase 2: resume from IceLite snapshots to completion
    val m2 = CrawlJob.run(spark, df, rules,
      CrawlJob.Config(seeds, onDomain = false, hostBudget = 3, maxWaves = 64,
        numPartitions = 4, saltBuckets = 4, bloomItems = 100000L), root)
    assertEquivalent(oracleRes, root, m1 ++ m2)
  }
}
