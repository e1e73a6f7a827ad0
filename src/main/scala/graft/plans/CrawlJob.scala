package graft.plans

import graft.functions.UrlExpressions._
import graft.functions.UrlOps
import graft.model._
import graft.operators.{DocExtract, Politeness, Ranker, Robots}
import graft.sources.IceLite
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.util.sketch.BloomFilter

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

/** The Spark-native crawl engine: an iterative BSP wave loop over IceLite
  * tables, replaying the reference's BFS-with-priority traversal exactly
  * (golden semantics defined in [[graft.oracle.CrawlOracle]] — the two
  * implementations share [[UrlOps]], so equality is structural).
  *
  * Scale design (the part the reference never had — SURVEY §4, §7.5):
  *  - politeness top-k is two-phase host-salted: window over (host, salt)
  *    first, so a hot host (30% of the frontier) never lands in one task;
  *    the second window sees ≤ saltBuckets × budget rows per host;
  *  - dedup is a broadcast bloom prefilter (exactness restored by a
  *    left-anti join of ONLY the bloom-positive candidates against the
  *    seen table — the shuffle carries a fraction of the wave);
  *  - parent ranks are order-isomorphic range-partitioned ids, never a
  *    global row_number (no single-partition stage anywhere in the wave);
  *  - each wave round-trips state through IceLite parquet: lineage
  *    truncation + atomic checkpoint + exact kill/resume for free;
  *  - robots rules compile to a Catalyst predicate (constant-folded,
  *    whole-stage codegen) instead of a per-row rule lookup.
  */
object CrawlJob {

  final case class Config(
      seeds: Seq[String],
      onDomain: Boolean = false,
      hostBudget: Int = 4,
      maxWaves: Int = 64,
      numPartitions: Int = 32,
      saltBuckets: Int = 8,
      bloomItems: Long = 4L * 1000 * 1000,
      bloomFpp: Double = 0.01,
      seenFilter: String = "bloom") // "bloom" | "cuckoo" (north_rule names both)

  // Broadcastable approximate-membership prefilter: bloom (default) or
  // cuckoo (deletion-capable) — graft.functions.LongMembership, probed by
  // the codegen MightContainLong expression.
  private type Prefilter = graft.functions.LongMembership

  /** `bloom_filter_agg` as a Column, sized exactly like
    * `BloomFilter.create(items, fpp)` so per-wave filters stay mergeable
    * with the resume-time `stat.bloomFilter` build. Riding the aggregate
    * on the seen write's `observe` makes the wave bloom FREE — the
    * standalone `stat.bloomFilter` pass it replaces cost a full extra
    * job over the wave's new URLs. */
  private def bloomAgg(c: Column, items: Long, fpp: Double): Column = {
    val numBits = BloomFilter.optimalNumOfBits(items, fpp)
    GraftShim.column(new BloomFilterAggregate(GraftShim.expression(c),
      Literal(items), Literal(numBits)).toAggregateExpression())
  }

  final case class Tables(
      frontier: IceLite.Table,
      seen: IceLite.Table,
      visits: IceLite.Table,
      docs: IceLite.Table,
      docsFlat: IceLite.Table,
      metrics: IceLite.Table)

  def tables(root: String, spark: SparkSession): Tables = Tables(
    IceLite.table(s"$root/frontier", spark),
    IceLite.table(s"$root/url_seen", spark),
    IceLite.table(s"$root/visits", spark),
    IceLite.table(s"$root/crawl_docs", spark),
    IceLite.table(s"$root/crawl_docs_flat", spark),
    IceLite.table(s"$root/metrics", spark))

  /** Run (or resume) the crawl to completion. `docsDf` is the synthetic
    * web: the fetch step is an equi-join against it (no network in the
    * sandbox — SURVEY §2.1 S2). Returns the per-wave metrics. */
  def run(spark: SparkSession, docsDf: DataFrame, rules: Seq[RobotsRule],
      cfg: Config, stateRoot: String): Seq[WaveMetrics] = {
    import spark.implicits._
    val t = tables(stateRoot, spark)

    // --- init or resume -------------------------------------------------
    var wave: Int = t.frontier.currentSnapshot
      .flatMap(_.counters.get("next_wave")).map(_.toInt).getOrElse(-1)
    if (wave < 0) {
      // fresh start: admit seeds sequentially (first-wins), exactly like
      // the oracle — the seed list is driver-sized by definition.
      val seedEntries = {
        val seen = scala.collection.mutable.LinkedHashMap.empty[Long, FrontierEntry]
        cfg.seeds.zipWithIndex.foreach { case (s, i) =>
          val c = UrlOps.canonicalize(s)
          if (c != null) {
            val h = UrlOps.urlHash64(c)
            if (!seen.contains(h))
              seen(h) = FrontierEntry(c, h, UrlOps.hostOf(UrlOps.parse(c).authority), 0, 0L, i)
          }
        }
        seen.values.toSeq
      }
      t.frontier.replace(seedEntries.toDF(),
        Map("next_wave" -> 0L, "frontier_size" -> seedEntries.size.toLong))
      t.seen.append(seedEntries.map(e => SeenUrl(e.url_hash, e.url, 0)).toDF())
      wave = 0
    } else {
      // Crash-consistency on resume: the frontier commit is the wave's
      // commit marker (it lands last). Any sink append tagged with a wave
      // >= next_wave came from a wave that never committed — roll those
      // snapshots back so the re-run is exactly-once.
      val w = wave
      Seq(t.seen, t.visits, t.docs, t.docsFlat, t.metrics).foreach {
        _.trimWhile(s => s.counters.get("wave").exists(_ >= w))
      }
    }

    // seen prefilter (bloom or cuckoo): rebuilt from the seen table on
    // (re)start, then merged incrementally per wave — never rescanned.
    val useCuckoo = cfg.seenFilter == "cuckoo"
    var bloom: BloomFilter =
      if (useCuckoo) null
      else if (!t.seen.isEmpty)
        t.seen.read().stat.bloomFilter("url_hash", cfg.bloomItems, cfg.bloomFpp)
      else BloomFilter.create(cfg.bloomItems, cfg.bloomFpp)
    var cuckoo: graft.functions.CuckooFilterImpl =
      if (!useCuckoo) null
      else if (!t.seen.isEmpty) {
        import graft.functions.CuckooFilterAgg.cuckoo_filter_agg
        graft.functions.CuckooFilterImpl.deserialize(
          t.seen.read().agg(cuckoo_filter_agg(col("url_hash"), cfg.bloomItems))
            .head.getAs[Array[Byte]](0))
      } else graft.functions.CuckooFilterImpl.create(cfg.bloomItems)

    // in-memory seen (anti-join right side): a union of per-wave cached
    // pieces — IceLite stays the durable copy, but waves never re-read it
    // from parquet. At 10^10 the memory copy is replaced by the bucketed
    // disk layout; locally it removes a growing scan per wave.
    var seenPieces: Vector[DataFrame] =
      if (!t.seen.isEmpty)
        Vector(t.seen.read().select("url_hash").persist())
      else Vector.empty
    def seenHashes: DataFrame =
      if (seenPieces.isEmpty) spark.emptyDataset[SeenUrl].toDF().select("url_hash")
      else seenPieces.reduce(_ unionByName _)

    val seedHosts: Set[String] = cfg.seeds.flatMap { s =>
      Option(UrlOps.canonicalize(s)).map(c => UrlOps.hostOf(UrlOps.parse(c).authority))
    }.toSet

    val out = Vector.newBuilder[WaveMetrics]
    var frontierSize: Long = t.frontier.currentSnapshot
      .flatMap(_.counters.get("frontier_size")).getOrElse(0L)
    var done = false
    while (!done && wave < cfg.maxWaves) {
      val frontier = t.frontier.readOr(spark.emptyDataset[FrontierEntry].toDF())
      if (t.frontier.isEmpty) { done = true }
      else {
        val pre: Prefilter =
          if (useCuckoo) graft.functions.LongMembership.Cuckoo(cuckoo)
          else graft.functions.LongMembership.Bloom(bloom)
        val (m, nextSize, newBloom, newCuckoo, newPiece) =
          runWave(spark, t, docsDf, rules, cfg, wave, frontier, frontierSize,
            pre, seenHashes, seedHosts)
        if (newBloom != null) { bloom.mergeInPlace(newBloom) }
        if (newCuckoo != null) { cuckoo.mergeInPlace(newCuckoo) }
        if (newPiece != null) seenPieces :+= newPiece
        out += m
        frontierSize = nextSize
        wave += 1
      }
    }
    seenPieces.foreach(_.unpersist())
    out.result()
  }

  private val priorityKeys = Seq(col("depth"), col("parent_ord"), col("link_index"))

  /** One BSP wave. Counters ride the sink writes via the Observation API —
    * a wave costs exactly its materializations (5 sink writes + the
    * wave-bloom build), no standalone count jobs.
    * Returns (metrics, next frontier size, bloom-of-new-seen-hashes). */
  private def runWave(spark: SparkSession, t: Tables, docsDf: DataFrame,
      rules: Seq[RobotsRule], cfg: Config, wave: Int, frontier: DataFrame,
      frontierSize: Long, pre: Prefilter, seenHashes: DataFrame,
      seedHosts: Set[String])
      : (WaveMetrics, Long, BloomFilter, graft.functions.CuckooFilterImpl, DataFrame) = {
    import spark.implicits._
    import org.apache.spark.sql.Observation
    // wave-size-adaptive parallelism: a 10-row wave must not pay 32-task
    // scheduling + 32-file commit overhead; a 10^8-row wave gets the full
    // configured width. (AQE coalesces the shuffles; this covers the
    // repartition/write paths AQE does not.)
    val p = math.max(1, math.min(cfg.numPartitions,
      ((frontierSize * 8) / 50000L).toInt + 1))
    val trace = sys.env.contains("GRAFT_TRACE")
    var tLast = System.nanoTime()
    def mark(step: String): Unit = if (trace) {
      val now = System.nanoTime()
      println(f"[trace] wave=$wave $step%-14s ${(now - tLast) / 1e9}%.2fs")
      tLast = now
    }

    // --- politeness: contended-host split + two-phase salted top-k
    //     (SURVEY §2.4 P1/P4; see graft.operators.Politeness) ------------
    val (fetchRaw, deferRaw) = Politeness.select(
      frontier, rules, cfg.hostBudget, cfg.saltBuckets)
    val fetchSet0 = fetchRaw
    val deferred0 = deferRaw.persist()

    // --- visit-order ids: order-isomorphic, no global window ------------
    val waveBase = (wave.toLong + 1L) << 50
    val fetchSet = Ranker.orderIsomorphicId(
        fetchSet0, priorityKeys, "ord", waveBase, p)
      .persist()

    // --- fetch = equi-join against the synthetic web (S2) ---------------
    val joined = fetchSet.join(docsDf, fetchSet("url") === docsDf("doc_id"), "left_outer")
      .persist()
    val hits = joined.filter(col("doc_id").isNotNull)

    // visits: every scheduled fetch consumes a rank, misses included.
    // This write runs first, synchronously: it materializes the fetchSet
    // cache every later consumer reads.
    val obsVisits = Observation(s"visits$wave")
    t.visits.append(
      fetchSet.select(col("ord"), lit(wave).as("wave"), col("url"), col("depth"))
        .observe(obsVisits, count(lit(1)).as("n")),
      Map("wave" -> wave.toLong))
    val nFetch = obsVisits.get("n").asInstanceOf[Long]
    mark("visits_write")

    // --- extraction sinks (two-sink fan-out from one cached wave) -------
    // The doc sinks don't feed the frontier update, so they run as a
    // concurrent Spark job while the main thread expands links — the wave
    // wall pays max(sinks, expansion), not the sum. Crash-consistency is
    // unaffected: the frontier replace (the wave's commit marker) still
    // lands last, after the await below.
    implicit val ec: ExecutionContext = ExecutionContext.global
    val obsDocs = Observation(s"docs$wave")
    val docSinks: Future[Unit] = Future {
      t.docs.append(
        DocExtract.extract(hits, "url", "spans").observe(obsDocs, count(lit(1)).as("n")),
        Map("wave" -> wave.toLong))
      t.docsFlat.append(DocExtract.extractFlat(hits, "url", "spans"), Map("wave" -> wave.toLong))
    }
    val nDeferred = frontierSize - nFetch

    // --- link expansion → candidates (A-span posexplode, O5/O6/O7) ------
    val aSpans = DocExtract.sortedSpans(col("spans"))
    val links = hits
      .select(col("url").as("base"), col("ord").as("parent_ord"), col("depth"),
        posexplode(filter(aSpans, s => s.getField("kind") === lit("a")))
          .as(Seq("link_index", "span")))
      .select(col("base"), col("parent_ord"), col("depth"), col("link_index"),
        col("span").getField("text").as("href"))
    var cands = links
      .withColumn("cand", resolve_url(col("base"), col("href")))
      .filter(col("cand").isNotNull && !is_media_url(col("cand")))
      .withColumn("chost", url_host(col("cand")))
    if (cfg.onDomain)
      cands = cands.filter(col("chost").isin(seedHosts.toSeq: _*))

    // --- within-wave first-wins + cross-wave dedup (D2/D3) --------------
    // grp_n (candidates folded into each winner) makes the group-agg carry
    // the dedup accounting, so no standalone count over `cands` is needed.
    // The candidate total rides an observe UNDER the persist: metrics fire
    // exactly once, while the seen-write job populates the cache — no
    // standalone materialization barrier for the winners pipeline.
    val obsWinners = Observation(s"winners$wave")
    val winners = cands
      .groupBy(col("cand"))
      .agg(min(struct(col("parent_ord"), col("link_index"), col("depth"))).as("w"),
        count(lit(1)).as("grp_n"))
      .select(col("cand"),
        col("w").getField("parent_ord").as("parent_ord"),
        col("w").getField("link_index").as("link_index"),
        (col("w").getField("depth") + 1).as("depth"),
        xxhash64(col("cand")).as("url_hash"),
        col("grp_n"))
      .observe(obsWinners, sum(col("grp_n")).as("n_cand"))
      .persist()
    mark("winners_plan")

    // bloom prefilter: bloom-negative rows are provably unseen and skip
    // the anti-join; bloom-positive rows get exact confirmation. The probe
    // is a native codegen expression (no UDF boxing in the hot path).
    val bfB = spark.sparkContext.broadcast(pre)
    val mightContain = graft.functions.UrlExpressions.might_contain_long(col("url_hash"), bfB)
    val fresh = winners.filter(!mightContain)
    val maybe = winners.filter(mightContain)
    val confirmed = maybe.join(seenHashes, Seq("url_hash"), "left_anti")
    // --- robots compiled to a Catalyst predicate (O8) --------------------
    val path = coalesce(nullif(parse_url(col("cand"), lit("PATH")), lit("")), lit("/"))
    val allowed = Robots.compile(rules, col("host"), path)
    val newSeen = fresh.unionByName(confirmed)
      .withColumn("host", url_host(col("cand")))
      .withColumn("__allowed", allowed)
      .persist()

    // seen append carries the dedup/robots counters AND the wave's bloom
    // filter via observe — no standalone bloom job (it was a full extra
    // pass over the wave's new URLs)
    val obsSeen = Observation(s"seen$wave")
    t.seen.append(
      newSeen
        .observe(obsSeen, count(lit(1)).as("n"),
          sum(when(col("__allowed"), 1L).otherwise(0L)).as("adm"),
          bloomAgg(col("url_hash"), cfg.bloomItems, cfg.bloomFpp).as("bf"))
        .select(col("url_hash"), col("cand").as("url"), lit(wave + 1).as("wave")),
      Map("wave" -> wave.toLong))
    val nNewSeen = obsSeen.get("n").asInstanceOf[Long]
    val nAdmitted = Option(obsSeen.get("adm")).map(_.asInstanceOf[Long]).getOrElse(0L)
    val waveBloomBytes = obsSeen.get("bf").asInstanceOf[Array[Byte]]
    // the winners metric landed while the seen write populated the cache
    val nCand = Option(obsWinners.get("n_cand")).map(_.asInstanceOf[Long]).getOrElse(0L)
    val nDedup = nCand - nNewSeen
    mark("seen_write")
    val nRobots = nNewSeen - nAdmitted
    val admitted = newSeen.filter(col("__allowed"))

    // --- commit state (atomic IceLite snapshots; parquet round-trip
    //     truncates lineage across waves). The doc sinks must be durable
    //     before the frontier commit marker lands. -----------------------
    Await.result(docSinks, Duration.Inf)
    val nHits = obsDocs.get("n").asInstanceOf[Long]
    val nMiss = nFetch - nHits
    mark("docs_await")
    val nextFrontier = deferred0.unionByName(
      admitted.select(col("cand").as("url"), col("url_hash"), col("host"),
        col("depth"), col("parent_ord"), col("link_index")))
    val nextSize = nDeferred + nAdmitted
    val metrics = WaveMetrics(wave, nHits, nDeferred, nRobots, nDedup, nMiss)
    val counters = countersOf(metrics) +
      ("next_wave" -> (wave + 1L)) + ("frontier_size" -> nextSize)
    val nextP = math.max(1, math.min(cfg.numPartitions,
      ((nextSize * 8) / 50000L).toInt + 1))
    if (nextSize == 0L) t.frontier.replaceEmpty(counters)
    else t.frontier.replace(
      nextFrontier.repartition(nextP, col("url_hash")), counters)
    t.metrics.append(Seq(metrics).toDF().coalesce(1), Map("wave" -> wave.toLong))
    mark("frontier_commit")

    // wave-local filter of the new hashes, merged by the caller — the
    // bloom came back with the seen write's observed metrics
    val useCuckoo = cfg.seenFilter == "cuckoo"
    val waveBloom =
      if (nNewSeen == 0 || useCuckoo || waveBloomBytes == null) null
      else BloomFilter.readFrom(waveBloomBytes)
    val waveCuckoo =
      if (nNewSeen == 0 || !useCuckoo) null
      else {
        import graft.functions.CuckooFilterAgg.cuckoo_filter_agg
        graft.functions.CuckooFilterImpl.deserialize(
          newSeen.agg(cuckoo_filter_agg(col("url_hash"), cfg.bloomItems))
            .head.getAs[Array[Byte]](0))
      }

    mark("bloom_build")
    // keep the wave's seen hashes cached as the next waves' anti-join
    // piece; localCheckpoint truncates lineage so the piece outlives this
    // wave's bloom broadcast (destroyed below) and keeps plan depth flat
    val newPiece =
      if (nNewSeen == 0) null
      else newSeen.select(col("url_hash")).localCheckpoint(true)

    Seq(deferred0, fetchSet, joined, winners, newSeen).foreach(_.unpersist())
    bfB.destroy()
    (metrics, nextSize, waveBloom, waveCuckoo, newPiece)
  }

  private def countersOf(m: WaveMetrics): Map[String, Long] = Map(
    "fetched" -> m.fetched, "deferred" -> m.deferred,
    "robots_blocked" -> m.robots_blocked, "dedup_hits" -> m.dedup_hits,
    "fetch_miss" -> m.fetch_miss)

  /** Golden visit order: dense rank materialized once, at emission. */
  def visitOrder(spark: SparkSession, stateRoot: String, partitions: Int = 32): DataFrame = {
    val t = tables(stateRoot, spark)
    Ranker.denseRank(t.visits.read(), Seq(col("ord")), "rank", 1L, partitions)
      .select(col("rank"), col("wave"), col("url"))
  }

  def seenSet(spark: SparkSession, stateRoot: String): DataFrame =
    tables(stateRoot, spark).seen.read().select("url_hash", "url")

  def crawlDocs(spark: SparkSession, stateRoot: String): DataFrame =
    tables(stateRoot, spark).docs.read()

  def metricsTable(spark: SparkSession, stateRoot: String): DataFrame =
    tables(stateRoot, spark).metrics.read()
}
