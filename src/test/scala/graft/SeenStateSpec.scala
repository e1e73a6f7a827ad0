package graft

import graft.plans.SeenState
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unit gates for the bucketed LSM seen state: saturation-aware filter
  * resizing, piece compaction, prefilter no-false-negative contract, and
  * the cuckoo unsee round-trip — the properties the 10^10 design hangs on
  * (exactness itself is prefilter-independent and covered by
  * CrawlEquivalenceSpec). */
class SeenStateSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def hashes(from: Long, until: Long) =
    spark.range(from, until).select(xxhash64(col("id")).as("url_hash"))

  test("filters resize past saturation and keep the no-false-negative contract") {
    val s = new SeenState(spark, buckets = 4, useCuckoo = false,
      expectedItems = 4096L, fpp = 0.01, compactAt = 100)
    val cap0 = s.capacityPerBucket
    s.bootstrap(hashes(0, 1000))
    s.addWave(hashes(1000, 3000))
    s.addWave(hashes(3000, 9000)) // ~2250/bucket > 1024 → resize
    assert(s.resizes >= 1, s"expected a resize, cap=${s.capacityPerBucket}")
    assert(s.capacityPerBucket > cap0)
    assert(s.totalSeen == 9000L)
    // every inserted hash must still probe positive after the rebuild
    val pf = s.prefilter
    val all = hashes(0, 9000).collect().map(_.getLong(0))
    assert(all.forall(pf.mightContain), "false negative after resize")
    // and the exact anti-join agrees with set-minus
    val got = s.antiJoin(hashes(8000, 10000)).collect().map(_.getLong(0)).toSet
    val byId = spark.range(0, 10000).select(col("id"), xxhash64(col("id")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == (9000L until 10000L).map(byId).toSet)
  }

  test("graft_bloom_agg buffers merge with driver filters sized past Spark's 4M clamp") {
    // Spark's builtin BloomFilterAggregate silently clamps its item count
    // to spark.sql.optimizer.runtime.bloomFilter.maxNumItems (4M) while
    // keeping the caller's bit count — past 4M capacity its buffers get a
    // different hash-function count than BloomFilter.create(items, fpp)
    // and mergeInPlace throws IncompatibleMergeException. Buckets resize
    // PAST 4M by design, so the engine's own aggregate must track the
    // exact (items, fpp) sizing. Capacity (not item count) triggers the
    // bug, so this is cheap: 1k rows aggregated at 8M capacity.
    val cap = 8L * 1000 * 1000
    val img = hashes(0, 1000)
      .agg(graft.functions.BloomFilterAgg.graft_bloom_agg(col("url_hash"), cap, 0.01))
      .collect()(0).getAs[Array[Byte]](0)
    val agg = org.apache.spark.util.sketch.BloomFilter.readFrom(img)
    val driverSide = org.apache.spark.util.sketch.BloomFilter.create(cap, 0.01)
    driverSide.mergeInPlace(agg) // builtin agg throws IncompatibleMergeException here
    val all = hashes(0, 1000).collect().map(_.getLong(0))
    assert(all.forall(driverSide.mightContainLong), "false negative after merge")
  }

  test("layered probe (base + wave deltas) has no false negatives across rebase and resize") {
    val s = new SeenState(spark, buckets = 4, useCuckoo = false,
      expectedItems = 4096L, fpp = 0.01, compactAt = 100, rebaseEvery = 2)
    def allPositive(from: Long, until: Long): Boolean =
      hashes(from, until).select(s.probe(col("url_hash")).as("m"))
        .collect().forall(_.getBoolean(0))
    s.bootstrap(hashes(0, 1000))          // base broadcast #1
    assert(s.deltaLayers == 0)
    s.addWave(hashes(1000, 2000), knownCount = 1000L) // delta 1, one-pass path
    assert(s.deltaLayers == 1 && allPositive(0, 2000))
    s.addWave(hashes(2000, 3000))         // delta 2 (two-pass path) -> rebase folds them
    assert(s.deltaLayers == 0 && s.rebases >= 1, "expected a rebase at rebaseEvery")
    assert(allPositive(0, 3000))
    s.addWave(hashes(3000, 9000))         // > cap -> resize, which rebases
    assert(s.resizes >= 1 && s.deltaLayers == 0)
    assert(allPositive(0, 9000), "false negative after resize rebase")
    // the layered probe must still prefilter: unseen hashes mostly negative
    val fp = hashes(100000, 101000).select(s.probe(col("url_hash")).as("m"))
      .collect().count(_.getBoolean(0))
    assert(fp < 200, s"prefilter selectivity collapsed: $fp/1000 false positives")
    s.close()
  }

  test("filter bank export/import: resumed state probes and anti-joins identically") {
    for (cuckoo <- Seq(false, true)) {
      val a = new SeenState(spark, buckets = 4, useCuckoo = cuckoo,
        expectedItems = 4096L, fpp = 0.01, compactAt = 100)
      a.bootstrap(hashes(0, 2000))
      a.addWave(hashes(2000, 6000), knownCount = 4000L) // forces a resize past cap0
      val (images, cap) = a.exportImages()
      assert(cap == a.capacityPerBucket && images.map(_._3).sum == 6000L)

      val b = new SeenState(spark, buckets = 4, useCuckoo = cuckoo,
        expectedItems = 4096L, fpp = 0.01, compactAt = 100)
      b.bootstrapFromImages(hashes(0, 6000), images, cap)
      assert(b.capacityPerBucket == cap && b.totalSeen == 6000L)
      // no false negative: every seen hash probes positive on the resumed bank
      val pos = hashes(0, 6000).select(b.probe(col("url_hash")).as("m")).collect()
      assert(pos.forall(_.getBoolean(0)), s"false negative after import (cuckoo=$cuckoo)")
      // exact anti-join over the re-prepped piece agrees with set-minus
      val got = b.antiJoin(hashes(5000, 8000)).collect().map(_.getLong(0)).toSet
      val byId = spark.range(0, 8000).select(col("id"), xxhash64(col("id")))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(got == (6000L until 8000L).map(byId).toSet)
      a.close(); b.close()
    }
  }

  test("piece stack compacts (anti-join chain length stays bounded)") {
    val s = new SeenState(spark, buckets = 4, useCuckoo = false,
      expectedItems = 100000L, fpp = 0.01, compactAt = 4)
    s.bootstrap(hashes(0, 100))
    (1 to 6).foreach(i => s.addWave(hashes(i * 100L, i * 100L + 100)))
    assert(s.compactions >= 1)
    assert(s.pieceCount < 4)
    assert(s.totalSeen == 700L)
    val got = s.antiJoin(hashes(650, 800)).collect().map(_.getLong(0)).toSet
    val byId = spark.range(0, 800).select(col("id"), xxhash64(col("id")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == (700L until 800L).map(byId).toSet)
  }

  test("tiered compaction: 30-wave run never re-shuffles the base piece") {
    // VERDICT r3 #3 gate. Base 50k ≫ waves of 1k: the all-pieces union
    // would re-merge the base every ~compactAt waves (≈6 × ~55-80k ≈ 400k
    // rows re-shuffled); the size-tiered policy merges only similar-sized
    // runs, so the base piece must survive the whole run untouched and
    // the background shuffle volume stays ∝ Σwaves·log, not ∝ seen·waves.
    val s = new SeenState(spark, buckets = 4, useCuckoo = false,
      expectedItems = 100000L, fpp = 0.01, compactAt = 6)
    s.bootstrap(hashes(0, 50000))
    (0 until 30).foreach { i =>
      s.addWave(hashes(50000L + i * 1000L, 50000L + (i + 1) * 1000L), 1000L)
      assert(s.pieceCount < 6 || s.pieceCount == s.pieceSizesView.size,
        "piece bookkeeping out of sync")
    }
    assert(s.pieceCount < 6, s"chain unbounded: ${s.pieceCount}")
    assert(s.compactions >= 1)
    // the witness: the 50k base was never part of a merge group…
    assert(s.pieceSizesView.contains(50000L),
      s"base piece was re-merged; sizes=${s.pieceSizesView}")
    // …and total compaction shuffle stayed far under the all-union volume
    assert(s.compactedRowsTotal < 150000L,
      s"compaction re-shuffled ${s.compactedRowsTotal} rows (old scheme ≈ 400k)")
    assert(s.totalSeen == 80000L)
    // exactness after 30 waves of tiered merging
    val got = s.antiJoin(hashes(79000, 81000)).collect().map(_.getLong(0)).toSet
    val byId = spark.range(79000, 81000).select(col("id"), xxhash64(col("id")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == (80000L until 81000L).map(byId).toSet)
    s.close()
  }

  test("cuckoo mode: unseeReinsert round-trips without false negatives") {
    val s = new SeenState(spark, buckets = 4, useCuckoo = true,
      expectedItems = 100000L, fpp = 0.01, compactAt = 8)
    s.bootstrap(hashes(0, 2000))
    // un-see 500 retried hashes, then (as the engine does) re-insert them
    s.unseeReinsert(hashes(500, 1000))
    val pf = s.prefilter
    val all = hashes(0, 2000).collect().map(_.getLong(0))
    assert(all.forall(pf.mightContain), "false negative after unsee round-trip")
  }

  test("bucketed probe routes negative hashes correctly (partition-aligned buckets)") {
    val s = new SeenState(spark, buckets = 8, useCuckoo = false,
      expectedItems = 10000L, fpp = 0.01, compactAt = 8)
    // xxhash64 produces negative longs ~half the time; bootstrap + probe
    // must agree on the bucket for those
    s.bootstrap(hashes(0, 4000))
    val pf = s.prefilter
    val negs = hashes(0, 4000).collect().map(_.getLong(0)).filter(_ < 0)
    assert(negs.nonEmpty)
    assert(negs.forall(pf.mightContain), "false negative on negative hash")
    s.close()
  }

  test("bucketOf IS the repartition(B, url_hash) partition id (co-location contract)") {
    // the whole post-exchange O(seen/B) residency argument hangs on this:
    // the bank bucket function must equal HashPartitioning's partition id
    for (b <- Seq(4, 8, 32)) {
      val rows = hashes(0, 5000).repartition(b, col("url_hash"))
        .select(col("url_hash"), spark_partition_id().as("pid"))
        .collect()
      rows.foreach { r =>
        val h = r.getLong(0)
        assert(graft.functions.LongMembership.bucketOf(h, b) == r.getInt(1),
          s"bucketOf($h, $b) != partition id ${r.getInt(1)}")
      }
    }
  }

  test("per-wave filter maintenance is O(wave): delta-only builds, bank untouched") {
    val s = new SeenState(spark, buckets = 4, useCuckoo = false,
      expectedItems = 800000L, fpp = 0.01, compactAt = 100)
    s.bootstrap(hashes(0, 200000)) // bank capacity 200k/bucket
    val bankBytes = (0 until 4).map { b =>
      graft.functions.LongMembership.loadBucketBytes(s.currentBankDirs, b).length.toLong
    }.sum
    s.addWave(hashes(200000, 201000), knownCount = 1000L) // 1k-row wave
    val waveBytes = s.lastWaveCollectedFilterBytes
    assert(waveBytes > 0L)
    assert(waveBytes * 10 < bankBytes,
      s"wave collected $waveBytes bytes vs bank $bankBytes — not delta-sized")
    // proportionality: a 10x wave collects ~10x, never bank-sized
    s.addWave(hashes(201000, 211000), knownCount = 10000L)
    val waveBytes10 = s.lastWaveCollectedFilterBytes
    assert(waveBytes10 < bankBytes / 4,
      s"10x wave collected $waveBytes10 vs bank $bankBytes")
    // no false negatives across the delta layers
    val pos = hashes(199000, 211000).select(s.probe(col("url_hash")).as("m")).collect()
    assert(pos.forall(_.getBoolean(0)), "false negative across bank+delta layers")
    s.close()
  }

  test("base probe broadcast carries paths, not filter images (no O(seen) broadcast)") {
    val s = new SeenState(spark, buckets = 4, useCuckoo = false,
      expectedItems = 400000L, fpp = 0.01, compactAt = 100)
    s.bootstrap(hashes(0, 100000))
    s.baseFace match {
      case fb: graft.functions.LongMembership.FileBank =>
        assert(fb.buckets == 4 && fb.dirs.nonEmpty)
      case other => fail(s"base broadcast is ${other.getClass.getSimpleName}, want FileBank")
    }
    s.close()
  }

  test("cuckoo delta layers are never lossy under bucket skew (saturation rebuild)") {
    val s = new SeenState(spark, buckets = 4, useCuckoo = true,
      expectedItems = 400000L, fpp = 0.01, compactAt = 100)
    s.bootstrap(hashes(0, 1000))
    // a wave whose knownCount-based sizing guess (2*n/B) would overflow if
    // every row landed in few buckets: lie about the count to force the
    // per-bucket guess far below the real cardinality
    s.addWave(hashes(1000, 9000), knownCount = 100L) // guess 1024/bucket, real ~2000
    val all = hashes(0, 9000).select(s.probe(col("url_hash")).as("m")).collect()
    assert(all.forall(_.getBoolean(0)),
      "false negative — a lossy cuckoo delta layer was pushed")
    s.close()
  }

  test("freshAndConfirmed large-wave path: shared candidate cache, same result, freed at boundary") {
    // the candsHint >= CheckpointCandsAt path wraps the bucket exchange in
    // ONE lazy columnar cache both branches share (AQE materialized the
    // exchange twice on this union shape — r6 kernel finding); the hint is
    // caller-provided, so the path is exercised directly at test scale
    val s = new SeenState(spark, buckets = 4, useCuckoo = false,
      expectedItems = 40000L, fpp = 0.01, compactAt = 8)
    try {
      s.bootstrap(hashes(0, 3000))
      s.addWave(hashes(3000, 4000))
      val rddsBefore = spark.sparkContext.getPersistentRDDs.size
      val out = s.freshAndConfirmed(hashes(2000, 6000), SeenState.CheckpointCandsAt)
      val got = out.collect().map(_.getLong(0)).toSet
      val byId = spark.range(0, 6000).select(col("id"), xxhash64(col("id")))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(got == (4000L until 6000L).map(byId).toSet,
        "cache-path result must equal exact set-minus")
      // both branches must read the shared candidate cache (one shuffle
      // dependency — the single materialization itself is evidenced by
      // the committed kernel stage profiles, plans/r06)
      val plan = out.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
      assert(plan.contains("InMemoryTableScan"),
        s"large-wave path must read the shared candidate cache:\n${plan.take(3000)}")
      // wave boundary frees the cache (a leaked multi-GB cache per wave
      // would churn storage memory across a crawl)
      s.releaseRetired()
      assert(spark.sparkContext.getPersistentRDDs.size <= rddsBefore,
        "candidate cache must be dropped at the wave boundary")
    } finally s.close()
  }

  test("freshAndConfirmed equals exact set-minus and reuses one exchange") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val s = new SeenState(spark, buckets = 4, useCuckoo = false,
        expectedItems = 40000L, fpp = 0.01, compactAt = 8)
      s.bootstrap(hashes(0, 3000))
      s.addWave(hashes(3000, 4000))
      val out = s.freshAndConfirmed(hashes(2000, 6000))
      val got = out.collect().map(_.getLong(0)).toSet
      val byId = spark.range(0, 6000).select(col("id"), xxhash64(col("id")))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(got == (4000L until 6000L).map(byId).toSet)
      // ONE candidate exchange feeds both the fresh filter and the join
      // chain (exchange reuse) — the seen side exchanges zero rows
      val plan = out.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
      val exchanges = plan.linesIterator
        .filter(l => l.contains("Exchange hashpartitioning") && !l.contains("ReusedExchange"))
        .size
      assert(exchanges == 1,
        s"expected 1 candidate exchange on the dedup path, got $exchanges:\n${plan.take(4000)}")
      assert(plan.contains("ReusedExchange"),
        s"fresh/maybe branches must share the candidate exchange:\n${plan.take(4000)}")
      // the probe must sit ABOVE the exchange (post-exchange = one bucket
      // per task) and must NOT be inferred onto the seen-piece side
      assert(!plan.linesIterator.exists(l =>
          l.contains("mightcontainlong") && l.contains("Scan ExistingRDD")),
        s"probe leaked onto the seen pieces:\n${plan.take(4000)}")
      s.close()
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
