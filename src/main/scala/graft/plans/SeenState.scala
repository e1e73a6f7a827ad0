package graft.plans

import graft.functions.{CuckooFilterImpl, LongMembership, UrlExpressions}
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** Distributed URL-seen state for the 10^10 path (SURVEY §7.5(4)): an
  * LSM-style stack of hash-bucketed, executor-resident pieces (the EXACT
  * side of dedup) + one approximate prefilter per bucket (bloom or
  * cuckoo).
  *
  * Scale design — what replaces round 1's single in-memory union + one
  * fixed-size bloom:
  *
  *  - **Bucket-aligned anti-join, candidate rows are the only shuffle.**
  *    Every piece is `repartition(B, url_hash)` + sorted + lineage-
  *    truncated before it is retained, so its physical partitioning
  *    (HashPartitioning on url_hash) is visible to Catalyst. The per-wave
  *    exact check is a CHAIN of left-anti joins: the wave's candidates
  *    exchange once into the B buckets, then every join in the chain
  *    reuses that partitioning — the seen side never re-shuffles, never
  *    re-reads parquet, and the bytes moved per wave are O(candidates),
  *    not O(seen). At 10^10 seen URLs the pieces are ~80 GB of hashes
  *    spread across the cluster (MEMORY_AND_DISK via localCheckpoint);
  *    no single node ever holds the union.
  *  - **Piece compaction.** The chain length is bounded: past `compactAt`
  *    pieces the stack compacts into one (a single re-shuffle of the seen
  *    hashes, amortized O(log waves) times over a crawl — LSM economics).
  *  - **Per-bucket prefilters with saturation-aware resizing.** One
  *    filter per bucket, all sized `perBucketCap`. Wave deltas build per
  *    bucket with ONE `groupBy(pmod(url_hash,B))` aggregate over the
  *    wave's (cached) new rows and merge in. When any bucket's exact
  *    count passes its capacity — the point where a fixed filter's FPP
  *    silently decays toward 1 and the prefilter stops prefiltering —
  *    ALL buckets rebuild at doubled capacity from the pieces
  *    (amortized O(log n) rebuilds). Exactness never depends on the
  *    filter (the anti-join confirms positives); capacity only buys back
  *    the prefilter's selectivity.
  *  - **Deletion (cuckoo mode).** The bounded-retry policy un-sees
  *    re-queued fetch misses: a per-bucket cuckoo delta built over the
  *    retried hashes is DELETED from the bucket filters (partial-key
  *    deletion, CuckooFilterImpl.deleteInPlace) and then re-inserted,
  *    because a retried URL remains in the exact seen set (direct
  *    re-admission; link rediscovery must still dedup against it). No
  *    driver-side collect: the delta rides the same distributed
  *    aggregate as the wave filters.
  *  - **Broadcast LSM (per-wave broadcast bytes are O(wave)).** Shipping
  *    the full filter bank to executors every wave would move O(seen)
  *    bytes per wave (~12 GB at 10^10, 0.01 FPP). Instead the probe face
  *    is layered: a BASE broadcast (the merged bucket filters, re-shipped
  *    only on bootstrap/resize/rebase) plus one small per-wave DELTA
  *    broadcast (bucket filters sized to the wave's own counts). The
  *    probe ORs the layers inside codegen (MightContainLong). Every
  *    `rebaseEvery` waves the deltas fold into a fresh base broadcast —
  *    amortized base re-ship cost O(seen/rebaseEvery) per wave, bounded
  *    probe depth ≤ rebaseEvery+1. Retired broadcasts are destroyed at
  *    the caller's wave boundary ([[releaseRetired]]) — never mid-wave,
  *    because a cache-evicted partition of a wave plan may recompute the
  *    probe.
  */
final class SeenState(
    spark: SparkSession,
    buckets: Int,
    useCuckoo: Boolean,
    expectedItems: Long,
    fpp: Double,
    compactAt: Int,
    rebaseEvery: Int = 8) {

  private val B = buckets
  private var pieces: Vector[DataFrame] = Vector.empty
  private var perBucketCap: Long = math.max(1024L, expectedItems / B)
  private val bucketCounts: Array[Long] = Array.fill(B)(0L)
  private var blooms: Array[BloomFilter] = _
  private var cuckoos: Array[CuckooFilterImpl] = _
  private var nResizes: Int = 0
  private var nCompactions: Int = 0
  private var nRebases: Int = 0
  private var baseBc: Broadcast[LongMembership] = _
  private var deltaBcs: Vector[Broadcast[LongMembership]] = Vector.empty
  private var retiredBcs: Vector[Broadcast[LongMembership]] = Vector.empty
  allocEmptyFilters()

  private def allocEmptyFilters(): Unit =
    if (useCuckoo) cuckoos = Array.fill(B)(CuckooFilterImpl.create(perBucketCap))
    else blooms = Array.fill(B)(BloomFilter.create(perBucketCap, fpp))

  private def bucketCol: Column = pmod(col("url_hash"), lit(B.toLong))

  /** The broadcastable probe face (UrlExpressions.might_contain_long
    * dispatches per row on pmod(url_hash, B)). */
  def prefilter: LongMembership =
    if (useCuckoo)
      LongMembership.Bucketed(cuckoos.map(c => LongMembership.Cuckoo(c): LongMembership))
    else
      LongMembership.Bucketed(blooms.map(b => LongMembership.Bloom(b): LongMembership))

  /** Hash-bucket + sort + truncate lineage: the retained physical layout
    * every later anti-join aligns to without exchanging this side.
    * (checkpointPartitioned = eager localCheckpoint that KEEPS the
    * partitioning visible — plain localCheckpoint loses it under AQE and
    * every wave would re-exchange the whole seen set.) */
  private def prep(hashes: DataFrame): DataFrame =
    GraftShim.checkpointPartitioned(
      hashes.select(col("url_hash"))
        .repartition(B, col("url_hash"))
        .sortWithinPartitions("url_hash"),
      "url_hash", B)

  /** One distributed pass: per-bucket filter images + exact counts.
    * The input is repartitioned BY BUCKET first so the partial-aggregate
    * phase holds ONE filter buffer per partition — without it every
    * partition materializes a buffer for every bucket (partitions × B ×
    * filterBytes), which at 10^8-row bootstraps is gigabytes of
    * aggregation state. */
  private def buildFilters(df: DataFrame): Array[(Int, Array[Byte], Long)] =
    buildFiltersAt(df, perBucketCap)

  // graft_bloom_agg, not Spark's bloom_filter_agg: the builtin clamps
  // items to the 4M runtime-filter conf while keeping the caller's bit
  // count, so its buffers stop merging with BloomFilter.create(...)
  // filters once a bucket resizes past 4M (see BloomFilterAgg doc)
  private def aggFor(cap: Long): Column =
    if (useCuckoo)
      graft.functions.CuckooFilterAgg.cuckoo_filter_agg(col("url_hash"), cap)
    else graft.functions.BloomFilterAgg.graft_bloom_agg(col("url_hash"), cap, fpp)

  private def estFilterBytes(cap: Long): Long =
    if (useCuckoo) cap * 2 else BloomFilter.optimalNumOfBits(cap, fpp) / 8

  /** Partial aggregation holds one filter buffer PER BUCKET PER input
    * partition. Past ~64 MB of per-partition buffer state (the 10^8+
    * bootstrap / resized-cap regime) that is gigabytes of aggregation
    * state, so pre-exchange the rows by bucket — each partition then
    * aggregates exactly one bucket. Below the threshold aggregate in
    * place: exchanging B small partial buffers beats re-shuffling the
    * rows, and at wave scale it keeps the filter build latency-free. */
  private def grouped(df: DataFrame, bufBytesPerBucket: Long) = {
    val base = df.select(col("url_hash"), bucketCol.as("__b"))
    val pre =
      if (B.toLong * bufBytesPerBucket > 64L * 1024 * 1024)
        base.repartition(B, col("__b"))
      else base
    pre.groupBy(col("__b"))
  }

  private def buildFiltersAt(df: DataFrame, cap: Long): Array[(Int, Array[Byte], Long)] =
    grouped(df, estFilterBytes(cap))
      .agg(aggFor(cap).as("f"), count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getLong(0).toInt, r.getAs[Array[Byte]](1), r.getLong(2)))

  /** One distributed pass producing BOTH the merge-sized image and the
    * wave-sized delta image per bucket (the wave path: two jobs folded
    * into one — per-wave filter-build latency, not throughput, is what
    * shows up in a 23-wave crawl). */
  private def buildBigAndDelta(df: DataFrame, bigCap: Long, deltaCap: Long)
      : Array[(Int, Array[Byte], Array[Byte], Long)] =
    grouped(df, estFilterBytes(bigCap) + estFilterBytes(deltaCap))
      .agg(aggFor(bigCap).as("f"), aggFor(deltaCap).as("fd"), count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getLong(0).toInt, r.getAs[Array[Byte]](1),
        r.getAs[Array[Byte]](2), r.getLong(3)))

  private def membershipOf(bytes: Array[Byte]): LongMembership =
    if (useCuckoo) LongMembership.Cuckoo(CuckooFilterImpl.deserialize(bytes))
    else LongMembership.Bloom(BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(bytes)))

  /** Re-ship the merged bucket filters as a fresh base broadcast and
    * retire the old layers (destroyed at the next [[releaseRetired]]). */
  private def rebase(): Unit = {
    if (baseBc != null) { retiredBcs :+= baseBc; nRebases += 1 }
    retiredBcs ++= deltaBcs
    deltaBcs = Vector.empty
    baseBc = spark.sparkContext.broadcast(prefilter)
  }

  private def mergeFilters(fs: Array[(Int, Array[Byte], Long)]): Unit =
    fs.foreach { case (b, bytes, _) =>
      if (useCuckoo) cuckoos(b).mergeInPlace(CuckooFilterImpl.deserialize(bytes))
      else blooms(b).mergeInPlace(BloomFilter.readFrom(bytes))
    }

  private def allPieces: DataFrame = pieces.reduce(_ unionByName _)

  /** Init or resume: absorb the durable seen table in one pass, sizing
    * the bucket filters off the REAL per-bucket cardinality. */
  def bootstrap(seenDf: DataFrame): Unit = {
    awaitFold()
    pieces.foreach(GraftShim.freeCheckpoint) // re-bootstrap (e.g. bank fallback)
    val piece = prep(seenDf)
    pieces = Vector(piece)
    java.util.Arrays.fill(bucketCounts, 0L)
    val counts = piece.groupBy(bucketCol.as("__b")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0).toInt, r.getLong(1)))
    counts.foreach { case (b, n) => bucketCounts(b) = n }
    val maxN = if (counts.isEmpty) 0L else counts.map(_._2).max
    if (maxN > perBucketCap) perBucketCap = 2 * maxN
    allocEmptyFilters()
    mergeFilters(buildFilters(piece))
    rebase()
  }

  // In-flight asynchronous fold (addWaveAsync). Every state-reading
  // entry point awaits it first; only the driver threads touch this.
  private var pending: scala.concurrent.Future[Unit] = null

  /** Block until an in-flight async fold lands (rethrows its failure). */
  def awaitFold(): Unit = if (pending != null) {
    val p = pending; pending = null
    scala.concurrent.Await.result(p, scala.concurrent.duration.Duration.Inf)
  }

  /** [[addWave]] on a future: the fold's result (updated pieces + probe
    * layers) is only needed by the NEXT wave's probe/anti-join, so the
    * caller's commit tail overlaps the piece checkpoint + filter build
    * instead of serializing behind it (~1 s/wave of barrier latency on a
    * 23-wave crawl). Durable state does not depend on the fold — a crash
    * mid-fold resumes by re-bootstrapping from the seen table. */
  def addWaveAsync(newSeenHashes: DataFrame, knownCount: Long)(
      implicit ec: scala.concurrent.ExecutionContext): Unit = {
    awaitFold()
    pending = scala.concurrent.Future(addWave(newSeenHashes, knownCount))
  }

  /** Absorb one wave's new seen hashes (caller guarantees non-empty and
    * cached upstream — the groupBy below reads the cache, not the plan). */
  def addWave(newSeenHashes: DataFrame, knownCount: Long = -1L): Unit = {
    val piece = prep(newSeenHashes)
    pieces :+= piece
    // wave delta for the probe face: bucket filters built at the WAVE's
    // cardinality (a filter image's size tracks capacity, not content —
    // aggregating small is what keeps the per-wave broadcast O(wave)).
    // When the caller already knows the wave's row count (CrawlJob reads
    // it off the seen-append observation) both images build in ONE
    // distributed pass; otherwise a second wave-sized pass sizes the
    // delta off the first pass's exact counts.
    if (knownCount >= 0L) {
      val deltaCap = math.max(2L * knownCount / B, 1024L)
      val both = buildBigAndDelta(piece, perBucketCap, deltaCap)
      mergeFilters(both.map { case (b, f, _, n) => (b, f, n) })
      both.foreach { case (b, _, _, n) => bucketCounts(b) += n }
      if (bucketCounts.max > perBucketCap) resize() // rebases (folds deltas)
      else if (both.nonEmpty)
        pushDelta(both.map { case (b, _, fd, _) => (b, fd) })
    } else {
      val fs = buildFilters(piece)
      mergeFilters(fs)
      fs.foreach { case (b, _, n) => bucketCounts(b) += n }
      if (bucketCounts.max > perBucketCap) resize()
      else if (fs.nonEmpty) {
        val deltaCap = math.max(fs.map(_._3).max * 2, 1024L)
        pushDelta(buildFiltersAt(piece, deltaCap).map { case (b, fd, _) => (b, fd) })
      }
    }
    if (pieces.size >= compactAt) compact()
  }

  private def pushDelta(images: Array[(Int, Array[Byte])]): Unit = {
    val layers: Array[LongMembership] = Array.fill(B)(LongMembership.Empty)
    images.foreach { case (b, bytes) => layers(b) = membershipOf(bytes) }
    deltaBcs :+= spark.sparkContext.broadcast(
      LongMembership.Bucketed(layers): LongMembership)
    if (deltaBcs.size >= rebaseEvery) rebase()
  }

  /** The layered probe column for this wave: base ∨ deltas, all inside
    * whole-stage codegen. Capture per wave (the layer set changes). */
  def probe(c: Column): Column = {
    awaitFold()
    if (baseBc == null) rebase()
    UrlExpressions.might_contain_any(c, baseBc +: deltaBcs)
  }

  /** Destroy broadcasts retired by rebase/resize. Call ONLY at a wave
    * boundary, after every plan that could re-evaluate the previous
    * wave's probe has been committed and unpersisted. */
  def releaseRetired(): Unit = {
    awaitFold()
    retiredBcs.foreach(b => scala.util.Try(b.destroy()))
    retiredBcs = Vector.empty
  }

  /** candidates MINUS seen, exact: one candidate-side exchange into the
    * bucket partitioning, then a zero-exchange join chain over pieces. */
  def antiJoin(cands: DataFrame): DataFrame = {
    awaitFold()
    pieces.foldLeft(cands)((acc, p) => acc.join(p, Seq("url_hash"), "left_anti"))
  }

  /** Cuckoo unsee for the retry path: delete the retried hashes from the
    * bucket filters, then re-insert (they stay in the exact seen set —
    * see class doc). No-op in bloom mode (bloom cannot delete; the
    * retried URL simply stays in the filter, which is also correct). */
  def unseeReinsert(retryHashes: DataFrame): Unit = if (useCuckoo) {
    awaitFold()
    buildFilters(retryHashes).foreach { case (b, bytes, _) =>
      val delta = CuckooFilterImpl.deserialize(bytes)
      cuckoos(b).deleteInPlace(delta)
      cuckoos(b).mergeInPlace(delta)
    }
  }

  /** Driver-side snapshot of the filter bank for durable persistence:
    * (bucket, image, exactCount) per bucket, plus the bank capacity.
    * The caller tags the write with the seen table's version so a later
    * [[bootstrapFromImages]] only ever uses a bank that provably covers
    * the committed seen set (filter completeness is load-bearing: a
    * filter-negative skips the exact anti-join). */
  def exportImages(): (Array[(Int, Array[Byte], Long)], Long) = {
    awaitFold()
    val imgs = (0 until B).map { b =>
      val bytes =
        if (useCuckoo) cuckoos(b).serialize()
        else {
          val o = new java.io.ByteArrayOutputStream()
          blooms(b).writeTo(o)
          o.toByteArray
        }
      (b, bytes, bucketCounts(b))
    }.toArray
    (imgs, perBucketCap)
  }

  /** Resume fast path: a version-matched saved bank replaces both the
    * per-bucket count job AND the filter-build job of [[bootstrap]] —
    * restart cost drops to the single piece-prep pass. */
  def bootstrapFromImages(seenDf: DataFrame,
      images: Array[(Int, Array[Byte], Long)], cap: Long): Unit = {
    awaitFold()
    require(images.length == B, s"bank has ${images.length} buckets, want $B")
    pieces.foreach(GraftShim.freeCheckpoint)
    pieces = Vector(prep(seenDf))
    java.util.Arrays.fill(bucketCounts, 0L)
    images.foreach { case (b, _, n) => bucketCounts(b) = n }
    perBucketCap = cap
    allocEmptyFilters()
    mergeFilters(images)
    rebase()
  }

  private def resize(): Unit = {
    perBucketCap = math.max(perBucketCap * 2, bucketCounts.max * 2)
    nResizes += 1
    allocEmptyFilters()
    mergeFilters(buildFilters(allPieces))
    rebase() // the rebuilt bank covers every piece — deltas fold in
  }

  private def compact(): Unit = {
    val old = pieces
    pieces = Vector(prep(allPieces)) // eager: reads old pieces before the free
    old.foreach(GraftShim.freeCheckpoint)
    nCompactions += 1
  }

  /** Release every persisted piece RDD and broadcast (end of run /
    * bench rep) — leaked pieces or filter broadcasts degrade later reps
    * and long sessions. */
  def close(): Unit = {
    scala.util.Try(awaitFold())
    pieces.foreach(GraftShim.freeCheckpoint)
    pieces = Vector.empty
    releaseRetired()
    (Option(baseBc).toVector ++ deltaBcs).foreach(b => scala.util.Try(b.destroy()))
    baseBc = null
    deltaBcs = Vector.empty
  }

  // introspection (tests + trace)
  def pieceCount: Int = pieces.size
  def capacityPerBucket: Long = perBucketCap
  def totalSeen: Long = bucketCounts.sum
  def resizes: Int = nResizes
  def compactions: Int = nCompactions
  def rebases: Int = nRebases
  def deltaLayers: Int = deltaBcs.size
}
