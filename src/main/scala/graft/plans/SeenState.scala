package graft.plans

import graft.functions.{CuckooFilterImpl, LongMembership, UrlExpressions}
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

import graft.sources.StateIO

import java.nio.file.Files

/** Distributed URL-seen state for the 10^10 path (SURVEY §7.5(4)): an
  * LSM-style stack of hash-bucketed, executor-resident pieces (the EXACT
  * side of dedup) + one approximate prefilter per bucket (bloom or
  * cuckoo).
  *
  * Scale design — per-wave maintenance is O(wave) in BOTH directions and
  * the probe face is O(seen/B) per executor:
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
  *  - **Piece compaction is SIZE-TIERED.** The chain length is bounded:
  *    past `compactAt` pieces, similar-sized runs merge (smallest-first,
  *    a run joins the merge group only while its size ≤ the group's
  *    running total — the classic LSM/logarithmic-method invariant). A
  *    large base piece is re-shuffled only when the accumulated smaller
  *    runs are comparable to it, so each seen row is re-merged
  *    O(log(seen/wave)) times over a crawl; the previous all-pieces
  *    union re-shuffled the WHOLE seen set every ~compactAt waves —
  *    ~O(seen/compactAt) rows/wave of background shuffle at 10^10 seen
  *    (VERDICT r3 "what's wrong" #3). [[compactedRowsTotal]] witnesses
  *    the volume; the SeenStateSpec 30-wave gate asserts the base piece
  *    stays un-reshuffled while waves ≪ base.
  *  - **Per-wave filter builds are DELTA-ONLY.** A wave builds per-bucket
  *    filter images sized to the WAVE's own counts (one distributed
  *    aggregate over the wave's cached rows) — the bytes collected to the
  *    driver per wave are ∝ wave size ([[lastWaveCollectedFilterBytes]]
  *    proves it), never ∝ seen capacity. Cuckoo deltas are verified
  *    LOSSLESS: the aggregate carries a dropped-insert count in the image
  *    header, and any saturation (a skewed bucket overflowing its sizing
  *    guess) rebuilds the delta at the bucket's exact cardinality — a
  *    lossy layer is never pushed (a filter false negative would skip the
  *    exact anti-join and re-admit a seen URL).
  *  - **The merged bank lives in shared storage, not on the driver and
  *    not in a broadcast.** Every `rebaseEvery` waves (and on saturation
  *    resize) the bank is rebuilt FROM THE PIECES by one distributed pass
  *    whose tasks write per-bucket image files under `bankRoot` — the
  *    driver never holds or ships an O(seen-capacity) image (round 2
  *    collected ~12 GB/wave to the driver at the 10^10 design point; this
  *    collects the per-bucket (count, dropped) stats only). Amortized
  *    bank-rebuild cost is O(seen/rebaseEvery) rows per wave.
  *  - **Probe face = FileBank base + per-wave delta broadcasts.** The
  *    base broadcast carries only the bank dir paths
  *    ([[LongMembership.FileBank]]); executors fault in per-bucket images
  *    lazily. Because the bank bucket function IS the candidate
  *    exchange's partition id ([[LongMembership.bucketOf]]), probing
  *    AFTER the exchange ([[freshAndConfirmed]]) touches exactly one
  *    bucket per task — executor residency is O(seen/B) per task slot,
  *    not O(seen). Wave deltas ride as small in-memory broadcast layers
  *    (O(wave) bytes) OR-ed in codegen (MightContainLong), folded into
  *    the bank at the next rebase; probe depth ≤ rebaseEvery+1.
  *  - **Nothing broadcast-reachable is ever mutated.** Delta layers are
  *    immutable once broadcast; bank files are immutable once written
  *    (rebase/resize/unsee write NEW versioned dirs); retired broadcasts
  *    and dirs are destroyed only at the caller's wave boundary
  *    ([[releaseRetired]]) because a cache-evicted partition of a live
  *    wave plan may recompute the probe mid-wave.
  *  - **Deletion (cuckoo mode).** The bounded-retry policy un-sees
  *    re-queued fetch misses: a per-bucket cuckoo delta built over the
  *    retried hashes is deleted-then-reinserted against COPIES of the
  *    affected bucket images, written as an overlay dir (partial-key
  *    deletion, CuckooFilterImpl.deleteInPlace) — the retried URL remains
  *    in the exact seen set (direct re-admission; link rediscovery must
  *    still dedup against it), and no live broadcast observes a
  *    transiently-missing fingerprint.
  */
final class SeenState(
    spark: SparkSession,
    buckets: Int,
    useCuckoo: Boolean,
    expectedItems: Long,
    fpp: Double,
    compactAt: Int,
    rebaseEvery: Int = 8,
    bankRoot: String = null) {

  import spark.implicits._

  private val B = buckets
  private var pieces: Vector[DataFrame] = Vector.empty
  // Exact row count per piece, parallel to `pieces` — drives the
  // size-tiered merge policy (which runs are "similar-sized").
  private var pieceSizes: Vector[Long] = Vector.empty
  private var compactedRows: Long = 0L
  private var perBucketCap: Long = math.max(1024L, expectedItems / B)
  private val bucketCounts: Array[Long] = Array.fill(B)(0L)
  private var nResizes: Int = 0
  private var nCompactions: Int = 0
  private var nRebases: Int = 0
  private var baseBc: Broadcast[LongMembership] = _
  private var deltaBcs: Vector[Broadcast[LongMembership]] = Vector.empty
  private var deltaFaces: Vector[LongMembership] = Vector.empty
  private var retiredBcs: Vector[Broadcast[LongMembership]] = Vector.empty
  private var retiredDirs: Vector[String] = Vector.empty
  private var bankDirs: Vector[String] = Vector.empty
  private var bankVersion: Int = 0
  private var lastCollected: Long = 0L
  private var totalCollected: Long = 0L

  // Unique instance root: a crashed run's stale bank files must never be
  // read as current state (the durable bank rides the IceLite filters
  // table, version-gated — these dirs are scratch).
  private val instRoot: String = {
    val base =
      if (bankRoot != null) bankRoot
      else Files.createTempDirectory("graft-seen-bank").toString
    val inst = s"$base/${java.util.UUID.randomUUID.toString.take(8)}"
    StateIO.forPath(inst).mkdirs(inst)
    inst
  }

  /** Bucket column — MUST equal the partition id `repartition(B,
    * url_hash)` assigns (pmod(murmur3, B), see LongMembership.bucketOf)
    * so bank buckets co-locate with exchanged candidates. */
  private def bucketCol: Column = pmod(hash(col("url_hash")), lit(B)).cast("int")

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

  /** One distributed pass: per-bucket (image, exact count, dropped
    * inserts). `dropped` is nonzero only for a saturated cuckoo build —
    * the caller must treat such an image as LOSSY and rebuild bigger. */
  private def buildImages(df: DataFrame, cap: Long): Array[(Int, Array[Byte], Long, Long)] =
    grouped(df, estFilterBytes(cap))
      .agg(aggFor(cap).as("f"), count(lit(1)).as("n"))
      .collect()
      .map { r =>
        val img = r.getAs[Array[Byte]](1)
        val dropped = if (useCuckoo) CuckooFilterImpl.droppedOf(img) else 0L
        (r.getInt(0), img, r.getLong(2), dropped)
      }

  /** Wave-sized delta images, guaranteed lossless (cuckoo) and sized to
    * the real per-bucket cardinality (a skewed bucket past the initial
    * guess triggers a rebuild at its exact count — bloom keeps its FPP,
    * cuckoo keeps the no-false-negative contract). Collected bytes are
    * ∝ the wave's row count, never ∝ seen capacity. */
  private def buildDelta(df: DataFrame, capGuess: Long): Array[(Int, Array[Byte], Long, Long)] = {
    var cap = capGuess
    var fs = buildImages(df, cap)
    var attempts = 0
    while (fs.nonEmpty && attempts < 6 &&
        (fs.map(_._4).sum > 0L || fs.map(_._3).max > cap)) {
      cap = math.max(2 * fs.map(_._3).max, cap * 2)
      fs = buildImages(df, cap)
      attempts += 1
    }
    require(fs.forall(_._4 == 0L),
      s"cuckoo delta still lossy after $attempts rebuilds (cap=$cap)")
    fs
  }

  private def membershipOf(bytes: Array[Byte]): LongMembership =
    LongMembership.deserializeFilter(bytes, useCuckoo)

  private def nextBankDir(): String = {
    bankVersion += 1
    s"$instRoot/v$bankVersion"
  }

  /** One distributed pass over `df` building the bank at `cap`: tasks
    * write per-bucket image files under `dir` (shared storage) and only
    * per-bucket (count, dropped) stats return to the driver — the images
    * themselves never leave the executors. */
  private def writeBankFiles(df: DataFrame, cap: Long, dir: String): Array[(Int, Long, Long)] = {
    StateIO.forPath(dir).mkdirs(dir)
    val cuckoo = useCuckoo
    grouped(df, estFilterBytes(cap))
      .agg(aggFor(cap).as("f"), count(lit(1)).as("n"))
      .select(col("__b"), col("f"), col("n"))
      .as[(Int, Array[Byte], Long)]
      .map { case (b, img, n) =>
        val dropped = if (cuckoo) CuckooFilterImpl.droppedOf(img) else 0L
        if (dropped == 0L) SeenState.writeBucketFile(dir, b, img)
        (b, n, dropped)
      }
      .collect()
  }

  /** Retire the current probe layers and install `dirs` as the new base.
    * `foldDeltas`: the new bank was rebuilt from the pieces and therefore
    * covers every delta — fold them (rebase/resize). An unsee overlay
    * leaves the deltas in place (bank coverage is unchanged). */
  private def swapBase(dirs: Vector[String], foldDeltas: Boolean): Unit = {
    if (baseBc != null) { retiredBcs :+= baseBc; nRebases += 1 }
    if (foldDeltas) {
      retiredBcs ++= deltaBcs
      deltaBcs = Vector.empty
      deltaFaces = Vector.empty
    }
    retiredDirs ++= bankDirs.diff(dirs)
    bankDirs = dirs
    baseBc = spark.sparkContext.broadcast(
      LongMembership.FileBank(dirs, B, useCuckoo): LongMembership)
    if (sys.env.contains("GRAFT_TRACE"))
      println(s"[seen] base broadcast id=${baseBc.id} retired=${retiredBcs.map(_.id)}")
  }

  /** Rebuild the bank from the pieces at the current capacity (growing it
    * if a bucket outgrew the cap or a cuckoo build saturated) and swap it
    * in. Amortized: called every `rebaseEvery` waves (delta fold), on
    * saturation resize, and at bootstrap. Returns per-bucket counts. */
  private def materializeBank(): Array[(Int, Long)] = {
    var out: Array[(Int, Long)] = null
    var done = false
    while (!done) {
      val dir = nextBankDir()
      val stats =
        if (pieces.isEmpty) Array.empty[(Int, Long, Long)]
        else writeBankFiles(allPieces, perBucketCap, dir)
      val maxN = if (stats.isEmpty) 0L else stats.map(_._2).max
      val drops = stats.map(_._3).sum
      if (drops > 0L || maxN > perBucketCap) {
        SeenState.deleteDir(dir) // scrapped attempt — never broadcast
        perBucketCap = math.max(perBucketCap * 2, maxN * 2)
      } else {
        swapBase(Vector(dir), foldDeltas = true)
        out = stats.map(t => (t._1, t._2))
        done = true
      }
    }
    out
  }

  private def allPieces: DataFrame = pieces.reduce(_ unionByName _)

  /** Init or resume: absorb the durable seen table in one pass. The bank
    * build sizes itself off the real per-bucket cardinality (capacity
    * doubles until every bucket fits). */
  def bootstrap(seenDf: DataFrame): Unit = {
    awaitFold()
    pieces.foreach(GraftShim.freeCheckpoint) // re-bootstrap (e.g. bank fallback)
    pieces = Vector(prep(seenDf))
    java.util.Arrays.fill(bucketCounts, 0L)
    materializeBank().foreach { case (b, n) => bucketCounts(b) = n }
    pieceSizes = Vector(bucketCounts.sum)
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
    * cached upstream — the delta aggregate reads the cache, not the
    * plan). Per-wave cost: one piece prep + one WAVE-SIZED delta build;
    * the merged bank is only touched at rebase/resize/compact
    * boundaries. */
  def addWave(newSeenHashes: DataFrame, knownCount: Long = -1L): Unit = {
    val piece = prep(newSeenHashes)
    pieces :+= piece
    val capGuess =
      if (knownCount >= 0L) math.max(2L * knownCount / B, 1024L) else 1024L
    val fs = buildDelta(piece, capGuess)
    pieceSizes :+= fs.map(_._3).sum
    fs.foreach { case (b, _, n, _) => bucketCounts(b) += n }
    lastCollected = fs.map(_._2.length.toLong).sum
    totalCollected += lastCollected
    if (bucketCounts.max > perBucketCap) resize()
    else if (fs.nonEmpty) {
      pushDelta(fs.map { case (b, img, _, _) => (b, img) })
      if (deltaBcs.size >= rebaseEvery) rebase()
    }
    if (pieces.size >= compactAt) compact()
  }

  private def pushDelta(images: Array[(Int, Array[Byte])]): Unit = {
    val layers: Array[LongMembership] = Array.fill(B)(LongMembership.Empty)
    images.foreach { case (b, bytes) => layers(b) = membershipOf(bytes) }
    val face: LongMembership = LongMembership.Bucketed(layers)
    deltaFaces :+= face
    val __bc = spark.sparkContext.broadcast(face)
    if (sys.env.contains("GRAFT_TRACE"))
      println(s"[seen] delta broadcast id=${__bc.id}")
    deltaBcs :+= __bc
  }

  /** Fold the delta layers into a fresh bank rebuilt from the pieces —
    * one distributed pass, amortized O(seen/rebaseEvery) rows per wave;
    * nothing O(seen) touches the driver. */
  private def rebase(): Unit = {
    materializeBank()
    ()
  }

  /** The probe face (driver-side view, for tests/tools): bank ∨ deltas. */
  def prefilter: LongMembership =
    LongMembership.Layered(
      (LongMembership.FileBank(bankDirs, B, useCuckoo): LongMembership) +: deltaFaces)

  /** The layered probe column for this wave: base ∨ deltas, all inside
    * whole-stage codegen. Capture per wave (the layer set changes).
    * NOTE: memory-bounded only AFTER a repartition(B, url_hash) — use
    * [[freshAndConfirmed]] on the hot path so each task faults in just
    * its own bucket's image. */
  def probe(c: Column): Column = {
    awaitFold()
    if (baseBc == null) materializeBankIfAny()
    UrlExpressions.might_contain_any(c, baseBc +: deltaBcs)
  }

  private def materializeBankIfAny(): Unit =
    if (pieces.nonEmpty) { materializeBank(); () }
    else swapBase(Vector(nextBankDir()), foldDeltas = false) // empty bank

  /** Destroy broadcasts and bank dirs retired by rebase/resize/unsee.
    * Call ONLY at a wave boundary, after every plan that could
    * re-evaluate the previous wave's probe has been committed and
    * unpersisted (a recomputed partition may lazily fault in a retired
    * bucket image mid-wave). */
  def releaseRetired(): Unit = {
    awaitFold()
    // unpersist, NOT destroy: executor blocks are freed now (the memory
    // that matters at scale), but the handle stays serializable — plan /
    // RDD object graphs from earlier waves (piece lineage, cached plan
    // trees) can still transitively reference a retired broadcast when a
    // later wave's task closure serializes, and a destroyed handle fails
    // that serialization outright. The driver-held value is garbage once
    // unreferenced; ContextCleaner then destroys it. close() still hard-
    // destroys everything at end of run (bench reps must not leak).
    retiredBcs.foreach(b => scala.util.Try(b.unpersist(blocking = false)))
    retiredBcs = Vector.empty
    retiredDirs.foreach(SeenState.deleteDir)
    retiredDirs = Vector.empty
    freeCandCk() // the wave's dedup plans are committed — drop the candidate checkpoint
  }

  /** candidates MINUS seen, exact: one candidate-side exchange into the
    * bucket partitioning, then a zero-exchange join chain over pieces. */
  def antiJoin(cands: DataFrame): DataFrame = {
    awaitFold()
    pieces.foldLeft(cands)((acc, p) => acc.join(p, Seq("url_hash"), "left_anti"))
  }

  /** The wave dedup in one plan, scale-shaped: candidates exchange ONCE
    * into the bucket partitioning (O(wave) bytes — the only shuffle),
    * the layered prefilter probes POST-exchange (task p loads only bucket
    * p's image: O(seen/B) resident), filter-negatives skip the join chain
    * entirely, filter-positives get exact confirmation against the
    * pre-partitioned pieces with zero seen-side exchange. Returns
    * fresh ∪ confirmed (the truly-new candidates).
    *
    * `candsHint` (-1 = unknown): past [[SeenState.CheckpointCandsAt]]
    * rows, the exchanged candidates are wrapped in a LAZY columnar cache
    * before the fresh/confirmed split. Both branches then reference one
    * InMemoryRelation — one shuffle dependency, so the exchange's map
    * stage runs exactly once and each cached partition is computed once
    * (block-level getOrElseUpdate) — where the plain two-branch plan
    * materialized the exchange TWICE over a persisted ranked fetch-set
    * (two full map stages, 2.3 GB shuffle written each, the second alone
    * ~45% of r6 kernel wall at 64M rows; AQE's exchange reuse fires on
    * the small deterministic probe plan in PLANS.md but not on this
    * shape). Lazy on purpose: no extra materialization pass — the first
    * branch to touch a partition computes and caches it. Below the
    * threshold the plain plan wins (a small wave should not pay a cache
    * round-trip). The cache is released at the next call, at
    * [[releaseRetired]] (wave boundary), and at [[close]]. */
  def freshAndConfirmed(cands: DataFrame, candsHint: Long = -1L): DataFrame = {
    awaitFold()
    if (pieces.isEmpty) return cands
    if (baseBc == null) materializeBankIfAny()
    freeCandCk()
    val parts =
      if (candsHint >= SeenState.CheckpointCandsAt) {
        candCk = cands.repartition(B, col("url_hash")).persist()
        candCk
      } else cands.repartition(B, col("url_hash"))
    val might = UrlExpressions.might_contain_any(col("url_hash"), baseBc +: deltaBcs)
    val fresh = parts.filter(!might)
    val confirmed = pieces.foldLeft(parts.filter(might))(
      (acc, p) => acc.join(p, Seq("url_hash"), "left_anti"))
    fresh.unionByName(confirmed)
  }

  // the one live candidate-side cache (freshAndConfirmed large path)
  private var candCk: DataFrame = null
  private def freeCandCk(blocking: Boolean = false): Unit = if (candCk != null) {
    scala.util.Try(candCk.unpersist(blocking))
    candCk = null
  }

  /** Cuckoo unsee for the retry path: delete the retried hashes from the
    * affected bucket images, then re-insert (they stay in the exact seen
    * set — see class doc). The rewrite happens on COPIES loaded from the
    * bank files and lands as an overlay dir — no filter reachable from a
    * live broadcast is ever mutated. No-op in bloom mode (bloom cannot
    * delete; the retried URL simply stays in the filter, also correct). */
  def unseeReinsert(retryHashes: DataFrame): Unit = if (useCuckoo) {
    awaitFold()
    if (baseBc == null) materializeBankIfAny()
    // the retried hashes travel RAW, grouped by bucket (O(wave) longs) —
    // a delta filter image can't apply: delete needs the bank's own
    // geometry, and building at bank capacity would be the O(capacity)
    // collect this design removed
    val byBucket = retryHashes.select(col("url_hash"), bucketCol.as("__b"))
      .groupBy(col("__b")).agg(collect_list(col("url_hash")).as("hs"))
      .as[(Int, Seq[Long])].collect()
    if (byBucket.isEmpty) return
    val overlay = nextBankDir()
    StateIO.forPath(overlay).mkdirs(overlay)
    val dirs = bankDirs
    val cap = perBucketCap
    spark.createDataset(byBucket.toSeq)
      .map { case (b, hs) =>
        val cur = LongMembership.loadBucketBytes(dirs, b)
        val bank =
          if (cur == null) CuckooFilterImpl.create(cap)
          else CuckooFilterImpl.deserialize(cur)
        hs.foreach(bank.delete)
        hs.foreach(bank.insert)
        SeenState.writeBucketFile(overlay, b, bank.serialize())
        b
      }
      .collect()
    // overlay wins for the rewritten buckets; older dirs stay referenced
    swapBase(overlay +: bankDirs, foldDeltas = false)
  }

  /** Driver-side snapshot of the merged filter bank (pending deltas are
    * folded first): (bucket, image, exactCount) per bucket + capacity.
    * O(seen-capacity) driver bytes — a test/tool face; the production
    * persistence path is the distributed [[bankDf]]. */
  def exportImages(): (Array[(Int, Array[Byte], Long)], Long) = {
    awaitFold()
    if (deltaBcs.nonEmpty) rebase()
    if (baseBc == null) materializeBankIfAny()
    val imgs = (0 until B).map { b =>
      val bytes = Option(LongMembership.loadBucketBytes(bankDirs, b))
        .getOrElse(emptyImage())
      (b, bytes, bucketCounts(b))
    }.toArray
    (imgs, perBucketCap)
  }

  private def emptyImage(): Array[Byte] =
    if (useCuckoo) CuckooFilterImpl.create(perBucketCap).serialize()
    else {
      val o = new java.io.ByteArrayOutputStream()
      BloomFilter.create(perBucketCap, fpp).writeTo(o)
      o.toByteArray
    }

  /** Distributed (bucket, image, n) frame over the merged bank — B rows
    * built by tasks reading the bank files from shared storage; no
    * O(seen) bytes ever land on the driver (the durable-bank write path:
    * CrawlJob.persistFilterBank). Pending deltas fold first. */
  def bankDf(): DataFrame = {
    awaitFold()
    if (deltaBcs.nonEmpty) rebase()
    if (baseBc == null) materializeBankIfAny()
    val dirs = bankDirs
    val counts = bucketCounts.clone()
    val cuckoo = useCuckoo
    val cap = perBucketCap
    val fppLocal = fpp
    spark.createDataset(0 until B)
      .repartition(math.min(B, spark.sparkContext.defaultParallelism))
      .map { b =>
        val bytes = Option(LongMembership.loadBucketBytes(dirs, b)).getOrElse {
          if (cuckoo) CuckooFilterImpl.create(cap).serialize()
          else {
            val o = new java.io.ByteArrayOutputStream()
            BloomFilter.create(cap, fppLocal).writeTo(o)
            o.toByteArray
          }
        }
        (b, bytes, counts(b))
      }
      .toDF("bucket", "image", "n")
  }

  /** Resume fast path from driver-held images (test face; the production
    * resume is [[bootstrapFromBank]]): replaces both the per-bucket count
    * job AND the distributed filter build of [[bootstrap]]. */
  def bootstrapFromImages(seenDf: DataFrame,
      images: Array[(Int, Array[Byte], Long)], cap: Long): Unit = {
    awaitFold()
    require(images.length == B, s"bank has ${images.length} buckets, want $B")
    pieces.foreach(GraftShim.freeCheckpoint)
    pieces = Vector(prep(seenDf))
    java.util.Arrays.fill(bucketCounts, 0L)
    images.foreach { case (b, _, n) => bucketCounts(b) = n }
    pieceSizes = Vector(bucketCounts.sum)
    perBucketCap = cap
    val dir = nextBankDir()
    images.foreach { case (b, bytes, _) => SeenState.writeBucketFile(dir, b, bytes) }
    swapBase(Vector(dir), foldDeltas = true)
  }

  /** Resume fast path, fully distributed: `bank` is a (bucket, image, n)
    * frame (the persisted IceLite filters table) — tasks copy the images
    * into a fresh bank dir; the driver sees only the (bucket, n) stats.
    * Restart cost drops to the single piece-prep pass + an O(bank) copy
    * that never troubles the driver. */
  def bootstrapFromBank(seenDf: DataFrame, bank: DataFrame, cap: Long): Unit = {
    awaitFold()
    pieces.foreach(GraftShim.freeCheckpoint)
    pieces = Vector(prep(seenDf))
    val dir = nextBankDir()
    StateIO.forPath(dir).mkdirs(dir)
    val stats = bank.select(col("bucket").cast("int"), col("image"), col("n").cast("long"))
      .as[(Int, Array[Byte], Long)]
      .map { case (b, img, n) =>
        SeenState.writeBucketFile(dir, b, img)
        (b, n)
      }
      .collect()
    require(stats.length == B && stats.map(_._1).toSet == (0 until B).toSet,
      s"bank rows cover ${stats.length} buckets, want $B")
    java.util.Arrays.fill(bucketCounts, 0L)
    stats.foreach { case (b, n) => bucketCounts(b) = n }
    pieceSizes = Vector(bucketCounts.sum)
    perBucketCap = cap
    swapBase(Vector(dir), foldDeltas = true)
  }

  private def resize(): Unit = {
    perBucketCap = math.max(perBucketCap * 2, bucketCounts.max * 2)
    nResizes += 1
    materializeBank() // the rebuilt bank covers every piece — deltas fold in
    ()
  }

  /** Size-tiered compaction (LSM economics, VERDICT r3 #3): merge ONLY
    * similar-sized runs. Smallest-first, a piece joins the merge group
    * while its size ≤ the group's running total — so a large base piece
    * is touched only when the accumulated smaller runs have grown
    * comparable to it, and each seen row is re-merged O(log(seen/wave))
    * times over a crawl instead of every ~compactAt waves. If the
    * invariant admits no ≥2-piece group (sizes form a >2× geometric
    * ladder), the two smallest merge — guaranteed progress, cheapest
    * possible merge. Loops until the chain is back under `compactAt`. */
  private def compact(): Unit = {
    while (pieces.size >= compactAt) {
      val asc = pieceSizes.zipWithIndex.sortBy(_._1) // (size, pieceIdx) ascending
      var group = Vector(asc.head._2)
      var total = asc.head._1
      var i = 1
      while (i < asc.size && asc(i)._1 <= math.max(total, 1L)) {
        group :+= asc(i)._2; total += asc(i)._1; i += 1
      }
      if (group.size < 2) { // forced: merge the two smallest
        group :+= asc(1)._2; total += asc(1)._1
      }
      val inGroup = group.toSet
      val old = pieces
      val merged = prep(group.map(pieces).reduce(_ unionByName _)) // eager
      compactedRows += total
      pieces = pieces.indices.filterNot(inGroup).map(pieces).toVector :+ merged
      pieceSizes = pieceSizes.indices.filterNot(inGroup).map(pieceSizes).toVector :+ total
      group.foreach(g => GraftShim.freeCheckpoint(old(g)))
      nCompactions += 1
    }
  }

  /** Release every persisted piece RDD, broadcast, and bank dir (end of
    * run / bench rep) — leaked pieces, broadcasts, or bank files degrade
    * later reps and long sessions. */
  def close(): Unit = {
    scala.util.Try(awaitFold())
    pieces.foreach(GraftShim.freeCheckpoint)
    pieces = Vector.empty
    pieceSizes = Vector.empty
    // BLOCKING here (end of run / bench rep, never wave-path latency):
    // an async-freed 2+ GB candidate cache still draining while the next
    // rep allocates its own caused bimodal rep walls (storage churn)
    freeCandCk(blocking = true)
    releaseRetired()
    (Option(baseBc).toVector ++ deltaBcs).foreach(b => scala.util.Try(b.destroy()))
    baseBc = null
    deltaBcs = Vector.empty
    deltaFaces = Vector.empty
    SeenState.deleteDir(instRoot)
    bankDirs = Vector.empty
  }

  // introspection (tests + trace)
  def pieceCount: Int = pieces.size
  def capacityPerBucket: Long = perBucketCap
  def totalSeen: Long = bucketCounts.sum
  def resizes: Int = nResizes
  def compactions: Int = nCompactions
  /** Total rows re-shuffled by piece compaction since construction — the
    * tiered policy's witness: with waves ≪ base, the base piece never
    * joins a merge group, so this stays ∝ Σwaves·log(waves), not
    * ∝ seen·waves/compactAt. */
  def compactedRowsTotal: Long = compactedRows
  private[graft] def pieceSizesView: Seq[Long] = pieceSizes
  def rebases: Int = nRebases
  def deltaLayers: Int = deltaBcs.size
  /** Filter-image bytes the LAST addWave collected to the driver — the
    * O(wave) contract's witness (a merge-sized build would be ∝ capacity). */
  def lastWaveCollectedFilterBytes: Long = lastCollected
  def totalCollectedFilterBytes: Long = totalCollected
  def currentBankDirs: Seq[String] = bankDirs
  /** Test face: the BASE probe broadcast's payload (must stay O(B) paths —
    * a full filter-bank broadcast here is the 12 GB/executor regression). */
  private[graft] def baseFace: LongMembership = baseBc.value
}

object SeenState {
  /** Candidate-row threshold for [[SeenState.freshAndConfirmed]]'s
    * cache-once path: above this, materializing the bucket exchange once
    * beats letting the fresh/confirmed branches each run it; below, the
    * plain two-branch plan is cheaper (the two branch map stages run
    * CONCURRENTLY when cores are idle, so at small waves the duplicated
    * exchange costs near-zero wall while the cache serializes
    * populate→read). Env-overridable (`GRAFT_SEEN_CAND_CACHE_AT`) like
    * the other scale-dependent knobs; the default sits at the measured
    * crossover band (A/B at 16M rows: no-cache ~5–7% faster; at 64M the
    * cache is the difference between one and two full 2.3 GB shuffle
    * materializations — OPTIMIZATION_r06.md Change 1). On a real cluster
    * the duplicated exchange also doubles NETWORK bytes, so production
    * deployments may set it lower. */
  val CheckpointCandsAt: Long =
    sys.env.get("GRAFT_SEEN_CAND_CACHE_AT").map(_.toLong).getOrElse(1L << 25)

  /** Atomic per-bucket image write (temp + rename; task-retry-safe:
    * last-writer-wins on identical content). Runs INSIDE executor tasks
    * — the StateIO seam resolves the filesystem per call, so a URI bank
    * root lands the image on shared storage (VERDICT r3 #1). */
  private[plans] def writeBucketFile(dir: String, b: Int, bytes: Array[Byte]): Unit =
    StateIO.forPath(dir).writeAtomic(s"$dir/bucket_$b.bin", bytes)

  private[plans] def deleteDir(dir: String): Unit =
    StateIO.forPath(dir).deleteRecursive(dir)
}
