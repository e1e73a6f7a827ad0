package graft.plans

import graft.functions.{CuckooFilterImpl, LongMembership}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
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
  */
final class SeenState(
    spark: SparkSession,
    buckets: Int,
    useCuckoo: Boolean,
    expectedItems: Long,
    fpp: Double,
    compactAt: Int) {

  private val B = buckets
  private var pieces: Vector[DataFrame] = Vector.empty
  private var perBucketCap: Long = math.max(1024L, expectedItems / B)
  private val bucketCounts: Array[Long] = Array.fill(B)(0L)
  private var blooms: Array[BloomFilter] = _
  private var cuckoos: Array[CuckooFilterImpl] = _
  private var nResizes: Int = 0
  private var nCompactions: Int = 0
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

  /** `bloom_filter_agg` as a Column, sized exactly like
    * `BloomFilter.create(items, fpp)` so per-wave filters stay mergeable
    * with the bucket filters. */
  private def bloomAgg(c: Column, items: Long, f: Double): Column = {
    val numBits = BloomFilter.optimalNumOfBits(items, f)
    GraftShim.column(new BloomFilterAggregate(GraftShim.expression(c),
      Literal(items), Literal(numBits)).toAggregateExpression())
  }

  /** One distributed pass: per-bucket filter images + exact counts. */
  private def buildFilters(df: DataFrame): Array[(Int, Array[Byte], Long)] = {
    val aggC =
      if (useCuckoo)
        graft.functions.CuckooFilterAgg.cuckoo_filter_agg(col("url_hash"), perBucketCap)
      else bloomAgg(col("url_hash"), perBucketCap, fpp)
    df.groupBy(bucketCol.as("__b")).agg(aggC.as("f"), count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getLong(0).toInt, r.getAs[Array[Byte]](1), r.getLong(2)))
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
  }

  /** Absorb one wave's new seen hashes (caller guarantees non-empty and
    * cached upstream — the groupBy below reads the cache, not the plan). */
  def addWave(newSeenHashes: DataFrame): Unit = {
    val piece = prep(newSeenHashes)
    pieces :+= piece
    val fs = buildFilters(piece)
    mergeFilters(fs)
    fs.foreach { case (b, _, n) => bucketCounts(b) += n }
    if (bucketCounts.max > perBucketCap) resize()
    if (pieces.size >= compactAt) compact()
  }

  /** candidates MINUS seen, exact: one candidate-side exchange into the
    * bucket partitioning, then a zero-exchange join chain over pieces. */
  def antiJoin(cands: DataFrame): DataFrame =
    pieces.foldLeft(cands)((acc, p) => acc.join(p, Seq("url_hash"), "left_anti"))

  /** Cuckoo unsee for the retry path: delete the retried hashes from the
    * bucket filters, then re-insert (they stay in the exact seen set —
    * see class doc). No-op in bloom mode (bloom cannot delete; the
    * retried URL simply stays in the filter, which is also correct). */
  def unseeReinsert(retryHashes: DataFrame): Unit = if (useCuckoo) {
    buildFilters(retryHashes).foreach { case (b, bytes, _) =>
      val delta = CuckooFilterImpl.deserialize(bytes)
      cuckoos(b).deleteInPlace(delta)
      cuckoos(b).mergeInPlace(delta)
    }
  }

  private def resize(): Unit = {
    perBucketCap = math.max(perBucketCap * 2, bucketCounts.max * 2)
    nResizes += 1
    allocEmptyFilters()
    mergeFilters(buildFilters(allPieces))
  }

  private def compact(): Unit = {
    val old = pieces
    pieces = Vector(prep(allPieces)) // eager: reads old pieces before the free
    old.foreach(GraftShim.freeCheckpoint)
    nCompactions += 1
  }

  /** Release every persisted piece RDD (end of run / bench rep). */
  def close(): Unit = {
    pieces.foreach(GraftShim.freeCheckpoint)
    pieces = Vector.empty
  }

  // introspection (tests + trace)
  def pieceCount: Int = pieces.size
  def capacityPerBucket: Long = perBucketCap
  def totalSeen: Long = bucketCounts.sum
  def resizes: Int = nResizes
  def compactions: Int = nCompactions
}
