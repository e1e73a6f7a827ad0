package graft.functions

import java.nio.ByteBuffer

/** Cuckoo filter (Fan, Andersen, Kaminsky, Mitzenmacher: "Cuckoo Filter:
  * Practically Better Than Bloom", CoNEXT 2014): approximate membership
  * with DELETION support — the property bloom lacks, and why the north
  * rule names it next to bloom for the URL-seen filter (a crawler that
  * re-queues failed fetches needs to unsee them).
  *
  * Layout: 2^k buckets × 4 slots of 16-bit fingerprints (0 = empty).
  * Candidate buckets: i1 = upper hash bits; i2 = i1 ^ scramble(fp) —
  * partial-key cuckoo hashing, so relocation needs only (index, fp).
  *
  * Keys are 64-bit hashes (the engine feeds xxhash64(url)).
  */
final class CuckooFilterImpl private (
    val numBuckets: Int, // power of two
    val slots: Array[Short]) extends Serializable {

  import CuckooFilterImpl._

  private def mask: Int = numBuckets - 1
  private var kickSeed: Long = 0x5DEECE66DL
  // Saturation accounting: inserts the eviction loop could not place.
  // A filter with nDropped > 0 has false negatives and MUST NOT serve as
  // a seen-prefilter layer (a filter-negative skips the exact anti-join);
  // callers check [[dropped]] and rebuild bigger / fall back to an exact
  // path instead of shipping a lossy image.
  private var nDropped: Long = 0L
  def dropped: Long = nDropped

  @inline private def fingerprint(hash: Long): Short = {
    val fp = ((hash & 0xFFFF) ^ (hash >>> 48)).toInt & 0xFFFF
    (if (fp == 0) 1 else fp).toShort
  }

  @inline private def bucket1(hash: Long): Int = ((hash >>> 16) & mask).toInt

  /** Alternate bucket: XOR with a nonzero fp-derived offset. The masked
    * scramble can be zero when the nonzero bits fall above the index
    * width, which would make i2 == i1 (halving effective slots and
    * degrading the eviction loop); forcing a nonzero offset keeps
    * i2 != i1 for every fp while remaining an involution — the pairing
    * [[deleteInPlace]]'s argument depends on. */
  @inline private def altBucket(i: Int, fp: Short): Int = {
    val off = scramble(fp & 0xFFFF) & mask
    (i ^ (if (off == 0) 1 else off)) & mask
  }

  private def slotBase(bucket: Int): Int = bucket * SlotsPerBucket

  private def tryInsertAt(bucket: Int, fp: Short): Boolean = {
    val base = slotBase(bucket)
    var j = 0
    while (j < SlotsPerBucket) {
      if (slots(base + j) == 0) { slots(base + j) = fp; return true }
      j += 1
    }
    false
  }

  /** Insert; returns false if the filter is saturated (caller should have
    * sized for the expected item count — same contract as bloom). */
  def insertFingerprint(startBucket: Int, fp0: Short): Boolean = {
    var i = startBucket
    var fp = fp0
    if (tryInsertAt(i, fp)) return true
    if (tryInsertAt(altBucket(i, fp), fp)) return true
    // evict loop (deterministic "random" slot via an LCG — no wall clock)
    var kicks = 0
    i = altBucket(i, fp)
    while (kicks < MaxKicks) {
      kickSeed = kickSeed * 6364136223846793005L + 1442695040888963407L
      val j = ((kickSeed >>> 33) % SlotsPerBucket).toInt
      val base = slotBase(i)
      val evicted = slots(base + j)
      slots(base + j) = fp
      fp = evicted
      i = altBucket(i, fp)
      if (tryInsertAt(i, fp)) return true
      kicks += 1
    }
    false
  }

  def insert(hash: Long): Boolean = {
    val ok = insertFingerprint(bucket1(hash), fingerprint(hash))
    if (!ok) nDropped += 1
    ok
  }

  def mightContain(hash: Long): Boolean = {
    val fp = fingerprint(hash)
    val i1 = bucket1(hash)
    val i2 = altBucket(i1, fp)
    containsAt(i1, fp) || containsAt(i2, fp)
  }

  private def containsAt(bucket: Int, fp: Short): Boolean = {
    val base = slotBase(bucket)
    var j = 0
    while (j < SlotsPerBucket) {
      if (slots(base + j) == fp) return true
      j += 1
    }
    false
  }

  /** Delete one occurrence; returns true if something was removed. */
  def delete(hash: Long): Boolean = {
    val fp = fingerprint(hash)
    val i1 = bucket1(hash)
    if (deleteAt(i1, fp)) return true
    deleteAt(altBucket(i1, fp), fp)
  }

  private def deleteAt(bucket: Int, fp: Short): Boolean = {
    val base = slotBase(bucket)
    var j = 0
    while (j < SlotsPerBucket) {
      if (slots(base + j) == fp) { slots(base + j) = 0; return true }
      j += 1
    }
    false
  }

  /** Merge another same-sized filter: relocatable because partial-key
    * hashing lets us reinsert from (bucket, fp) alone. */
  def mergeInPlace(other: CuckooFilterImpl): CuckooFilterImpl = {
    require(other.numBuckets == numBuckets, "cuckoo merge: size mismatch")
    nDropped += other.nDropped
    var b = 0
    while (b < other.numBuckets) {
      val base = other.slotBase(b)
      var j = 0
      while (j < SlotsPerBucket) {
        val fp = other.slots(base + j)
        if (fp != 0 && !insertFingerprint(b, fp)) nDropped += 1
        j += 1
      }
      b += 1
    }
    this
  }

  /** Bulk-delete: remove one occurrence per fingerprint stored in `other`
    * (the mirror of [[mergeInPlace]]). An item occupies one of the TWO
    * partial-key buckets {i, i ^ scramble(fp)}; whichever slot `other`
    * stored it in, [[deleteAt]] on that bucket followed by its alternate
    * probes exactly that pair, so the matching occurrence here is found.
    * Multiset-safe: every insert contributed one slot, so deleting one
    * occurrence per deleted item never produces a false negative for the
    * items that remain. */
  def deleteInPlace(other: CuckooFilterImpl): CuckooFilterImpl = {
    require(other.numBuckets == numBuckets, "cuckoo delete: size mismatch")
    var b = 0
    while (b < other.numBuckets) {
      val base = other.slotBase(b)
      var j = 0
      while (j < SlotsPerBucket) {
        val fp = other.slots(base + j)
        if (fp != 0) {
          if (!deleteAt(b, fp)) deleteAt(altBucket(b, fp), fp)
        }
        j += 1
      }
      b += 1
    }
    this
  }

  def serialize(): Array[Byte] = {
    val buf = ByteBuffer.allocate(4 + 8 + slots.length * 2)
    buf.putInt(numBuckets)
    buf.putLong(nDropped)
    slots.foreach(buf.putShort)
    buf.array()
  }

  def occupancy: Int = slots.count(_ != 0)
}

object CuckooFilterImpl {
  val SlotsPerBucket = 4
  val MaxKicks = 500

  /** fp scrambler (finalizer-style mix) keeping i2 != i1 for fp != 0. */
  @inline def scramble(fp: Int): Int = {
    var h = fp * 0x9E3779B1
    h ^= h >>> 16
    if ((h & 0x7FFFFFFF) == 0) 1 else h & 0x7FFFFFFF
  }

  /** Size for expected items at ~95% max load over 4-slot buckets. */
  def create(expectedItems: Long): CuckooFilterImpl = {
    val needed = math.max(16L, (expectedItems / (SlotsPerBucket * 0.84)).toLong)
    var buckets = 16
    while (buckets < needed && buckets < (1 << 28)) buckets <<= 1
    new CuckooFilterImpl(buckets, new Array[Short](buckets * SlotsPerBucket))
  }

  /** Dropped-insert count straight from a serialized image's header —
    * the lossless-delta check reads this without a full deserialize. */
  def droppedOf(bytes: Array[Byte]): Long = ByteBuffer.wrap(bytes).getLong(4)

  def deserialize(bytes: Array[Byte]): CuckooFilterImpl = {
    val buf = ByteBuffer.wrap(bytes)
    val numBuckets = buf.getInt
    val dropped = buf.getLong
    val slots = new Array[Short](numBuckets * SlotsPerBucket)
    var i = 0
    while (i < slots.length) { slots(i) = buf.getShort; i += 1 }
    val f = new CuckooFilterImpl(numBuckets, slots)
    f.nDropped = dropped
    f
  }
}
