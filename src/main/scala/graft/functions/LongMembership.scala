package graft.functions

import org.apache.spark.unsafe.hash.Murmur3_x86_32
import org.apache.spark.util.sketch.BloomFilter

import java.util.concurrent.atomic.AtomicReferenceArray

/** Approximate-membership probe over 64-bit keys — the common face of the
  * bloom and cuckoo URL-seen prefilters, broadcast to executors and probed
  * from generated code (UrlExpressions.MightContainLong).
  */
trait LongMembership extends Serializable {
  def mightContain(h: Long): Boolean
}

object LongMembership {

  /** Partition-aligned bucket id: EXACTLY the partition
    * `df.repartition(B, col("url_hash"))` assigns (HashPartitioning's
    * partitionIdExpression = `pmod(murmur3_hash(h, seed=42), B)` — the
    * same function as SQL `hash()`). Aligning the filter-bank bucket with
    * the physical partitioning is what makes the post-exchange probe
    * memory-bounded: after the candidate exchange, the task for partition
    * p probes ONLY bucket p, so an executor holds O(seen/B) filter bytes
    * per task slot instead of the whole bank. */
  @inline def bucketOf(h: Long, buckets: Int): Int = {
    val m = Murmur3_x86_32.hashLong(h, 42)
    ((m % buckets) + buckets) % buckets
  }

  /** A bucket that never received a row (delta images only materialize
    * the buckets the wave touched). */
  case object Empty extends LongMembership {
    def mightContain(h: Long): Boolean = false
  }
  final case class Bloom(bf: BloomFilter) extends LongMembership {
    def mightContain(h: Long): Boolean = bf.mightContainLong(h)
  }
  final case class Cuckoo(cf: CuckooFilterImpl) extends LongMembership {
    def mightContain(h: Long): Boolean = cf.mightContain(h)
  }

  /** Hash-bucketed filter bank resident in memory (per-wave DELTA layers:
    * wave-sized, shipped whole as one small broadcast). The probe routes
    * to filter [[bucketOf]](h). */
  final case class Bucketed(filters: Array[LongMembership]) extends LongMembership {
    private val b = filters.length
    def mightContain(h: Long): Boolean = filters(bucketOf(h, b)).mightContain(h)
  }

  /** OR over layers (driver-side probe face for tests/export — executors
    * probe the layers as separate broadcasts inside codegen instead). */
  final case class Layered(layers: Seq[LongMembership]) extends LongMembership {
    def mightContain(h: Long): Boolean = layers.exists(_.mightContain(h))
  }

  def deserializeFilter(bytes: Array[Byte], cuckoo: Boolean): LongMembership =
    if (cuckoo) Cuckoo(CuckooFilterImpl.deserialize(bytes))
    else Bloom(BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes)))

  /** Raw bytes of bucket `b`'s image under an overlay chain of bank dirs
    * (first dir containing the bucket file wins — newest overlay first);
    * null when no dir has it. */
  def loadBucketBytes(dirs: Seq[String], b: Int): Array[Byte] =
    dirs.iterator
      .map(d => graft.sources.StateIO.forPath(d).readBytesIfExists(s"$d/bucket_$b.bin"))
      .collectFirst { case bytes if bytes != null => bytes }
      .orNull

  /** The BASE probe face of the seen state: per-bucket filter images in
    * shared storage (the IceLite state root in production), loaded
    * LAZILY per bucket on first probe and cached per JVM instance.
    *
    * This is what keeps the probe O(seen/B)-resident per executor at the
    * 10^10 design point: the broadcast itself carries only paths (O(B)
    * strings), and because [[bucketOf]] equals the candidate exchange's
    * partition id, an executor only ever faults in the buckets of the
    * partitions it runs — never the whole bank. (A full-bank broadcast is
    * O(seen) ≈ 12 GB per executor at 10^10/0.01 FPP — the round-2 design
    * this replaces.)
    *
    * `dirs` is an overlay chain, newest first (cuckoo unsee rewrites only
    * the affected buckets into a fresh overlay dir). Reads go through the
    * [[graft.sources.StateIO]] seam against the shared state root — the
    * same storage contract as [[graft.sources.IceLite]]: a URI root
    * (hdfs://, s3a://, file://) runs on the Hadoop FileSystem API, so a
    * multi-executor deployment probes images any node wrote. */
  final case class FileBank(dirs: Seq[String], buckets: Int, cuckoo: Boolean)
    extends LongMembership {

    @transient private lazy val cache = new AtomicReferenceArray[LongMembership](buckets)

    def mightContain(h: Long): Boolean = {
      val b = bucketOf(h, buckets)
      var f = cache.get(b)
      if (f == null) {
        cache.compareAndSet(b, null, load(b))
        f = cache.get(b)
      }
      f.mightContain(h)
    }

    private def load(b: Int): LongMembership = {
      val bytes = loadBucketBytes(dirs, b)
      if (bytes == null) Empty else deserializeFilter(bytes, cuckoo)
    }
  }
}
