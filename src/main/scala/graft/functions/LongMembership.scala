package graft.functions

import org.apache.spark.util.sketch.BloomFilter

/** Approximate-membership probe over 64-bit keys — the common face of the
  * bloom and cuckoo URL-seen prefilters, broadcast to executors and probed
  * from generated code (UrlExpressions.MightContainLong).
  */
trait LongMembership extends Serializable {
  def mightContain(h: Long): Boolean
}

object LongMembership {
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

  /** Hash-bucketed filter bank: the probe routes to filter
    * `pmod(h, buckets)`. Each bucket's filter is sized for its own
    * cardinality and can be rebuilt independently when it saturates —
    * the single-giant-filter alternative degrades to FPP≈1 once the
    * fixed capacity is passed and cannot be resized incrementally. */
  final case class Bucketed(filters: Array[LongMembership]) extends LongMembership {
    private val b = filters.length
    def mightContain(h: Long): Boolean = {
      val i = ((h % b) + b) % b
      filters(i.toInt).mightContain(h)
    }
  }
}
