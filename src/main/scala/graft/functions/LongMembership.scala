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
  final case class Bloom(bf: BloomFilter) extends LongMembership {
    def mightContain(h: Long): Boolean = bf.mightContainLong(h)
  }
  final case class Cuckoo(cf: CuckooFilterImpl) extends LongMembership {
    def mightContain(h: Long): Boolean = cf.mightContain(h)
  }
}
