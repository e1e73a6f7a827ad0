package graft

import graft.functions.CuckooFilterAgg.{cuckoo_filter_agg, cuckoo_might_contain}
import graft.functions.{CuckooFilterImpl, UrlOps}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CuckooFilterSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def hashes(n: Int, seed: Long): Seq[Long] =
    (0 until n).map(i => UrlOps.urlHash64(s"http://h$seed.example.org/p/$i"))

  test("no false negatives; deletion removes; re-insert restores") {
    val f = CuckooFilterImpl.create(10000)
    val hs = hashes(8000, 1)
    hs.foreach(h => assert(f.insert(h), "insert failed below capacity"))
    hs.foreach(h => assert(f.mightContain(h), "false negative"))
    // deletion — the property bloom can't give the crawler
    val victim = hs(1234)
    assert(f.delete(victim))
    // victim may still FP via another key's identical fingerprint, but
    // deleting all inserted copies of a value it uniquely owns must drop it
    val unique = UrlOps.urlHash64("http://unique.example.org/only")
    f.insert(unique)
    assert(f.mightContain(unique))
    f.delete(unique)
    // FP chance after delete is the standard fp rate; assert on a fresh filter
    val f2 = CuckooFilterImpl.create(1000)
    f2.insert(unique)
    assert(f2.mightContain(unique))
    f2.delete(unique)
    assert(!f2.mightContain(unique), "deleted key still present in near-empty filter")
  }

  test("false-positive rate is bounded (16-bit fingerprints, 4-slot buckets)") {
    val f = CuckooFilterImpl.create(20000)
    hashes(16000, 2).foreach(f.insert)
    val probes = hashes(20000, 999) // disjoint key space
    val fps = probes.count(f.mightContain)
    val rate = fps.toDouble / probes.size
    assert(rate < 0.01, s"fp rate $rate too high")
  }

  test("distributed aggregate == local build (update/merge/eval across partitions)") {
    import spark.implicits._
    val hs = hashes(5000, 3)
    val df = hs.toDF("h").repartition(8)
    val bytes = df.agg(cuckoo_filter_agg(col("h"), 10000)).head.getAs[Array[Byte]](0)
    val fromSpark = CuckooFilterImpl.deserialize(bytes)
    hs.foreach(h => assert(fromSpark.mightContain(h), "false negative via aggregate"))
    val misses = hashes(5000, 777).count(fromSpark.mightContain)
    assert(misses < 100, s"aggregate filter fp count $misses")
  }

  test("cuckoo_might_contain probes the aggregate result in a plan") {
    import spark.implicits._
    val hs = hashes(2000, 4)
    val bytes = hs.toDF("h").repartition(4)
      .agg(cuckoo_filter_agg(col("h"), 5000)).head.getAs[Array[Byte]](0)
    val probeDf = (hs.take(100) ++ hashes(100, 555)).toDF("h")
      .withColumn("maybe", cuckoo_might_contain(lit(bytes), col("h")))
    val got = probeDf.collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    hs.take(100).foreach(h => assert(got(h), "false negative via expression"))
  }

  test("deleteInPlace removes one occurrence per member of the delta filter") {
    val f = CuckooFilterImpl.create(8000)
    val keep = hashes(3000, 7)
    val drop = hashes(3000, 8)
    (keep ++ drop).foreach(f.insert)
    val before = f.occupancy
    val delta = CuckooFilterImpl.create(8000)
    drop.foreach(delta.insert)
    f.deleteInPlace(delta)
    // every deleted occurrence frees exactly one slot
    assert(f.occupancy == before - delta.occupancy,
      s"occupancy ${f.occupancy} != ${before - delta.occupancy}")
    // the multiset guarantee: members NOT in the delta never go false-negative
    keep.foreach(h => assert(f.mightContain(h), "deleteInPlace broke a kept member"))
    // and re-merging the same delta restores everything (the engine's
    // unsee-then-readmit round trip)
    f.mergeInPlace(delta)
    (keep ++ drop).foreach(h => assert(f.mightContain(h), "member lost after re-merge"))
  }

  test("merge relocates fingerprints without losing members") {
    val a = CuckooFilterImpl.create(4000)
    val b = CuckooFilterImpl.create(4000)
    val ha = hashes(1500, 5); val hb = hashes(1500, 6)
    ha.foreach(a.insert); hb.foreach(b.insert)
    a.mergeInPlace(b)
    (ha ++ hb).foreach(h => assert(a.mightContain(h), "member lost in merge"))
  }
}
