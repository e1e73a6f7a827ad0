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

  test("bucketed probe routes negative hashes correctly (pmod semantics)") {
    val s = new SeenState(spark, buckets = 8, useCuckoo = false,
      expectedItems = 10000L, fpp = 0.01, compactAt = 8)
    // xxhash64 produces negative longs ~half the time; bootstrap + probe
    // must agree on the bucket for those
    s.bootstrap(hashes(0, 4000))
    val pf = s.prefilter
    val negs = hashes(0, 4000).collect().map(_.getLong(0)).filter(_ < 0)
    assert(negs.nonEmpty)
    assert(negs.forall(pf.mightContain), "false negative on negative hash")
  }
}
