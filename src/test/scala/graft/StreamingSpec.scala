package graft

import graft.plans.CrawlJob
import graft.streaming.StreamOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

class StreamingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("crawl-request intake: validation + canonicalization as a stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, String, Boolean, String, String, Timestamp)]
    val df = input.toDF()
      .toDF("index", "url", "on_domain", "engine", "type", "ts")
    input.addData(
      ("idx", "HTTP://Site.COM:80/a?b=1&a=2#f", true, "eng", "elasticsearch",
        Timestamp.valueOf("2024-01-01 00:00:00")),
      ("idx", "http://ok.com/x", true, "", "app-search",
        Timestamp.valueOf("2024-01-01 00:00:01")), // missing engine → 400
      ("", "http://ok.com/y", false, "eng", "elasticsearch",
        Timestamp.valueOf("2024-01-01 00:00:02")), // missing index → 400
      ("idx", "http://ok.com/z", false, "eng", "bogus-type",
        Timestamp.valueOf("2024-01-01 00:00:03")), // bad type → 400
      ("idx", "not a url", false, "eng", "elasticsearch",
        Timestamp.valueOf("2024-01-01 00:00:04"))) // invalid URL → 400
    val q = StreamOps.validateRequests(df)
      .writeStream.format("memory").queryName("reqs")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val rows = spark.sql("SELECT url, canonical_url, status FROM reqs ORDER BY url")
      .collect()
    val byUrl = rows.map(r => r.getString(0) -> (Option(r.getString(1)), r.getInt(2))).toMap
    assert(byUrl("HTTP://Site.COM:80/a?b=1&a=2#f") ==
      (Some("http://site.com/a?a=2&b=1"), 201))
    assert(byUrl("http://ok.com/x")._2 == 400)
    assert(byUrl("http://ok.com/y")._2 == 400)
    assert(byUrl("http://ok.com/z")._2 == 400)
    assert(byUrl("not a url") == (None, 400))
  }

  test("streaming seed intake lands frontier rows identical to the batch seed path") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the seed list, with a post-canonicalization duplicate (#2) and an
    // invalid URL (#3) — both consume a seq/index, exactly like the batch
    // path's seeds.zipWithIndex
    val seeds = Seq(
      "http://HOT.example.com:80/p/0#frag",
      "http://site1.example.org/p/0?b=2&a=1",
      "http://hot.example.com/p/0", // dup of #0 after canonicalization
      "not a url",
      "http://site2.example.org/p/9")

    // batch twin: CrawlJob's fresh-init seed admission (maxWaves=0 → init only)
    val root1 = java.nio.file.Files.createTempDirectory("graft-intake-batch").toString
    CrawlJob.run(spark, spark.emptyDataset[graft.model.WebDoc].toDF(), Seq.empty,
      graft.plans.CrawlJob.Config(seeds, maxWaves = 0, numPartitions = 2), root1)

    // streaming twin: the same seeds as CrawlRequests over TWO micro-batches
    val root2 = java.nio.file.Files.createTempDirectory("graft-intake-stream").toString
    val t = CrawlJob.tables(root2, spark)
    val input = MemoryStream[(String, String, Boolean, String, String, Timestamp, Long)]
    val df = input.toDF().toDF("index", "url", "on_domain", "engine", "type", "ts", "seq")
    def req(i: Int) = ("idx", seeds(i), false, "eng", "elasticsearch",
      Timestamp.valueOf("2024-01-01 00:00:00"), i.toLong)
    val sink: (org.apache.spark.sql.DataFrame, Long) => Unit =
      StreamOps.admitSeedBatch(spark, t.frontier, t.seen)
    val q = StreamOps.seedEntries(df)
      .writeStream
      .foreachBatch(sink)
      .start()
    input.addData(req(0), req(1))          // micro-batch 1
    q.processAllAvailable()
    input.addData(req(2), req(3), req(4))  // micro-batch 2 (dup + invalid)
    q.processAllAvailable()
    q.stop()

    def frontierRows(root: String) =
      CrawlJob.tables(root, spark).frontier.read()
        .select("url", "url_hash", "host", "depth", "parent_ord", "link_index")
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getInt(3),
          r.getLong(4), r.getInt(5))).toSet
    def seenRows(root: String) =
      CrawlJob.tables(root, spark).seen.read().select("url_hash", "url")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet

    assert(frontierRows(root2) == frontierRows(root1),
      s"stream=${frontierRows(root2)}\nbatch=${frontierRows(root1)}")
    assert(seenRows(root2) == seenRows(root1))
    // two separate intake commits landed (one per micro-batch)
    assert(t.frontier.snapshots.count(_.counters.contains("intake_batch")) == 2)
  }

  test("watermarked event windows aggregate a replayed batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val df = input.toDF().toDF("ts", "event_type", "value")
    input.addData(
      (Timestamp.valueOf("2024-01-01 00:10:00"), "click", 1.0),
      (Timestamp.valueOf("2024-01-01 00:20:00"), "click", 2.0),
      (Timestamp.valueOf("2024-01-01 01:05:00"), "click", 4.0),
      (Timestamp.valueOf("2024-01-01 03:00:00"), "click", 8.0)) // advances watermark
    val q = StreamOps.eventWindows(df)
      .writeStream.format("memory").queryName("winagg")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val rows = spark.sql(
      "SELECT win_start, n_events, sum_value FROM winagg ORDER BY win_start").collect()
    // windows 00:00 and 01:00 are closed by the 03:00 watermark
    assert(rows.length >= 2)
    assert(rows(0).getLong(1) == 2L && rows(0).getDouble(2) == 3.0)
    assert(rows(1).getLong(1) == 1L && rows(1).getDouble(2) == 4.0)
  }

  test("streaming politeness state defers within crawl_delay") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamOps.HostEvent]
    input.addData(
      StreamOps.HostEvent("a.com", 0L),
      StreamOps.HostEvent("a.com", 5L),   // within delay → deferred
      StreamOps.HostEvent("a.com", 12L),  // past delay → admitted
      StreamOps.HostEvent("b.com", 3L))   // other host independent
    val q = StreamOps.politenessStream(spark, input.toDF(), crawlDelay = 10L)
      .writeStream.format("memory").queryName("polite")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val rows = spark.sql("SELECT host, ts, admitted FROM polite ORDER BY host, ts")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
    assert(rows.toSeq == Seq(
      ("a.com", 0L, true), ("a.com", 5L, false), ("a.com", 12L, true),
      ("b.com", 3L, true)))
  }
}
