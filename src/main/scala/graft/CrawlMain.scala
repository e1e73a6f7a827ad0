package graft

import graft.plans.CrawlJob
import graft.synth.Corpus
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** spark-submit entry point for the crawl engine — the CLI twin of the
  * reference's `POST /crawl` (serving/handlers.go:25-96).
  *
  * Usage:
  *   spark-submit --class graft.CrawlMain <jar> \
  *     --docs <parquet path|synth:<hosts>x<pages>> --state <state root> \
  *     --seed <url> [--seed <url> ...] [--on-domain] [--host-budget N]
  *     [--max-waves N] [--partitions N] [--emit-visit-order]
  *     [--robots <parquet of (host,path_prefix,allow,crawl_delay)>]
  *
  * Validation mirrors the handler: invalid seed → exit 400-style error;
  * the job itself runs to completion (or resumes from the state root's
  * last committed wave).
  */
object CrawlMain {
  def main(args: Array[String]): Unit = {
    var docsPath = ""
    var state = ""
    var seeds = Vector.empty[String]
    var onDomain = false
    var hostBudget = 64
    var maxWaves = 64
    var partitions = 32
    var emitOrder = false
    var robotsPath = ""
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--docs" => docsPath = args(i + 1); i += 2
        case "--state" => state = args(i + 1); i += 2
        case "--seed" => seeds :+= args(i + 1); i += 2
        case "--on-domain" => onDomain = true; i += 1
        case "--host-budget" => hostBudget = args(i + 1).toInt; i += 2
        case "--max-waves" => maxWaves = args(i + 1).toInt; i += 2
        case "--partitions" => partitions = args(i + 1).toInt; i += 2
        case "--emit-visit-order" => emitOrder = true; i += 1
        case "--robots" => robotsPath = args(i + 1); i += 2
        case other => System.err.println(s"unknown arg: $other"); sys.exit(2)
      }
    }
    if (docsPath.isEmpty || state.isEmpty || seeds.isEmpty) {
      System.err.println("required: --docs <path> --state <dir> --seed <url>")
      sys.exit(2)
    }
    // seed validation = handler semantics (handlers.go:41-69 + Init 400)
    val invalid = seeds.filter(s => graft.functions.UrlOps.canonicalize(s) == null)
    if (invalid.nonEmpty) {
      System.err.println(s"400: invalid seed URL(s): ${invalid.mkString(", ")}")
      sys.exit(1)
    }

    val spark = SparkSession.builder()
      .appName("graft-crawl")
      .config("spark.sql.shuffle.partitions", partitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val (docs, defaultRules) =
      if (docsPath.startsWith("synth:")) {
        val Array(h, p) = docsPath.stripPrefix("synth:").split("x")
        val cfg = Corpus.Config(nHosts = h.toInt, pagesPerHost = p.toInt)
        import spark.implicits._
        // repartition off the driver-side LocalTableScan: without it every
        // job of every wave re-serializes the whole corpus into tasks
        (spark.createDataset(Corpus.generate(cfg)).toDF()
          .repartition(partitions), Corpus.robotsRules(cfg))
      } else (spark.read.parquet(docsPath), Seq.empty[graft.model.RobotsRule])

    // the corpus is the simulated web (S2): resident, like a warm page
    // cache — the fetch join reads it every wave
    docs.persist()
    docs.count()

    // robots: an explicit rules table wins; synth corpora default to their
    // own generated rules; plain parquet corpora default to allow-all
    val rules =
      if (robotsPath.isEmpty) defaultRules
      else {
        import spark.implicits._
        spark.read.parquet(robotsPath)
          .select(col("host"), col("path_prefix"), col("allow"), col("crawl_delay"))
          .as[graft.model.RobotsRule].collect().toSeq
      }

    val metrics = CrawlJob.run(spark, docs, rules,
      CrawlJob.Config(seeds, onDomain, hostBudget, maxWaves, partitions), state)

    metrics.foreach(m => println(
      s"wave=${m.wave} fetched=${m.fetched} deferred=${m.deferred} " +
        s"robots_blocked=${m.robots_blocked} dedup_hits=${m.dedup_hits} " +
        s"fetch_miss=${m.fetch_miss}"))
    if (emitOrder)
      CrawlJob.visitOrder(spark, state, partitions)
        .orderBy(col("rank")).show(50, truncate = false)
    spark.stop()
  }
}
