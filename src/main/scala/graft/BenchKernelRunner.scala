package graft

import graft.model.RobotsRule
import graft.operators.FrontierKernel
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthetic-frontier generator + one timed schedule+dedup kernel pass
  * (shared by [[Bench]] and [[KernelBench]]).
  *
  * Frontier shape mirrors the 10^10 design point scaled down: 30% of URLs
  * on one hot host (skew), the rest across 1000 hosts; the pre-seeded
  * seen set overlaps 25% of the frontier (dedup hits); robots rules block
  * a subtree on every 4th host.
  */
object BenchKernelRunner {

  private val NHosts = 1000

  def frontierDf(spark: SparkSession, n: Long, parts: Int): DataFrame = {
    val hostId = when(pmod(col("id"), lit(10)) < 3, lit(0))
      .otherwise(pmod(col("id"), lit(NHosts)) + 1)
    spark.range(0, n, 1, parts)
      .withColumn("host", concat(lit("h"), hostId, lit(".example.org")))
      .withColumn("url", concat(lit("http://"), col("host"), lit("/p/"), col("id")))
      .withColumn("url_hash", xxhash64(col("url")))
      .withColumn("depth", lit(1))
      .withColumn("parent_ord", col("id"))
      .withColumn("link_index", lit(0))
      .drop("id")
  }

  /** seen set overlapping 25% of the frontier ids. */
  def seenDf(spark: SparkSession, n: Long, parts: Int): DataFrame =
    frontierDf(spark, n / 4, parts).select("url_hash")

  def benchRules: Seq[RobotsRule] =
    (0 until 16).map { h =>
      RobotsRule(s"h$h.example.org", if (h % 4 == 3) "/p/1" else "/",
        allow = h % 4 != 3, crawl_delay = if (h == 0) 2 else 1)
    }

  /** One kernel pass; returns (wallSec, urlsProcessed = scheduled+deduped).
    * Inputs are materialized (persisted) outside the clock. */
  def run(spark: SparkSession, n: Long, cpus: Int): (Double, Long) = {
    val parts = cpus * 2
    val frontier = frontierDf(spark, n, parts).persist()
    val seen = seenDf(spark, n, parts).persist()
    frontier.count(); seen.count()
    val bloom = seen.stat.bloomFilter("url_hash", math.max(n / 2, 1000L), 0.01)
    val t0 = System.nanoTime()
    val r = FrontierKernel.scheduleDedup(spark, frontier, n, seen, benchRules,
      hostBudget = Int.MaxValue / 4, saltBuckets = cpus * 2,
      numPartitions = parts, bloom = bloom)
    val wall = (System.nanoTime() - t0) / 1e9
    frontier.unpersist(); seen.unpersist()
    (wall, r.scheduled + r.newUrls + r.dedupHits)
  }
}
