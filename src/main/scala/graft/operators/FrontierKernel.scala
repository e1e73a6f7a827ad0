package graft.operators

import graft.model.RobotsRule
import graft.plans.SeenState
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The scale-dominant kernel of the crawl engine, factored out so it can
  * be benchmarked at 10^7..10^10-row frontier scale independent of the
  * wave loop's sink writes: one politeness-schedule + dedup pass over a
  * frontier (exactly what the BASELINE metric "frontier URLs
  * scheduled+deduped/sec" measures).
  *
  * Pipeline = the same stages [[graft.plans.CrawlJob]] runs per wave:
  *  1. two-phase host-salted politeness top-k (hot-host skew defused);
  *  2. order-isomorphic visit-id assignment (no global window);
  *  3. prefilter + exact dedup against the bucketed seen state
  *     ([[SeenState]] — per-bucket filters, candidate-only exchange);
  *  4. robots predicate filter.
  */
object FrontierKernel {

  final case class KernelResult(
      scheduled: Long, deferred: Long, newUrls: Long, dedupHits: Long,
      robotsBlocked: Long)

  private val priorityKeys = Seq(col("depth"), col("parent_ord"), col("link_index"))
  private val obsCounter = new java.util.concurrent.atomic.AtomicLong()

  /** Back-compat face: builds the size-adaptive policy from a rule Seq
    * (compiled predicate ≤64 hosts, broadcast packed-rules join above —
    * the same cutover the production wave loop uses). */
  def scheduleDedup(spark: SparkSession, frontier: DataFrame, frontierTotal: Long,
      seen: SeenState, rules: Seq[RobotsRule], hostBudget: Int, saltBuckets: Int,
      numPartitions: Int): KernelResult =
    scheduleDedup(spark, frontier, frontierTotal, seen,
      Robots.policy(rules, spark), hostBudget, saltBuckets, numPartitions)

  /** One schedule+dedup pass.
    * frontier: (url, url_hash, host, depth, parent_ord, link_index)
    * seen:     the production bucketed seen state (bootstrap it outside
    *           the clock — it is amortized crawl state, not wave work).
    * policy:   the size-adaptive robots policy, so the benched path IS
    *           what a 10^7-ruled-host regime runs (broadcast packed-rules
    *           join), not only the small-host compiled chain.
    * Returns counters; the pipeline terminates in a noop-format write so
    * every stage actually executes. */
  def scheduleDedup(spark: SparkSession, frontier: DataFrame, frontierTotal: Long,
      seen: SeenState, policy: Robots.RobotsPolicy, hostBudget: Int, saltBuckets: Int,
      numPartitions: Int): KernelResult = {
    import org.apache.spark.sql.Observation

    // 1. politeness (contended-host split + two-phase salted top-k; the
    // frontier total rides along so a large frontier with an empty
    // contended set skips the windowed branch's full scan)
    val (fetchSet0, _) = Politeness.select(frontier, policy, hostBudget, saltBuckets,
      frontierHint = frontierTotal)

    // 2. visit ids (persisted: the prefilter-split consumes it twice)
    val fetchSet = Ranker.orderIsomorphicId(fetchSet0, priorityKeys, "ord",
      1L << 50, numPartitions).persist()
    val scheduled = fetchSet.count()

    // 3. dedup: one candidate exchange into the seen bucket partitioning,
    // post-exchange layered prefilter (task p faults in only bucket p's
    // file-bank image — O(seen/B) resident per executor; delta layers are
    // O(wave) broadcasts), filter-negatives skip the exact anti-join
    // chain; the seen pieces never re-shuffle (SeenState.freshAndConfirmed).
    // The just-counted cardinality rides along so the large-wave path
    // materializes the candidate exchange exactly once.
    val newUrls = seen.freshAndConfirmed(fetchSet, scheduled)

    // 4. robots through the same size-adaptive policy face
    val path = coalesce(nullif(parse_url(col("url"), lit("PATH")), lit("")), lit("/"))

    val obs = Observation(s"kernel-${obsCounter.incrementAndGet()}")
    val admitted = policy.withAllowed(newUrls, path, "__allowed")
      .observe(obs,
        count(lit(1)).as("new"),
        sum(when(col("__allowed"), 1L).otherwise(0L)).as("adm"))
      .filter(col("__allowed"))
      .drop("__allowed")
    admitted.write.format("noop").mode("overwrite").save()

    val nNew = obs.get("new").asInstanceOf[Long]
    val nAdm = Option(obs.get("adm")).map(_.asInstanceOf[Long]).getOrElse(0L)
    fetchSet.unpersist()
    KernelResult(scheduled, frontierTotal - scheduled, nNew, scheduled - nNew, nNew - nAdm)
  }
}
