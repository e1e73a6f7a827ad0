package graft

import org.apache.spark.sql.SparkSession

/** Real multi-executor scaling evidence for the north rule's N → 4N
  * criterion: runs the schedule+dedup kernel under Spark's
  * `local-cluster[execs,cores,memMB]` master, which launches each
  * executor as a SEPARATE JVM process (Spark's own standalone-mode test
  * harness) — unlike `local[k]`, shuffle blocks move between processes
  * over the block-transfer service and every task closure, broadcast,
  * and FileBank bucket image crosses a real process boundary.
  *
  * Levels: N executors then 4N executors, SAME per-executor shape
  * (cores, memory), same input rows, adjacent in time — the closest a
  * single box gets to "the same job at N and 4N executors". Both levels
  * are multi-executor so both pay cross-executor shuffle; the variable
  * is executor count alone.
  *
  * Run via spark-submit so executors fetch the app jar:
  * {{{
  * sbt package
  * /opt/spark/bin/spark-submit --class graft.ClusterScale \
  *   --driver-memory 8g target/scala-2.13/elasticwebcrawlerspark_2.13-0.1.0.jar \
  *   64000000 3 2 4 5120
  * }}}
  * args: nRows reps lowExecs coresPerExec memMB (high level = 4×lowExecs).
  * Prints one JSON line: per-rep rates at both levels, best-of rates,
  * and efficiency = (rate4N / rateN) / 4.
  */
object ClusterScale {

  private def session(execs: Int, cores: Int, memMb: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local-cluster[$execs,$cores,$memMb]")
      .appName(s"graft-cluster-scale-$execs")
      .config("spark.executor.memory", s"${memMb}m")
      .config("spark.sql.shuffle.partitions", (execs * cores).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def level(execs: Int, cores: Int, memMb: Int, n: Long,
      reps: Int): Seq[Double] = {
    val spark = session(execs, cores, memMb)
    try {
      // wait until every executor JVM has registered, else rep 1 runs
      // under-provisioned and the pair is not a controlled comparison
      val deadline = System.nanoTime() + 120e9.toLong
      while (spark.sparkContext.getExecutorMemoryStatus.size - 1 < execs &&
        System.nanoTime() < deadline) Thread.sleep(500)
      val totalCores = execs * cores
      BenchKernelRunner.run(spark, math.min(n / 4, 1000000L), totalCores) // warmup/JIT
      (1 to reps).map { i =>
        val (w, u) = BenchKernelRunner.run(spark, n, totalCores)
        System.err.println(f"[cluster-scale] execs=$execs rep=$i wall=$w%.1fs rate=${u / w}%.0f/s")
        u / w
      }
    } finally {
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }

  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 64000000L
    val reps = if (args.length > 1) args(1).toInt else 3
    val lowExecs = if (args.length > 2) args(2).toInt else 2
    val cores = if (args.length > 3) args(3).toInt else 4
    val memMb = if (args.length > 4) args(4).toInt else 5120
    val highExecs = lowExecs * 4

    val lowRates = level(lowExecs, cores, memMb, n, reps)
    val highRates = level(highExecs, cores, memMb, n, reps)
    val lowBest = lowRates.max
    val highBest = highRates.max
    val eff = (highBest / lowBest) / 4.0
    def arr(xs: Seq[Double]) = xs.map(r => f"$r%.0f").mkString("[", ",", "]")
    println(
      s"""{"mode":"local-cluster","kernel_n":$n,"cores_per_executor":$cores,"executor_mem_mb":$memMb,""" +
      s""""low_executors":$lowExecs,"low_rates":${arr(lowRates)},"low_best_urls_per_sec":${lowBest.toLong},""" +
      s""""high_executors":$highExecs,"high_rates":${arr(highRates)},"high_best_urls_per_sec":${highBest.toLong},""" +
      s""""efficiency_n_to_4n":${f"$eff%.3f"}}""")
  }
}
