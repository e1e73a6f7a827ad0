package graft

import org.apache.spark.sql.SparkSession

/** Focused kernel benchmark: args = <nRows> <cpus> <reps> [seenFactor]
  * [ruledHosts] [clockHosts].
  * Prints one line per rep: wall seconds + urls/sec for the
  * schedule+dedup kernel on an identical synthetic frontier. seenFactor
  * scales the pre-seeded seen set relative to the frontier (default
  * 0.25; 10 = the mature-crawl regime where seen ≫ frontier);
  * ruledHosts > 64 routes robots through the size-adaptive JOINED
  * policy; clockHosts > 0 switches to the virtual-clock politeness pass
  * ([[BenchKernelRunner.runClocked]]) with a clock table of that many
  * hosts (past Robots.MaxBroadcastHosts the state joins drop their
  * broadcast). Isolated single-purpose JVM: the window-matched way to
  * re-measure one regime row from [[Bench]]. */
object KernelBench {
  def main(args: Array[String]): Unit = {
    val n = args(0).toLong
    val cpus = args(1).toInt
    val reps = args(2).toInt
    val seenFactor = if (args.length > 3) args(3).toDouble else 0.25
    val ruledHosts = if (args.length > 4) args(4).toInt else 16
    val clockHosts = if (args.length > 5) args(5).toLong else 0L
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-kernel-bench")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    (1 to reps).foreach { i =>
      val (wall, urls) =
        if (clockHosts > 0)
          BenchKernelRunner.runClocked(spark, n, cpus, clockHosts, clockHosts)
        else BenchKernelRunner.run(spark, n, cpus, seenFactor, ruledHosts)
      println(f"[kernel] rep=$i n=$n cpus=$cpus seenFactor=$seenFactor " +
        f"ruledHosts=$ruledHosts clockHosts=$clockHosts " +
        f"wall=$wall%.2fs urls=$urls rate=${urls / wall}%.0f/s")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
