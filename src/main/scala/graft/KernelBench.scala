package graft

import org.apache.spark.sql.SparkSession

/** Focused kernel benchmark: args = <nRows> <cpus> <reps> [seenFactor].
  * Prints one line per rep: wall seconds + urls/sec for the
  * schedule+dedup kernel on an identical synthetic frontier. seenFactor
  * scales the pre-seeded seen set relative to the frontier (default
  * 0.25; 10 = the mature-crawl regime where seen ≫ frontier). */
object KernelBench {
  def main(args: Array[String]): Unit = {
    val n = args(0).toLong
    val cpus = args(1).toInt
    val reps = args(2).toInt
    val seenFactor = if (args.length > 3) args(3).toDouble else 0.25
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-kernel-bench")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    (1 to reps).foreach { i =>
      val (wall, urls) = BenchKernelRunner.run(spark, n, cpus, seenFactor)
      println(f"[kernel] rep=$i n=$n cpus=$cpus seenFactor=$seenFactor " +
        f"wall=$wall%.2fs urls=$urls rate=${urls / wall}%.0f/s")
    }
    spark.stop()
  }
}
