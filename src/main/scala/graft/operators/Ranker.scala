package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Order keys without single-partition bottlenecks.
  *
  * A dense global rank (`row_number` over an empty window) serializes the
  * whole dataset through one partition — fatal at 10^10 rows. The crawl
  * only needs parent ranks that are ORDER-ISOMORPHIC to the dense visit
  * rank (priority comparisons and min-wins dedup are order-based), so each
  * wave assigns `ord` = range-partitioned, sort-preserving
  * monotonically_increasing_id: ascending range partitions get ascending
  * partition ids, and the id is (partitionId << 33 | localOffset), hence
  * globally ordered like the sort key while every partition works
  * independently.
  *
  * Dense ranks are materialized exactly once, at golden-order emission,
  * via the offset/prefix-sum pattern (tiny per-partition count aggregate +
  * broadcast join — no single-partition stage).
  */
object Ranker {

  /** Add `ordCol`: a long, order-isomorphic to sortKeys, all values
    * strictly greater than any value from previous waves (waveBase must
    * leave 2^50 headroom per wave). */
  def orderIsomorphicId(df: DataFrame, sortKeys: Seq[Column], ordCol: String,
      waveBase: Long, partitions: Int): DataFrame = {
    val sorted = df
      .repartitionByRange(partitions, sortKeys: _*)
      .sortWithinPartitions(sortKeys: _*)
    sorted.withColumn(ordCol, monotonically_increasing_id() + lit(waveBase))
  }

  /** Dense 1-based rank by sortKeys starting at startRank, without a
    * global single-partition window: range-partition + per-partition
    * row_number + broadcast prefix-sum of partition counts. */
  def denseRank(df: DataFrame, sortKeys: Seq[Column], rankCol: String,
      startRank: Long, partitions: Int): DataFrame = {
    val spark = df.sparkSession
    import org.apache.spark.sql.expressions.Window
    val withPid = df
      .repartitionByRange(partitions, sortKeys: _*)
      .sortWithinPartitions(sortKeys: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true) // pin partitioning; counts + ranks read the same layout
    val counts = withPid.groupBy("__pid").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    var acc = startRank - 1
    val offsets = counts.map { case (pid, n) => val o = pid -> acc; acc += n; o }.toMap
    val offsetDf = spark.createDataFrame(
      spark.sparkContext.parallelize(offsets.toSeq.map(t => org.apache.spark.sql.Row(t._1, t._2)), 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("__pid2", org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("__off", org.apache.spark.sql.types.LongType))))
    val w = Window.partitionBy(col("__pid")).orderBy(sortKeys: _*)
    withPid
      .join(broadcast(offsetDf), col("__pid") === col("__pid2"))
      .withColumn(rankCol, row_number().over(w).cast("long") + col("__off"))
      .drop("__pid", "__pid2", "__off")
  }
}
