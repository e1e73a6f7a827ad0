package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.operators._
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1Agg(spark, "/root/testdata/sf0.001")
  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> (Relational.q1Agg _),
    "q2_join" -> (Relational.q2Join _),
    "q3_topk" -> (Relational.q3TopK _),
    "q4_sort_limit" -> (Relational.q4SortLimit _),
    "q5_semi_anti" -> (Relational.q5SemiAnti _),
    "q6_rollup" -> (Relational.q6Rollup _),
    "q7_running_window" -> (Relational.q7RunningWindow _),
    "q8_set_ops" -> (Relational.q8SetOps _),
    "q9_event_window" -> (Relational.q9EventWindow _),
  )
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q1_agg" -> Relational.q1Sql,
    "q2_join" -> Relational.q2Sql,
    "q3_topk" -> Relational.q3Sql,
    "q4_sort_limit" -> Relational.q4Sql,
    "q5_semi_anti" -> Relational.q5Sql,
    "q6_rollup" -> Relational.q6Sql,
    "q7_running_window" -> Relational.q7Sql,
    "q8_set_ops" -> Relational.q8Sql,
    "q9_event_window" -> Relational.q9Sql,
  )
}
