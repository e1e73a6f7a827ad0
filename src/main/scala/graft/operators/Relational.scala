package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Core relational operator battery over the driver-provided TPC-H-ish
  * tables. Each query is written Spark-first (declarative DataFrame ops so
  * Catalyst handles pushdown / pruning / join selection) and has a DuckDB
  * oracle twin in [[graft.SparkEntry.oracleSql]].
  *
  * Numeric discipline for cross-engine hash equality: aggregate in exact
  * decimal (order-independent), then cast the result to double — both
  * engines round the same decimal to the same nearest double, so hashes
  * match bit-for-bit. Every computed column is aliased identically here
  * and in the oracle SQL.
  */
object Relational {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  private val dec = DecimalType(18, 4)

  /** TPC-H Q1 flavored pricing summary: group-agg with partial (map-side)
    * aggregation; no join. Filter is pushed to the parquet scan. */
  def q1Agg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "lineitem")
      .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        sum($"l_quantity".cast(dec)).cast("double").as("sum_qty"),
        sum($"l_extendedprice".cast(dec)).cast("double").as("sum_base_price"),
        sum(($"l_extendedprice".cast(dec) * (lit(1).cast(dec) - $"l_discount".cast(dec))).cast(dec))
          .cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  val q1Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
      |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Multi-way star join: fact (orders) joined to small dims — dims are
    * broadcast (Catalyst picks broadcast-hash below the threshold; we hint
    * explicitly so the plan survives a 100x fact scale-up). */
  def q2Join(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val orders = t(s, dir, "orders")
    val cust = t(s, dir, "customer")
    val nation = t(s, dir, "nation")
    val region = t(s, dir, "region")
    orders
      .join(broadcast(cust), $"o_custkey" === $"c_custkey")
      .join(broadcast(nation), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(region), $"n_regionkey" === $"r_regionkey")
      .groupBy($"r_name", $"n_name")
      .agg(
        sum($"o_totalprice".cast(dec)).cast("double").as("revenue"),
        count(lit(1)).as("n_orders"))
      .orderBy($"r_name", $"n_name")
  }

  val q2Sql: String =
    """SELECT r_name, n_name,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
      |  count(*) AS n_orders
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name, n_name
      |ORDER BY r_name, n_name""".stripMargin

  /** Per-group top-k via window row_number — the same pattern the crawl
    * scheduler uses for the per-host politeness budget (SURVEY §2.4 P1). */
  def q3TopK(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
    t(s, dir, "orders")
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter($"rk" <= 2)
      .select($"o_custkey", $"rk", $"o_orderkey",
        $"o_totalprice".cast(dec).cast("double").as("o_totalprice"))
      .orderBy($"o_custkey", $"rk")
  }

  val q3Sql: String =
    """SELECT o_custkey, rk, o_orderkey, o_totalprice FROM (
      |  SELECT o_custkey, o_orderkey,
      |    CAST(CAST(o_totalprice AS DECIMAL(18,4)) AS DOUBLE) AS o_totalprice,
      |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
      |  FROM orders) WHERE rk <= 2
      |ORDER BY o_custkey, rk""".stripMargin

  /** Global sort + limit (top-N): Spark plans TakeOrderedAndProject —
    * no full sort shuffle, each partition keeps N then the driver merges. */
  def q4SortLimit(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "lineitem")
      .select($"l_orderkey", $"l_linenumber",
        $"l_extendedprice".cast(dec).cast("double").as("l_extendedprice"))
      .orderBy($"l_extendedprice".desc, $"l_orderkey".asc, $"l_linenumber".asc)
      .limit(100)
  }

  val q4Sql: String =
    """SELECT l_orderkey, l_linenumber,
      |  CAST(CAST(l_extendedprice AS DECIMAL(18,4)) AS DOUBLE) AS l_extendedprice
      |FROM lineitem
      |ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
      |LIMIT 100""".stripMargin

  /** Set-membership algebra: customers with an open order but no 'F'
    * order — left_semi + left_anti, the same join kinds the frontier
    * dedup uses (SURVEY §2.3 D2/D3). */
  def q5SemiAnti(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cust = t(s, dir, "customer")
    val orders = t(s, dir, "orders")
    val open = orders.filter($"o_orderstatus" === "O").select($"o_custkey")
    val fin = orders.filter($"o_orderstatus" === "F").select($"o_custkey")
    cust
      .join(open, $"c_custkey" === open("o_custkey"), "left_semi")
      .join(fin, $"c_custkey" === fin("o_custkey"), "left_anti")
      .select($"c_custkey", $"c_name", $"c_mktsegment")
      .orderBy($"c_custkey")
  }

  val q5Sql: String =
    """SELECT c_custkey, c_name, c_mktsegment FROM customer
      |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
      |  AND c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
      |ORDER BY c_custkey""".stripMargin

  /** Rollup (grouping sets): revenue by (segment, status), (segment), (). */
  def q6Rollup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val orders = t(s, dir, "orders")
    val cust = t(s, dir, "customer")
    orders.join(broadcast(cust), $"o_custkey" === $"c_custkey")
      .rollup($"c_mktsegment", $"o_orderstatus")
      .agg(sum($"o_totalprice".cast(dec)).cast("double").as("revenue"),
        count(lit(1)).as("n"))
      .select(
        coalesce($"c_mktsegment", lit("ALL")).as("segment"),
        coalesce($"o_orderstatus", lit("ALL")).as("status"),
        $"revenue", $"n")
      .orderBy($"segment", $"status")
  }

  val q6Sql: String =
    """SELECT coalesce(c_mktsegment, 'ALL') AS segment,
      |  coalesce(o_orderstatus, 'ALL') AS status,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
      |  count(*) AS n
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY ROLLUP (c_mktsegment, o_orderstatus)
      |ORDER BY segment, status""".stripMargin

  /** Windowed running aggregate + lag: per-supplier running quantity in
    * shipdate order (frames + analytic functions). */
  def q7RunningWindow(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"l_suppkey")
      .orderBy($"l_shipdate".asc, $"l_orderkey".asc, $"l_linenumber".asc)
    t(s, dir, "lineitem")
      .filter($"l_suppkey" <= 20)
      .withColumn("running_qty",
        sum($"l_quantity".cast(dec)).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double"))
      .withColumn("prev_qty",
        lag($"l_quantity".cast(dec).cast("double"), 1).over(w))
      .select($"l_suppkey", $"l_orderkey", $"l_linenumber",
        $"running_qty", $"prev_qty")
      .orderBy($"l_suppkey", $"l_orderkey", $"l_linenumber")
  }

  val q7Sql: String =
    """SELECT l_suppkey, l_orderkey, l_linenumber,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) OVER (
      |    PARTITION BY l_suppkey ORDER BY l_shipdate ASC, l_orderkey ASC, l_linenumber ASC
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_qty,
      |  lag(CAST(CAST(l_quantity AS DECIMAL(18,4)) AS DOUBLE), 1) OVER (
      |    PARTITION BY l_suppkey ORDER BY l_shipdate ASC, l_orderkey ASC, l_linenumber ASC) AS prev_qty
      |FROM lineitem
      |WHERE l_suppkey <= 20
      |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin

  /** Set operations proper: UNION / INTERSECT / EXCEPT over key sets. */
  def q8SetOps(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val orders = t(s, dir, "orders")
    val o = orders.filter($"o_orderstatus" === "O").select($"o_custkey".as("k"))
    val f = orders.filter($"o_orderstatus" === "F").select($"o_custkey".as("k"))
    val both = o.intersect(f).withColumn("tag", lit("both"))
    val onlyO = o.distinct().except(f).withColumn("tag", lit("only_open"))
    both.unionByName(onlyO).orderBy($"tag", $"k")
  }

  val q8Sql: String =
    """SELECT k, tag FROM (
      |  SELECT k, 'both' AS tag FROM (
      |    SELECT o_custkey AS k FROM orders WHERE o_orderstatus='O'
      |    INTERSECT
      |    SELECT o_custkey AS k FROM orders WHERE o_orderstatus='F')
      |  UNION ALL
      |  SELECT k, 'only_open' AS tag FROM (
      |    SELECT DISTINCT o_custkey AS k FROM orders WHERE o_orderstatus='O'
      |    EXCEPT
      |    SELECT o_custkey AS k FROM orders WHERE o_orderstatus='F'))
      |ORDER BY tag, k""".stripMargin

  /** Event-time tumbling window over the events stream table — the batch
    * twin of the Structured Streaming aggregation in graft.streaming
    * (identical semantics; streaming adds a watermark). */
  def q9EventWindow(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "events")
      .groupBy(window($"ts", "1 hour").getField("start").as("win_start"),
        $"event_type")
      .agg(count(lit(1)).as("n_events"),
        sum($"value".cast(dec)).cast("double").as("sum_value"),
        countDistinct($"user_id").as("n_users"))
      .orderBy($"win_start", $"event_type")
  }

  val q9Sql: String =
    """SELECT date_trunc('hour', ts) AS win_start, event_type,
      |  count(*) AS n_events,
      |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value,
      |  count(DISTINCT user_id) AS n_users
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY win_start, event_type""".stripMargin
}
