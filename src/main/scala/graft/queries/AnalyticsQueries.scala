package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Star-schema analytics headliners for the bench harness: a TPC-H-Q1
  * style pricing summary (pure map-side-combinable aggregation — the
  * throughput yardstick) and a dimension-join top-k (broadcast joins +
  * per-group window rank).
  */
object AnalyticsQueries {

  private def microLong(x: Column): Column = round(x * 1e6).cast("long")

  /** Q16: pricing summary — group-by aggregation over the full fact
    * table; all float sums exact via micro-scaled longs. */
  def q16PricingSummary(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .filter(to_date(col("l_shipdate")) <= lit("2000-09-02"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum("l_quantity").as("sum_qty"),
        sum(microLong(col("l_extendedprice"))).as("bp"),
        sum(microLong(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("dp"),
        sum(microLong(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
          * (lit(1.0) + col("l_tax")))).as("ch"),
        sum(microLong(col("l_discount"))).as("dc"),
        count(lit(1)).as("count_order"))
      .select(col("l_returnflag"), col("l_linestatus"), col("sum_qty"),
        (col("bp").cast("double") / 1e6).as("sum_base_price"),
        (col("dp").cast("double") / 1e6).as("sum_disc_price"),
        (col("ch").cast("double") / 1e6).as("sum_charge"),
        (col("sum_qty") / col("count_order")).as("avg_qty"),
        (col("bp").cast("double") / 1e6 / col("count_order")).as("avg_price"),
        (col("dc").cast("double") / 1e6 / col("count_order")).as("avg_disc"),
        col("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** Q17: top-10 customers by order revenue per nation — broadcast the
    * dimensions, shuffle the fact once on custkey, rank per nation. */
  def q17TopCustomers(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
    val c = Tables.customer(spark, sfDir)
    val n = Tables.nation(spark, sfDir)
    val rev = o.groupBy("o_custkey")
      .agg(sum(microLong(col("o_totalprice"))).as("rev_l"))
    val w = Window.partitionBy("n_name").orderBy(col("rev_l").desc, col("o_custkey").asc)
    rev
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 10)
      .select(col("n_name"), col("o_custkey").as("custkey"), col("c_name"),
        (col("rev_l").cast("double") / 1e6).as("revenue"),
        col("rnk").cast("long").as("rnk"))
      .orderBy("n_name", "rnk")
  }

  val oracle: Map[String, String] = Map(
    "q16_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |       SUM(l_quantity) AS sum_qty,
        |       CAST(SUM(CAST(ROUND(l_extendedprice*1000000.0) AS BIGINT)) AS DOUBLE)/1000000.0 AS sum_base_price,
        |       CAST(SUM(CAST(ROUND(l_extendedprice*(1.0-l_discount)*1000000.0) AS BIGINT)) AS DOUBLE)/1000000.0 AS sum_disc_price,
        |       CAST(SUM(CAST(ROUND(l_extendedprice*(1.0-l_discount)*(1.0+l_tax)*1000000.0) AS BIGINT)) AS DOUBLE)/1000000.0 AS sum_charge,
        |       SUM(l_quantity)/COUNT(*) AS avg_qty,
        |       CAST(SUM(CAST(ROUND(l_extendedprice*1000000.0) AS BIGINT)) AS DOUBLE)/1000000.0/COUNT(*) AS avg_price,
        |       CAST(SUM(CAST(ROUND(l_discount*1000000.0) AS BIGINT)) AS DOUBLE)/1000000.0/COUNT(*) AS avg_disc,
        |       COUNT(*) AS count_order
        |FROM lineitem
        |WHERE CAST(l_shipdate AS DATE) <= DATE '2000-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q17_top_customers" ->
      """WITH rev AS (
        |  SELECT o_custkey, SUM(CAST(ROUND(o_totalprice*1000000.0) AS BIGINT)) AS rev_l
        |  FROM orders GROUP BY o_custkey),
        |ranked AS (
        |  SELECT n_name, o_custkey AS custkey, c_name,
        |         CAST(rev_l AS DOUBLE)/1000000.0 AS revenue,
        |         row_number() OVER (PARTITION BY n_name
        |                            ORDER BY rev_l DESC, o_custkey ASC) AS rnk
        |  FROM rev
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey)
        |SELECT n_name, custkey, c_name, revenue, rnk
        |FROM ranked WHERE rnk <= 10
        |ORDER BY n_name, rnk""".stripMargin
  )
}
