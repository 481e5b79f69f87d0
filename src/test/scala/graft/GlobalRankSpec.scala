package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.queries.AnalyticsQueries
import graft.sources.Tables

/** q162: the global total-order rank must be the RANGE-PARTITIONED
  * parallel sort, never the single-partition window. The oracle checks
  * rank values; these specs pin the plan shape (rangepartitioning
  * present, no SinglePartition exchange) and the repartition-invariance
  * that makes the distributed rank exact. */
class GlobalRankSpec extends SparkSpec {

  test("q162 ranks equal the single-partition window truth") {
    val got = AnalyticsQueries.q162GlobalRank(spark, sf())
      .orderBy("rnk").collect().map(_.toSeq).toSeq
    val w = Window.orderBy(col("price_micro").desc, col("o_orderkey").asc)
    val want = Tables.orders(spark, sf())
      .select(col("o_orderkey").cast("long").as("o_orderkey"),
        round(col("o_totalprice") * 1e6).cast("long").as("price_micro"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .select("rnk", "o_orderkey", "price_micro")
      .orderBy("rnk").collect().map(_.toSeq).toSeq
    assert(got == want && got.nonEmpty)
    // ranks are a permutation 1..n with no gaps
    assert(got.map(_.head.asInstanceOf[Long]) == (1L to got.length).toSeq)
  }

  test("q162's sort is range-partitioned, with no SinglePartition exchange") {
    val sorted = Tables.orders(spark, sf())
      .select(col("o_orderkey").cast("long").as("ok"),
        round(col("o_totalprice") * 1e6).cast("long").as("price_micro"))
      .repartitionByRange(col("price_micro").desc, col("ok").asc)
      .sortWithinPartitions(col("price_micro").desc, col("ok").asc)
    val plan = sorted.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("rangepartitioning"),
      s"expected a range-partitioned exchange:\n$plan")
    assert(!plan.contains("SinglePartition"),
      s"global sort fell back to a single partition:\n$plan")
  }

  test("rank is invariant to the partition count (boundaries cancel out)") {
    val spark2 = spark.newSession()
    spark2.conf.set("spark.sql.shuffle.partitions", "7")
    val got7 = AnalyticsQueries.q162GlobalRank(spark2, sf())
      .orderBy("rnk").collect().map(_.toSeq).toSeq
    val got = AnalyticsQueries.q162GlobalRank(spark, sf())
      .orderBy("rnk").collect().map(_.toSeq).toSeq
    assert(got7 == got)
  }
}
