package graft

import org.apache.spark.sql.functions._
import graft.queries.SourceQueries
import graft.sources.Tables

/** q89's scale claim is the PLAN, not just the answer: the month-
  * partitioned fact scan must carry a dynamic pruning filter fed by the
  * filtered calendar broadcast, so only the matching partition
  * directories are read. AQE wraps the scan, so we assert on the plan
  * string (same pattern as AsofBucketingSpec's native-exec checks).
  */
class DppSpec extends SparkSpec {

  test("q89 fact scan carries dynamicpruningexpression on the partition column") {
    val frame = SourceQueries.q89Frame(spark, sf())
    val planStr = frame.queryExecution.executedPlan.toString
    assert(planStr.contains("dynamicpruningexpression"),
      s"no dynamic partition pruning in plan:\n$planStr")
    // the pruning filter must sit on the partition column of the scan:
    // match the pruning subtree itself, not ship_month anywhere in the
    // plan (it also appears in the scan output and the groupBy)
    val pruneOnPartitionCol =
      """dynamicpruningexpression\([^)]*ship_month""".r
    assert(pruneOnPartitionCol.findFirstIn(planStr).isDefined,
      s"dynamic pruning expression is not over ship_month:\n$planStr")
  }

  test("q89 result equals the direct quarter filter over the raw table") {
    val got = SourceQueries.q89DppJoin(spark, sf())
      .collect().map(_.toSeq)
    val want = Tables.lineitem(spark, sf())
      .filter(year(to_date(col("l_shipdate"))) === 1997 &&
        quarter(to_date(col("l_shipdate"))) === 2)
      .groupBy(date_format(to_date(col("l_shipdate")), "yyyy-MM").as("ship_month"),
        col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 1e6)
          .cast("long")).as("rev_micro"))
      .orderBy("ship_month", "l_returnflag")
      .collect().map(_.toSeq)
    assert(got.nonEmpty && got.toSeq == want.toSeq)
  }
}
