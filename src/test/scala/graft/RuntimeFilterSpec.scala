package graft

import org.apache.spark.sql.functions._
import graft.queries.AnalyticsQueries
import graft.sources.Tables

/** q161: Catalyst's InjectRuntimeFilter must actually fire — the
  * DuckDB oracle checks the ANSWER, these specs check the properties
  * the oracle cannot see: the bloom `might_contain` subquery lands on
  * the fact side of the optimized plan, the reduction is a pure
  * optimization (bloom-pruned shuffle join ≡ plain broadcast join),
  * and the tuned thresholds stay on the cloned session instead of
  * leaking into the parent's conf. */
class RuntimeFilterSpec extends SparkSpec {

  test("q161 injects a bloom runtime filter on the lineitem side") {
    val df = AnalyticsQueries.q161RuntimeFilterJoin(spark, sf())
    val opt = df.queryExecution.optimizedPlan.toString
    assert(opt.contains("might_contain"),
      s"expected an injected bloom runtime filter in the optimized plan:\n$opt")
    // and it must guard the FACT scan: the membership test is applied
    // to lineitem's join key (the optimized plan names relations by
    // columns, so pin the filtered attribute, not a table name)
    assert("might_contain\\(.*\\n?.*xxhash64\\(l_orderkey".r
        .findFirstIn(opt).isDefined ||
      opt.contains("might_contain") && opt.contains("xxhash64(l_orderkey"),
      s"bloom filter not keyed on the fact join key:\n$opt")
  }

  test("q161 equals the plain broadcast formulation (pure optimization)") {
    val got = AnalyticsQueries.q161RuntimeFilterJoin(spark, sf())
      .collect().map(_.toSeq).toSeq
    val urgent = Tables.orders(spark, sf())
      .filter(col("o_orderpriority") === "1-URGENT" &&
        col("o_orderstatus") === "F")
      .select("o_orderkey", "o_orderdate")
    val want = Tables.lineitem(spark, sf())
      .select(col("l_orderkey"),
        round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 1e6)
          .cast("long").as("rev_micro"))
      .join(broadcast(urgent), col("l_orderkey") === col("o_orderkey"))
      .groupBy(date_trunc("month", col("o_orderdate")).cast("date").as("month"))
      .agg(count(lit(1)).as("n_lines"), sum("rev_micro").as("rev_micro"))
      .orderBy("month")
      .collect().map(_.toSeq).toSeq
    assert(got == want && got.nonEmpty)
  }

  test("q161's tuned thresholds do not leak into the parent session") {
    val key =
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
    val before = spark.conf.getOption(key)
    AnalyticsQueries.q161RuntimeFilterJoin(spark, sf())
    assert(spark.conf.getOption(key) == before,
      "runtime-filter threshold leaked into the shared session conf")
  }
}
