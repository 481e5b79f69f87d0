package graft

import org.apache.spark.sql.functions._
import graft.queries.AnalyticsQueries
import graft.sources.Tables

/** q144–q146: growth accounting, islands & gaps, distributed skyline.
  * The DuckDB oracle checks the answers; these specs check the scale
  * properties the oracle cannot see — that the shuffle structure is
  * the one the scaladocs promise, and that the skyline's frame logic
  * equals the brute-force domination definition in-engine.
  */
class GrowthSkylineSpec extends SparkSpec {

  private def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
  }

  test("q144 shuffles the activity table on the customer key exactly once") {
    val plan = finalPlan(AnalyticsQueries.q144GrowthAccounting(spark, sf()))
    val custEx = "Exchange hashpartitioning\\(cust".r.findAllIn(plan).length
    assert(custEx == 1,
      s"expected ONE customer-keyed exchange (distinct + window share it), got $custEx:\n$plan")
  }

  test("q145 runs four regroupings on one hash exchange") {
    val plan = finalPlan(AnalyticsQueries.q145IslandsGaps(spark, sf()))
    // distinct(user,day), per-user window, per-(user,run) rollup,
    // per-user summary: all satisfied by hashpartitioning(user_id) —
    // the only other exchange is the final orderBy's rangepartitioning
    val hashEx = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(hashEx == 1,
      s"expected exactly ONE hash exchange for the whole query, got $hashEx:\n$plan")
  }

  test("q146 skyline equals the brute-force domination definition") {
    val p = Tables.part(spark, sf())
      .select(col("p_size").cast("int").as("p_size"),
        round(col("p_retailprice") * 100).cast("long").as("price_c"))
    val brute = p.as("a").join(p.as("b"),
        col("b.p_size") <= col("a.p_size") &&
          col("b.price_c") >= col("a.price_c") &&
          (col("b.p_size") < col("a.p_size") ||
            col("b.price_c") > col("a.price_c")),
        "left_anti")
      .groupBy("p_size", "price_c").agg(count(lit(1)).as("n_parts"))
      .orderBy("p_size", "price_c")
    val got = AnalyticsQueries.q146Skyline(spark, sf())
    assert(got.collect().toSeq == brute.collect().toSeq)
  }

  test("q146 plans no quadratic join — the sweep is windows + a tiny broadcast") {
    val plan = finalPlan(AnalyticsQueries.q146Skyline(spark, sf()))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"skyline must not fall back to an all-pairs join:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"expected the prefix-max join-back to broadcast:\n$plan")
  }

  test("q150 overlap join is an equi-join on the day grain — no nested loop") {
    val plan = finalPlan(AnalyticsQueries.q150IntervalOverlap(spark, sf()))
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"interval overlap must not plan an inequality join:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"expected the incident days broadcast into an equi-join:\n$plan")
  }

  test("q152/q153 snowflake joins: dims broadcast, no nested loop") {
    Seq(AnalyticsQueries.q152RegionalRevenue(spark, sf()),
        AnalyticsQueries.q153MarketShare(spark, sf())).foreach { df =>
      val plan = finalPlan(df)
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"),
        s"snowflake join degenerated:\n$plan")
      assert("BroadcastHashJoin".r.findAllIn(plan).length >= 3,
        s"expected the dimension chain to broadcast:\n$plan")
    }
  }

  test("q153 share identity: nation revenue never exceeds the total") {
    AnalyticsQueries.q153MarketShare(spark, sf()).collect().foreach { r =>
      assert(r.getLong(1) <= r.getLong(2) && r.getLong(3) <= 1000000L,
        s"share out of range: $r")
    }
  }

  test("q154 every released group clears k and the accounting balances") {
    val rows = AnalyticsQueries.q154KAnonymity(spark, sf("sf0.01")).collect()
    val (supp, rel) = rows.partition(_.getString(0) == "*")
    assert(supp.length == 1, "exactly one suppressed bucket")
    rel.foreach(r => assert(r.getLong(2) >= 10L, s"group below k released: $r"))
    val total = Tables.customer(spark, sf("sf0.01")).count()
    assert(rows.map(_.getLong(2)).sum == total,
      s"suppression lost rows: ${rows.map(_.getLong(2)).sum} vs $total")
  }

  test("q144 ledger balances: active = new + retained + resurrected") {
    val rows = AnalyticsQueries.q144GrowthAccounting(spark, sf()).collect()
    rows.foreach { r =>
      assert(r.getLong(1) == r.getLong(2) + r.getLong(3) + r.getLong(4),
        s"ledger broken at ${r.get(0)}: $r")
      assert(r.getLong(5) >= 0, s"negative churn at ${r.get(0)}: $r")
    }
  }
}
