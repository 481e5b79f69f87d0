package graft

import org.apache.spark.sql.functions._
import graft.queries.AnalyticsQueries
import graft.sources.Tables

/** q147–q149: persisted sketch mart, multiset set-ops, equi-depth
  * histogram. The oracle checks the numbers; these check the scale
  * contracts — the rollup never re-reads the raw log, bag arithmetic
  * balances, and the histogram is built without a global row sort.
  */
class SketchRollupSpec extends SparkSpec {

  test("q147 weekly rollup reads only the sketch mart, never raw events") {
    val df = AnalyticsQueries.q147SketchRollup(spark, sf())
    // the mart write happens eagerly inside the builder; the returned
    // frame's plan must scan the daily mart alone
    val plan = df.queryExecution.executedPlan.toString
    val scans = "FileScan parquet".r.findAllIn(plan).length
    assert(scans == 1, s"expected one scan (the mart), got $scans:\n$plan")
    assert(!plan.contains("events.parquet"),
      s"weekly rollup must not touch the raw log:\n$plan")
    // dedup effect is visible: a week's distinct <= the sum of its days'
    df.collect().foreach { r =>
      assert(r.getLong(4) <= r.getLong(3),
        s"weekly distinct exceeds sum of daily distincts: $r")
    }
  }

  test("q148 bag arithmetic balances: |R intersect_all A| + |R except_all A| = |R|") {
    val out = AnalyticsQueries.q148SetOps(spark, sf())
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val nR = Tables.lineitem(spark, sf())
      .filter(col("l_returnflag") === "R").count()
    assert(out("intersect_all") + out("except_all") == nR,
      s"multiset identity broken: $out vs |R|=$nR")
  }

  test("q149 buckets are balanced and tile the value range") {
    val rows = AnalyticsQueries.q149EquiDepth(spark, sf()).collect()
    assert(rows.length == 10)
    val n = rows.map(_.getLong(1)).sum
    // value-granular assignment: each bucket within one value-run of N/10
    rows.foreach { r =>
      assert(math.abs(r.getLong(1) - n / 10) <= n / 10 / 2,
        s"bucket far from equi-depth: $r (N=$n)")
    }
    // [lo, hi] strictly ascending, non-overlapping
    rows.sliding(2).foreach {
      case Array(a, b) => assert(a.getLong(3) < b.getLong(2),
        s"bucket bounds overlap: $a then $b")
      case _ =>
    }
  }
}
