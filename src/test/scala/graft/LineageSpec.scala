package graft

import org.apache.spark.sql.functions._
import graft.operators.Lineage

/** Lineage truncation for iterative jobs: the cut must not silently
  * discard a partitioning the loop relies on. truncateKeepPartitioning
  * exists because the plain (AQE-planned) cut does exactly that —
  * these specs pin both behaviors so a Spark upgrade that changes
  * either surfaces here, not as a silent per-iteration shuffle.
  */
class LineageSpec extends SparkSpec {

  private def partitionedFrame() = {
    import spark.implicits._
    (1L to 1000L).map(i => (i % 97, i)).toDF("u", "v").repartition(col("u"))
  }

  test("truncateKeepPartitioning: downstream same-key aggregation plans no exchange") {
    val e = Lineage.truncateKeepPartitioning(partitionedFrame())
    val agg = e.groupBy("u").count()
    agg.collect()
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning(u"),
      s"partitioning lost across the cut — aggregation re-exchanged:\n$plan")
  }

  test("plain truncate under AQE loses the partitioning (why the variant exists)") {
    val e = Lineage.truncate(partitionedFrame())
    val agg = e.groupBy("u").count()
    agg.collect()
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("Exchange hashpartitioning(u"),
      "plain truncate now preserves partitioning — " +
        s"truncateKeepPartitioning may be removable:\n$plan")
  }

  test("both forms preserve the data itself") {
    val want = partitionedFrame().groupBy("u").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    Seq(Lineage.truncate _, Lineage.truncateKeepPartitioning _).foreach { f =>
      val got = f(partitionedFrame()).groupBy("u").count()
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want)
    }
  }
}
