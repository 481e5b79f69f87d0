package graft

import org.apache.spark.sql.functions._
import graft.streaming.StreamingQueries
import graft.sources.Tables

/** The deployment-shape state-store check: every stateful streaming
  * query in the engine must also run on the RocksDB provider — the
  * disk-backed store a 100 TB deployment uses when state outgrows the
  * executor heap. Results must equal the batch oracle exactly, same as
  * with the default in-memory provider.
  */
class StreamingStateSpec extends SparkSpec {

  test("mapGroupsWithState and sessionization run on the RocksDB state store") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // q37: per-user running stats across micro-batches
      val got = StreamingQueries.q37StreamUserStats(spark, sf()).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
      val exp = Tables.events(spark, sf())
        .groupBy("user_id").agg(count(lit(1)).as("n")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(got == exp)
      // q45: session state with event-time timeouts
      val sessions = StreamingQueries.q45StreamSessionize(spark, sf()).count()
      val batch = graft.queries.EventsQueries.q18Sessionize(spark, sf()).count()
      assert(sessions == batch && sessions > 0)
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}
