package graft

import graft.queries.AnalyticsQueries
import graft.sources.TableStore

/** Pins q115's persisted-adjacency contract: the deterministic derived
  * table is committed ONCE per fixture (TableStore version,
  * fingerprinted by the lineitem file set) and read back by later
  * calls — including fresh JVMs pointed at the same store — while a
  * different fixture at the same store dir rebuilds instead of serving
  * stale adjacency. This is the round-14 cold-start fix (first-trial
  * sf10 multi-JVM was 1.7x steady state, all of it adjacency build). */
class AdjacencyStoreSpec extends SparkSpec {

  test("adjacency store: build once, read back, fingerprint-guarded") {
    val dir = java.nio.file.Files.createTempDirectory("graft_adj_spec").toString
    spark.conf.set("graft.q115.adjacencyDir", dir)
    try {
      val first = AnalyticsQueries.q115AdjacencyFiles(spark, sf())
      assert(first.nonEmpty)
      assert(TableStore.currentVersion(dir).contains(0L))

      // fresh JVM simulated: drop the in-process memo — the store, not
      // the memo, must satisfy the second call (no new version)
      AnalyticsQueries.q115AdjMemo.clear()
      val second = AnalyticsQueries.q115AdjacencyFiles(spark, sf())
      assert(second == first)
      assert(TableStore.currentVersion(dir).contains(0L),
        "read-back must not recommit")

      // a DIFFERENT fixture at the same store dir must not be served
      // the stale adjacency: fingerprint mismatch commits version 1
      AnalyticsQueries.q115AdjMemo.clear()
      val other = AnalyticsQueries.q115AdjacencyFiles(spark, sf("sf0.01"))
      assert(other.nonEmpty && other != first)
      assert(TableStore.currentVersion(dir).contains(1L),
        "fingerprint mismatch must rebuild, not serve stale files")

      // and the query through the store still answers (full rank check
      // is the q115 oracle row; here: plumbing sanity)
      AnalyticsQueries.q115AdjMemo.clear()
      spark.conf.set("graft.q115.adjacencyDir", dir)
      assert(AnalyticsQueries.q115PageRank(spark, sf("sf0.01")).count() > 0)
    } finally {
      spark.conf.unset("graft.q115.adjacencyDir")
      AnalyticsQueries.q115AdjMemo.clear()
    }
  }
}
