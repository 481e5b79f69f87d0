package graft

import graft.queries.AnalyticsQueries
import graft.sources.TableStore

/** Pins q115's persisted-adjacency contract: the deterministic derived
  * table is committed ONCE per fixture (TableStore version,
  * fingerprinted by the lineitem file set) and read back by later
  * calls — including fresh JVMs pointed at the same store — while a
  * stale or foreign version at the store is rebuilt instead of served.
  * This is the round-14 cold-start fix (first-trial sf10 multi-JVM was
  * 1.7x steady state, all of it adjacency build). */
class AdjacencyStoreSpec extends SparkSpec {

  test("adjacency store: build once, read back, fingerprint-guarded") {
    val root = java.nio.file.Files.createTempDirectory("graft_adj_spec").toString
    spark.conf.set("graft.q115.adjacencyDir", root)
    // one pointer per FIXTURE under the root (a shared pointer would
    // ping-pong between fixtures and never hit)
    val scoped = s"$root/${sf().replaceAll("[^A-Za-z0-9._-]", "_")}"
    try {
      val first = AnalyticsQueries.q115AdjacencyFiles(spark, sf())
      assert(first.nonEmpty)
      assert(TableStore.currentVersion(scoped).contains(0L))

      // fresh JVM simulated: drop the in-process memo — the store, not
      // the memo, must satisfy the second call (no new version)
      AnalyticsQueries.q115AdjMemo.clear()
      val second = AnalyticsQueries.q115AdjacencyFiles(spark, sf())
      assert(second == first)
      assert(TableStore.currentVersion(scoped).contains(0L),
        "read-back must not recommit")

      // a committed version whose fingerprint does NOT match the
      // fixture (regenerated files, foreign data) must be rebuilt over,
      // never served stale
      import spark.implicits._
      TableStore.commit(spark, scoped, first.toDF("path"),
        Map("fingerprint" -> "stale"))
      assert(TableStore.currentVersion(scoped).contains(1L))
      AnalyticsQueries.q115AdjMemo.clear()
      val third = AnalyticsQueries.q115AdjacencyFiles(spark, sf())
      assert(third.nonEmpty)
      assert(TableStore.currentVersion(scoped).contains(2L),
        "fingerprint mismatch must rebuild, not serve stale files")

      // two fixtures under one root coexist in disjoint scoped stores
      AnalyticsQueries.q115AdjMemo.clear()
      val other = AnalyticsQueries.q115AdjacencyFiles(spark, sf("sf0.01"))
      assert(other.nonEmpty && other != first)
      assert(TableStore.currentVersion(scoped).contains(2L),
        "the other fixture must not move this fixture's pointer")

      // and the query through the store still answers (full rank check
      // is the q115 oracle row; here: plumbing sanity)
      assert(AnalyticsQueries.q115PageRank(spark, sf("sf0.01")).count() > 0)
    } finally {
      spark.conf.unset("graft.q115.adjacencyDir")
      AnalyticsQueries.q115AdjMemo.clear()
    }
  }
}
