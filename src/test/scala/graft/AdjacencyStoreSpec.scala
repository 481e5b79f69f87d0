package graft

import graft.queries.AnalyticsQueries
import graft.sources.{DerivedStore, TableStore}

/** Pins the persisted derived-table contract (DerivedStore): a
  * deterministic derived table is committed ONCE per fixture
  * fingerprint and read back by later calls — including fresh JVMs
  * pointed at the same store — while a stale or foreign version at the
  * store is rebuilt instead of served. This is the round-14 cold-start
  * fix (q115's first sf10 trial was 1.7x steady state, all of it
  * adjacency build), generalized in round 16 to the SHARED co-shipment
  * pair store that q115/q116/q139 all project from. */
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
      DerivedStore.clearMemo()
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
      DerivedStore.clearMemo()
      val third = AnalyticsQueries.q115AdjacencyFiles(spark, sf())
      assert(third.nonEmpty)
      assert(TableStore.currentVersion(scoped).contains(2L),
        "fingerprint mismatch must rebuild, not serve stale files")

      // two fixtures under one root coexist in disjoint scoped stores
      DerivedStore.clearMemo()
      val other = AnalyticsQueries.q115AdjacencyFiles(spark, sf("sf0.01"))
      assert(other.nonEmpty && other != first)
      assert(TableStore.currentVersion(scoped).contains(2L),
        "the other fixture must not move this fixture's pointer")

      // and the query through the store still answers (full rank check
      // is the q115 oracle row; here: plumbing sanity)
      assert(AnalyticsQueries.q115PageRank(spark, sf("sf0.01")).count() > 0)
    } finally {
      spark.conf.unset("graft.q115.adjacencyDir")
      DerivedStore.clearMemo()
    }
  }

  test("shared co-shipment pair store: q115/q116/q139 read ONE committed build") {
    val root = java.nio.file.Files.createTempDirectory("graft_pairs_spec").toString
    spark.conf.set("graft.coship.pairsDir", root)
    val scoped = s"$root/${sf().replaceAll("[^A-Za-z0-9._-]", "_")}"
    try {
      // first consumer builds version 0...
      val files = AnalyticsQueries.coShipPairFiles(spark, sf())
      assert(files.nonEmpty)
      assert(TableStore.currentVersion(scoped).contains(0L))
      // ...every later consumer — across simulated fresh JVMs — reads
      // the SAME version: the self-join is paid once per fixture, not
      // once per graph query
      DerivedStore.clearMemo()
      assert(AnalyticsQueries.q116MarketBasket(spark, sf()).count() > 0)
      DerivedStore.clearMemo()
      assert(AnalyticsQueries.q139TriangleCount(spark, sf()).count() > 0)
      assert(TableStore.currentVersion(scoped).contains(0L),
        "consumers must read the committed build, not re-derive")
      // pair-store content sanity against a direct derivation: distinct
      // unordered pairs with per-order co-occurrence counts
      import org.apache.spark.sql.functions._
      val li = graft.sources.Tables.lineitem(spark, sf())
        .select("l_orderkey", "l_partkey").distinct()
      val direct = li.as("a").join(li.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_partkey") < col("b.l_partkey"))
        .groupBy(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
        .agg(count(lit(1)).as("n_ab"))
      val stored = spark.read.parquet(files: _*)
      assert(stored.count() == direct.count())
      assert(stored.exceptAll(direct).isEmpty && direct.exceptAll(stored).isEmpty)
    } finally {
      spark.conf.unset("graft.coship.pairsDir")
      DerivedStore.clearMemo()
    }
  }
}
