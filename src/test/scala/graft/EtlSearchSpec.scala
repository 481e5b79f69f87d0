package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.queries.EtlQueries
import graft.queries.SearchQueries

class EtlSearchSpec extends SparkSpec {
  import spark.implicits._

  test("dedupMerge is idempotent: applying the same batch twice == once") {
    val existing = Seq(("A", Timestamp.valueOf("2024-01-01 00:00:00"), 10.0))
      .toDF("ticker", "ts", "close")
    val batch = Seq(
      ("A", Timestamp.valueOf("2024-01-01 00:00:00"), 99.0, 1L), // dup key -> ignored
      ("A", Timestamp.valueOf("2024-01-02 00:00:00"), 11.0, 2L),
      ("A", Timestamp.valueOf("2024-01-02 00:00:00"), 12.0, 3L), // within-batch dup -> id 2 wins
      ("B", Timestamp.valueOf("2024-01-01 00:00:00"), 20.0, 4L))
      .toDF("ticker", "ts", "close", "event_id")
    val once = EtlQueries.dedupMerge(existing, batch)
    val twice = EtlQueries.dedupMerge(once, batch)
    val rows = once.orderBy("ticker", "ts").collect()
      .map(r => (r.getString(0), r.getDouble(2))).toSeq
    assert(rows == Seq(("A", 10.0), ("A", 11.0), ("B", 20.0)))
    assert(twice.orderBy("ticker", "ts").collect().map(_.toSeq).toSeq ==
      once.orderBy("ticker", "ts").collect().map(_.toSeq).toSeq)
  }

  test("mergeUpsert updates matched keys, inserts new ones, and is idempotent") {
    val existing = Seq(
      ("A", Timestamp.valueOf("2024-01-01 00:00:00"), 10.0),
      ("B", Timestamp.valueOf("2024-01-01 00:00:00"), 20.0))
      .toDF("ticker", "ts", "close")
    val batch = Seq(
      ("A", Timestamp.valueOf("2024-01-01 00:00:00"), 15.0, 1L), // update
      ("A", Timestamp.valueOf("2024-01-01 00:00:00"), 99.0, 2L), // dup key -> id 1 wins
      ("C", Timestamp.valueOf("2024-01-02 00:00:00"), 30.0, 3L)) // insert
      .toDF("ticker", "ts", "close", "event_id")
    val once = EtlQueries.mergeUpsert(existing, batch)
    val rows = once.orderBy("ticker").collect()
      .map(r => (r.getString(0), r.getDouble(2))).toSeq
    assert(rows == Seq(("A", 15.0), ("B", 20.0), ("C", 30.0)))
    val twice = EtlQueries.mergeUpsert(once, batch)
    assert(twice.orderBy("ticker").collect().map(_.toSeq).toSeq ==
      once.orderBy("ticker").collect().map(_.toSeq).toSeq)
  }

  test("search ranks name-prefix above ticker-prefix above substring position") {
    val hits = SearchQueries.search(spark, sf(), "ol").collect()
    assert(hits.nonEmpty)
    // all hits contain the query in the blob
    assert(hits.forall(r => (r.getAs[String]("name_display") + " " +
      r.getAs[String]("yf_symbol")).toLowerCase.contains("ol")))
    // prefix matches (if any) must come before pure-substring matches
    val starts = hits.map(_.getAs[String]("name_display").toLowerCase.startsWith("ol"))
    val firstNonPrefix = starts.indexOf(false)
    if (firstNonPrefix >= 0) assert(!starts.drop(firstNonPrefix).contains(true))
  }

  test("search respects the limit and segment filter") {
    val hits = SearchQueries.search(spark, sf("sf0.01"), "a", Seq("Large"), limit = 7).collect()
    assert(hits.length <= 7)
    assert(hits.forall(_.getAs[String]("segment") == "Large"))
  }
}
