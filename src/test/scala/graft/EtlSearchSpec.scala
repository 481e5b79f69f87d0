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

  test("scd2 collapses runs, emits half-open contiguous intervals, one current row per key") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // key 1: A A B A (collapse the AA run, re-open A later); key 2: single row
    val log = Seq(
      (1L, 10L, 1L, "A"), (1L, 20L, 2L, "A"), (1L, 30L, 3L, "B"), (1L, 40L, 4L, "A"),
      (2L, 15L, 5L, "X")
    ).toDF("k", "t", "id", "attr")
    val out = EtlQueries.scd2(log, "k", "t", "id", "attr")
      .orderBy("k", "effective_from")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]), r.getLong(4)))
    assert(out.toSeq == Seq(
      (1L, "A", 10L, Some(30L), 0L),   // AA run collapsed to one interval
      (1L, "B", 30L, Some(40L), 0L),
      (1L, "A", 40L, None, 1L),        // value re-opens as a NEW interval
      (2L, "X", 15L, None, 1L)))
    // invariants: exactly one current row per key; intervals are contiguous
    val cur = EtlQueries.scd2(log, "k", "t", "id", "attr")
      .groupBy("k").agg(sum("is_current").as("n")).collect()
    assert(cur.forall(_.getLong(1) == 1L))
  }

  test("scd2 plan has a single exchange (lag, filter, lead share one sort)") {
    import spark.implicits._
    val log = Seq((1L, 10L, 1L, "A"), (1L, 20L, 2L, "B")).toDF("k", "t", "id", "attr")
    val plan = EtlQueries.scd2(log, "k", "t", "id", "attr")
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan).size == 1, s"expected 1 exchange:\n$plan")
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

  test("q104 BM25 top-k plans as TakeOrdered with partial tf aggregation") {
    val plan = SearchQueries.q104Bm25TopK(spark, sf("sf0.01"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k must not be a global sort:\n$plan")
    assert(plan.contains("partial_count"),
      s"tf must combine map-side before its shuffle:\n$plan")
    // ranking sanity: scores strictly ordered, k respected
    val rows = SearchQueries.q104Bm25TopK(spark, sf("sf0.01"), k = 5).collect()
    assert(rows.length == 5)
    val scores = rows.map(_.getAs[Long]("score_micro")).toSeq
    assert(scores == scores.sorted.reverse)
  }

  test("q118 OLS fits in one map-side-combined aggregation pass") {
    val plan = graft.queries.AnalyticsQueries.q118TrendSlope(spark, sf("sf0.01"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_sum") || plan.contains("partial_count"),
      s"sufficient statistics must combine map-side:\n$plan")
    // slope must be computed from the aggregates, not a second scan
    assert("Scan parquet".r.findAllIn(plan).length == 1,
      s"q118 must scan events exactly once:\n$plan")
  }

  test("q103 posting digest pins order: a permuted posting changes the hash") {
    import spark.implicits._
    val docs = Seq((1L, "b a"), (2L, "a b")).toDF("doc_id", "text")
    // same token multiset per doc pair, different positions -> the two
    // tokens' digests must differ from each other's swap
    val m = SearchQueries.q103InvertedIndexFrom(docs)
      .collect().map(r => r.getString(0) -> r.getString(3)).toMap
    assert(m("a") != m("b"))
  }
}
