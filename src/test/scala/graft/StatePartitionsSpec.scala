package graft

import org.apache.spark.sql.functions._
import graft.streaming.StreamingQueries

/** The state-store partition count is a DEPLOYMENT knob
  * (`graft.stream.statePartitions`, default 8): it bounds a stateful
  * query's task parallelism for its whole life, so scale runs must be
  * able to raise it (at sf10 the 8-store default capped the interval
  * join at 8 tasks on a 32-core cluster — q52 took ~28 min until the
  * round-15 probe raised it). Two contracts pinned here: the knob
  * never changes RESULTS, and it never leaks into the session's batch
  * shuffle.partitions. */
class StatePartitionsSpec extends SparkSpec {

  test("q52: state-partition count changes parallelism, never results; conf restored") {
    val base = spark.conf.get("spark.sql.shuffle.partitions")
    def rows() = StreamingQueries.q52StreamIntervalJoin(spark, sf())
      .collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    val atDefault = rows()
    assert(spark.conf.get("spark.sql.shuffle.partitions") == base,
      "the stateful override must not leak into batch queries")
    spark.conf.set("graft.stream.statePartitions", "3")
    try {
      assert(rows() == atDefault,
        "a deployment re-sizing its state stores must read the same answer")
      assert(spark.conf.get("spark.sql.shuffle.partitions") == base)
    } finally spark.conf.unset("graft.stream.statePartitions")
  }

  test("unset knob auto-sizes from cores AND backlog, bounded [8, 64]") {
    // the pure sizing rule (the session here is local[4]; the rule is
    // what a 32-core or 1000-executor deployment resolves through).
    // Both terms carry a measured incident: cores-only at 8 capped a
    // 32-core sf10 interval join at 8 tasks; cores-only at 32 put ~9 s
    // of RocksDB store setup under a 0.15 s bench data cost.
    val MiB = 1L << 20
    assert(StreamingQueries.statePartitionsAuto(32, 163 * MiB) == 32,
      "a 32-core session with a real backlog gets its core count")
    assert(StreamingQueries.statePartitionsAuto(32, 2 * MiB) == 8,
      "a tiny backlog keeps the overhead floor even on many cores")
    assert(StreamingQueries.statePartitionsAuto(4, 163 * MiB) == 8,
      "tiny sessions keep the overhead floor")
    assert(StreamingQueries.statePartitionsAuto(1000, Long.MaxValue) == 64,
      "very wide clusters are bounded above; bigger state pins the conf")
    assert(StreamingQueries.statePartitionsAuto(1000, 40 * MiB) == 10,
      "a small backlog on a wide cluster sizes to the data")
    // and the auto default changes nothing about RESULTS: pinning 3
    // above already proved invariance across counts — here prove auto
    // vs pinned-auto read identically, i.e. the unset path goes
    // through the same rule
    def rows() = StreamingQueries.q52StreamIntervalJoin(spark, sf())
      .collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    val auto = rows()
    spark.conf.set("graft.stream.statePartitions",
      StreamingQueries.statePartitionsAuto(
        spark.sparkContext.defaultParallelism, 2 * MiB).toString)
    try assert(rows() == auto)
    finally spark.conf.unset("graft.stream.statePartitions")
  }

  test("graft.stream.sourceSplits + maxFilesPerTrigger: batch count changes, answers don't") {
    // the multi-batch parity contract at spec scale (MultiBatchProbe
    // carries it to sf1): forcing the backlog through >= 3 time-ascending
    // micro-batches must read the same answer as one swallow — slices
    // ascend in event time, so watermarks only advance between batches
    def rows() = StreamingQueries.q52StreamIntervalJoin(spark, sf())
      .collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    val single = rows()
    spark.conf.set("graft.stream.sourceSplits", "3")
    spark.conf.set("graft.stream.maxFilesPerTrigger", "1")
    try assert(rows() == single,
      "a backlog drained in 3 batches must equal the single-batch answer")
    finally {
      spark.conf.unset("graft.stream.sourceSplits")
      spark.conf.unset("graft.stream.maxFilesPerTrigger")
    }
  }

  test("ScaleUp span mode extends history: disjoint per-copy time segments, linear density") {
    val dst = java.nio.file.Files.createTempDirectory("graft_span_spec").toString
    graft.tools.ScaleUp.run(spark, sf(), dst, 2, "span", Some(Set("events")))
    val src = spark.read.parquet(s"${sf()}/events.parquet")
    val out = spark.read.parquet(s"$dst/events.parquet")
    assert(out.count() == 2 * src.count())
    // copy index is recoverable from the key shift (id*2 + c)
    val spans = out.withColumn("_c", col("event_id") % 2)
      .groupBy("_c").agg(min("ts").as("lo"), max("ts").as("hi"))
      .orderBy("_c").collect()
    assert(spans.length == 2)
    // copy 0 keeps the source window verbatim; copy 1 starts strictly
    // after copy 0 ends (the 1-day-ish gap) — extended history, not
    // densified tenants, so per-window join density stays source-shaped
    val srcSpan = src.agg(min("ts"), max("ts")).collect().head
    assert(spans(0).get(1) == srcSpan.get(0) && spans(0).get(2) == srcSpan.get(1))
    assert(spans(1).getAs[java.time.LocalDateTime]("lo")
      .isAfter(spans(0).getAs[java.time.LocalDateTime]("hi")))
    // only-list honored: nothing but events was generated
    assert(new java.io.File(dst).listFiles().map(_.getName).toSet ==
      Set("events.parquet"))
  }
}
