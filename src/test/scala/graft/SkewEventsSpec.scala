package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew
import graft.sources.Tables

class SkewEventsSpec extends SparkSpec {
  import spark.implicits._

  test("distributed prefix sum equals the global window at any partition count") {
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(11)
    val df = (1L to 500L).map(i => (i, rnd.nextInt(100).toLong + 1))
      .toDF("id", "v")
    val w = Window.orderBy("id").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val expected = df.withColumn("cum", org.apache.spark.sql.functions.sum("v").over(w))
      .select("id", "cum").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (parts <- Seq(1, 4, 32)) {
      val got = graft.operators.Packing.withRunningTotal(df, "id", "v", "cum", parts)
        .select("id", "cum").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"parts=$parts diverged")
    }
    // frames with extra carried columns: column pruning diverges the
    // offsets branch's plan from the cumsum branch's — bin assignment
    // must not depend on the two branches sharing one physical exchange
    val wide = df.withColumn("payload", concat_ws("-", col("id"), col("v")))
    val gotWide = graft.operators.Packing.withRunningTotal(wide, "id", "v", "cum", 8)
      .select("id", "cum").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotWide == expected, "wide frame diverged")
  }

  test("packByBudget equals the global-window reference packing") {
    // the factored q64/q168 shape: bin = floor(exclusive-cumsum/budget)
    // over the distributed prefix sum must equal the naive global
    // window formulation, bin-for-bin, on an adversarial count mix
    // (some rows larger than the whole budget)
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(13)
    val df = (1L to 400L).map(i => (i, rnd.nextInt(40).toLong + 1 +
        (if (i % 37 == 0) 100L else 0L)))
      .toDF("doc_id", "n_tokens")
    val w = Window.orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val expected = df
      .withColumn("cum", sum("n_tokens").over(w))
      .withColumn("bin", ((col("cum") - col("n_tokens")) / 64L).cast("long"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("total_tokens"),
        min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
      .orderBy("bin").collect().map(_.toSeq).toSeq
    val got = graft.operators.Packing.packByBudget(df, "doc_id", "n_tokens", 64L)
      .orderBy("bin").collect().map(_.toSeq).toSeq
    assert(got == expected, "packByBudget diverged from the window reference")
    assert(got.size > 100, s"fixture must span many bins, got ${got.size}")
  }

  test("saltedSum equals direct sum, including on a hot key") {
    // hot key: one key holds 90% of rows
    val df = (1 to 2000).map(i => (if (i <= 1800) 1L else i.toLong % 7, i.toLong))
      .toDF("k", "v")
    val direct = df.groupBy("k").agg(sum("v").as("sum"))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getLong(1)))
    val salted = Skew.saltedSum(df, Seq("k"), col("v"), buckets = 8)
      .orderBy("k").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(salted.toSeq == direct.toSeq)
  }

  test("saltedSum matches on real lineitem quantities") {
    val li = Tables.lineitem(spark, sf())
    val direct = li.groupBy("l_returnflag").agg(sum("l_quantity").as("sum"))
      .orderBy("l_returnflag").collect().map(r => (r.getString(0), r.getDouble(1)))
    val salted = Skew.saltedSum(li, Seq("l_returnflag"), col("l_quantity"), 16)
      .orderBy("l_returnflag").collect().map(r => (r.getString(0), r.getDouble(1)))
    // quantities are integer-valued doubles -> sums exact in any order
    assert(salted.toSeq == direct.toSeq)
  }

  test("approx sketch companion stays within tolerance of the q36 envelope") {
    val approx = graft.queries.AnalyticsQueries.approxStatsCompanion(spark, sf("sf0.01"))
      .collect().map(r => r.getString(0) -> r).toMap
    val exactP50 = Tables.lineitem(spark, sf("sf0.01"))
      .groupBy("l_returnflag")
      .agg(expr("percentile(l_extendedprice, 0.5)").as("p50"))
      .collect().map(r => r.getString(0) -> r.getAs[Double]("p50")).toMap
    val envelope = graft.queries.AnalyticsQueries.q36StatsEnvelope(spark, sf("sf0.01"))
      .collect().map(r => r.getString(0) -> r).toMap
    envelope.foreach { case (flag, e) =>
      val a = approx(flag)
      val nParts = e.getAs[Long]("n_parts")
      val relDistinct =
        math.abs(a.getAs[Long]("approx_parts").toDouble - nParts) / nParts.toDouble
      assert(relDistinct < 0.05, s"$flag HLL error $relDistinct")
      val relP50 = math.abs(a.getAs[Double]("ap50") - exactP50(flag)) / exactP50(flag)
      assert(relP50 < 0.05, s"$flag approx p50 error $relP50")
      val p99 = a.getAs[Double]("ap99")
      assert(p99 >= e.getAs[Double]("min_price") && p99 <= e.getAs[Double]("max_price"),
        s"$flag approx p99 $p99 escapes the exact [min,max] envelope")
    }
  }

  test("sessionize: gaps above threshold split sessions") {
    val sessions = graft.queries.EventsQueries.q18Sessionize(spark, sf())
    val byUser = sessions.groupBy("user_id")
      .agg(sum("n_events").as("n"), count(lit(1)).as("ns")).collect()
    // event counts are conserved across sessions
    val total = byUser.map(_.getAs[Long]("n")).sum
    assert(total == Tables.events(spark, sf()).count())
    // sessions are non-overlapping in time per user
    val rows = sessions.orderBy("user_id", "session_idx").collect()
    rows.sliding(2).foreach {
      case Array(a, b) if a.getLong(0) == b.getLong(0) =>
        assert(!a.getAs[java.sql.Timestamp]("end_ts")
          .after(b.getAs[java.sql.Timestamp]("start_ts")))
      case _ => ()
    }
  }

  test("saltedJoin returns exactly the plain join's rows") {
    val ev = Tables.events(spark, sf())
      .select($"event_type", $"event_id", $"user_id")
    val dim = ev.groupBy("event_type").agg(count(lit(1)).as("n"))
    val salted = Skew.saltedJoin(ev, dim, "event_type", buckets = 8)
      .select("event_type", "event_id", "n")
    val plain = ev.join(dim, Seq("event_type")).select("event_type", "event_id", "n")
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
    assert(salted.count() == plain.count())
  }

  test("funnel fold: strictly-after anchoring, same-instant events don't advance") {
    import java.sql.Timestamp
    def t(s: Int) = Timestamp.valueOf(f"2024-01-01 00:00:$s%02d")
    // u1 completes; u2's click is simultaneous with its view (no advance);
    // u3 clicks BEFORE its first view (wrong order, stalls at stage 1);
    // u4 has view->click but its purchase precedes the click.
    val rows = Seq(
      (1L, t(1), 1L, "view"), (1L, t(2), 2L, "click"), (1L, t(3), 3L, "purchase"),
      (2L, t(1), 4L, "view"), (2L, t(1), 5L, "click"), (2L, t(9), 6L, "purchase"),
      (3L, t(1), 7L, "click"), (3L, t(2), 8L, "view"),
      (4L, t(1), 9L, "view"), (4L, t(5), 10L, "click"), (4L, t(3), 11L, "purchase"))
    val df = rows.toDF("user_id", "ts", "event_id", "event_type")
    val staged = df.groupBy("user_id")
      .agg(sort_array(collect_list(struct($"ts", $"event_id", $"event_type"))).as("evs"))
      .select($"user_id",
        aggregate($"evs",
          struct(lit(0).as("stage"), lit(null).cast("timestamp").as("t")),
          (acc, e) => when(acc("stage") === 0 && e("event_type") === "view",
              struct(lit(1).as("stage"), e("ts").as("t")))
            .when(acc("stage") === 1 && e("event_type") === "click" && e("ts") > acc("t"),
              struct(lit(2).as("stage"), e("ts").as("t")))
            .when(acc("stage") === 2 && e("event_type") === "purchase" && e("ts") > acc("t"),
              struct(lit(3).as("stage"), e("ts").as("t")))
            .otherwise(struct(acc("stage").as("stage"), acc("t").as("t"))),
          acc => acc("stage")).as("stage"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(staged == Map(1L -> 3, 2L -> 1, 3L -> 1, 4L -> 2))
  }
}
