package graft

import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Funnel
import graft.sources.Tables

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  /** The previous q84 form — per-user sorted collect_list + HOF fold —
    * kept here as the semantic reference the streaming walk must match. */
  private def bufferedStages(events: DataFrame): DataFrame =
    events.groupBy("user_id")
      .agg(sort_array(collect_list(
        struct(col("ts"), col("event_id"), col("event_type")))).as("evs"))
      .select(col("user_id"),
        aggregate(col("evs"),
          struct(lit(0).as("stage"), lit(null).cast("timestamp").as("t")),
          (acc, e) => {
            val stage = acc("stage"); val t = acc("t")
            val ts = e("ts"); val ty = e("event_type")
            when(stage === 0 && ty === "view",
                struct(lit(1).as("stage"), ts.as("t")))
              .when(stage === 1 && ty === "click" && ts > t,
                struct(lit(2).as("stage"), ts.as("t")))
              .when(stage === 2 && ty === "purchase" && ts > t,
                struct(lit(3).as("stage"), ts.as("t")))
              .otherwise(struct(stage.as("stage"), t.as("t")))
          },
          acc => acc("stage")).as("stage"))

  test("streaming walk equals the buffered fold on real events") {
    val ev = Tables.events(spark, sf())
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
    val got = Funnel.stages(ev, Seq("view", "click", "purchase"))
      .orderBy("user_id").collect().map(r => (r.getLong(0), r.getInt(1)))
    val want = bufferedStages(ev)
      .orderBy("user_id").collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(got.nonEmpty && got.toSeq == want.toSeq)
  }

  test("hot key with 150k events streams through and anchors correctly") {
    def t(i: Long) = new Timestamp(1700000000000L + i * 1000)
    // user 1: 150k-event hot key; the funnel completes only at the very
    // end (purchase strictly after the last anchor's click)
    val hot = (0L until 150000L).map { i =>
      val ty = (i % 3) match {
        case 0 => "view"; case 1 => "click"; case 2 => "purchase"
      }
      (1L, t(i), i, ty)
    }
    // user 2: completes nothing past stage 1 (clicks all BEFORE the view)
    val u2 = Seq((2L, t(200000), 200000L, "click"),
      (2L, t(200001), 200001L, "click"),
      (2L, t(200002), 200002L, "view"))
    // user 3: view and click share a timestamp -> strict-after blocks
    val u3 = Seq((3L, t(300000), 300000L, "view"),
      (3L, t(300000), 300001L, "click"))
    // user 4: full funnel across distinct times
    val u4 = Seq((4L, t(400000), 400000L, "view"),
      (4L, t(400001), 400001L, "click"),
      (4L, t(400002), 400002L, "purchase"))
    val ev = (hot ++ u2 ++ u3 ++ u4)
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = Funnel.stages(ev, Seq("view", "click", "purchase"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(got == Map(1L -> 3, 2L -> 1, 3L -> 1, 4L -> 3))
    // sanity vs the buffered reference on the small users (the hot key
    // is exactly what the buffered form should not be asked to hold)
    val small = ev.filter(col("user_id") > 1L)
    val want = bufferedStages(small)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(want == Map(2L -> 1, 3L -> 1, 4L -> 3))
  }

  test("user whose events span partitions of the sort is still one group") {
    // groups are defined by the repartition on user_id, not by input
    // partitioning: scatter one user's rows across many input splits
    val ev = spark.range(0, 10000, 1, 32)
      .select(lit(7L).as("user_id"),
        expr("timestamp_micros(1700000000000000 + id * 1000000)").as("ts"),
        col("id").as("event_id"),
        element_at(array(lit("view"), lit("click"), lit("purchase")),
          (col("id") % 3 + 1).cast("int")).as("event_type"))
    val got = Funnel.stages(ev, Seq("view", "click", "purchase")).collect()
    assert(got.length == 1 && got.head.getInt(1) == 3)
  }
}
