package graft

import org.apache.spark.sql.functions._
import graft.functions.BitmapDistinct
import graft.functions.BitmapDistinct.{bitmapSketch, bitmapMerge}
import graft.functions.BitmapAgg
import graft.sources.Tables

/** Bitmap exact-distinct sketch properties the SQL oracle can't cover:
  * partial/merge equivalence across partitions, serde round-trip, the
  * out-of-range fail-fast contract, and cardinality == COUNT(DISTINCT).
  */
class BitmapDistinctSpec extends SparkSpec {

  private val MaxId = 1 << 14

  test("sketch of the whole equals the OR-merge of per-part sketches, bit for bit") {
    val ev = Tables.events(spark, sf())
      .select(col("event_id"), col("user_id"))
      .repartition(8) // force multi-partition partials + merge path
    val whole = ev.agg(bitmapSketch(col("user_id"), MaxId).as("sk"))
      .head.getSeq[Long](0)
    val merged = ev.withColumn("part", pmod(col("event_id"), lit(7)))
      .groupBy("part").agg(bitmapSketch(col("user_id"), MaxId).as("sk"))
      .agg(bitmapMerge(col("sk"), MaxId).as("sk"))
      .head.getSeq[Long](0)
    assert(whole == merged)
  }

  test("cardinality over the sketch equals countDistinct") {
    val ev = Tables.events(spark, sf()).select(col("event_type"), col("user_id"))
    val got = ev.groupBy("event_type")
      .agg(BitmapDistinct.cardinality(bitmapSketch(col("user_id"), MaxId)).as("n"))
      .orderBy("event_type").collect().map(r => (r.getString(0), r.getLong(1)))
    val want = ev.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n"))
      .orderBy("event_type").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.sameElements(want))
  }

  test("serialize/deserialize round-trips the buffer exactly") {
    val agg = BitmapAgg(org.apache.spark.sql.graft.bridge.expression(lit(0)), maxId = 200)
    val buf = agg.createAggregationBuffer()
    buf(0) = 0x8000000000000001L; buf(1) = -1L; buf(3) = 42L
    val back = agg.deserialize(agg.serialize(buf))
    assert(back.toSeq == buf.toSeq)
    assert(buf.length == (200 + 63) / 64)
  }

  test("id outside [0, maxId) fails fast instead of silently undercounting") {
    val small = 8 // sf0.001 user_ids span [0, 14] — ids 8..14 are out of range
    val ev = Tables.events(spark, sf()).select(col("user_id"))
    val e = intercept[Exception] {
      ev.agg(bitmapSketch(col("user_id"), small)).collect()
    }
    def mentions(t: Throwable): Boolean =
      t != null && (Option(t.getMessage).exists(_.contains("outside")) || mentions(t.getCause))
    assert(mentions(e))
  }

  test("nulls are ignored, not counted and not failing") {
    val ev = Tables.events(spark, sf())
      .select(when(col("user_id") % 3 === 0, col("user_id")).as("uid"))
    val got = ev.agg(BitmapDistinct.cardinality(bitmapSketch(col("uid"), MaxId)).as("n"))
      .head.getLong(0)
    val want = ev.agg(countDistinct(col("uid")).as("n")).head.getLong(0)
    assert(got == want)
  }
}
