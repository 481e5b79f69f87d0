package graft

import org.apache.spark.sql.functions._
import graft.functions.CountMin._
import graft.sources.Tables

/** Count-min sketch properties that no SQL oracle can express: exact
  * mergeability (pre-aggregated sketches union losslessly) and the
  * one-sided bounded error on high-cardinality input.
  */
class CountMinSpec extends SparkSpec {

  private val D = 4
  private val W = 512

  test("sketch of the whole equals the merge of per-part sketches, bit for bit") {
    val ev = Tables.events(spark, sf()).select(col("event_id"), col("event_type"))
    val whole = ev.agg(countMinSketch(col("event_type"), D, W).as("sk"))
      .head.getSeq[Long](0)
    val merged = ev.withColumn("part", pmod(col("event_id"), lit(7)))
      .groupBy("part").agg(countMinSketch(col("event_type"), D, W).as("sk"))
      .agg(countMinMerge(col("sk"), D, W).as("sk"))
      .head.getSeq[Long](0)
    assert(whole == merged)
    assert(whole.sum == ev.count() * D) // every row lands in every sketch row
  }

  test("high-cardinality estimates never under-count and over-count within bound") {
    // user_id has hundreds of distinct values vs 512 buckets: genuinely
    // lossy, the regime q57's exact-match oracle cannot cover
    val ev = Tables.events(spark, sf())
      .select(col("user_id").cast("string").as("k"))
    val n = ev.count()
    val sketch = ev.agg(countMinSketch(col("k"), D, W).as("sk"))
    val rows = ev.groupBy("k").agg(count(lit(1)).as("true_n"))
      .crossJoin(broadcast(sketch))
      .select(col("k"), col("true_n"), estimate(col("sk"), col("k"), D, W).as("est"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (t, e) = (r.getLong(1), r.getLong(2))
      assert(e >= t, s"under-count for ${r.getString(0)}: est $e < true $t")
      // standard CMS bound is e/width * N per row; min over 4 rows sits
      // far below it — allow the full single-row bound as the ceiling
      assert(e - t <= math.ceil(math.E / W * n).toLong,
        s"over-count ${e - t} beyond bound for ${r.getString(0)}")
    }
  }
}
