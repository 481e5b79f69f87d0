package graft

import org.apache.spark.sql.functions._
import graft.functions.{Histogram, HistogramAgg}
import graft.functions.Histogram.{histMerge, histSketch, histTotal, quantileDisc}
import graft.sources.Tables

/** Histogram-quantile properties beyond the SQL oracle: partial/merge
  * equivalence, serde round-trip, the out-of-range fail-fast contract,
  * and quantileDisc against an independent sorted-data reference.
  */
class HistogramSpec extends SparkSpec {

  private val Buckets = 64

  test("histogram of the whole equals the sum-merge of per-part histograms") {
    val li = Tables.lineitem(spark, sf())
      .select(col("l_orderkey"), col("l_quantity").cast("long").as("q"))
      .repartition(8) // force multi-partition partials + merge path
    val whole = li.agg(histSketch(col("q"), Buckets).as("h"))
      .head.getSeq[Long](0)
    val merged = li.withColumn("part", pmod(col("l_orderkey"), lit(7)))
      .groupBy("part").agg(histSketch(col("q"), Buckets).as("h"))
      .agg(histMerge(col("h"), Buckets).as("h"))
      .head.getSeq[Long](0)
    assert(whole == merged)
  }

  test("quantileDisc matches the smallest-value-at-fraction rule on sorted data") {
    val li = Tables.lineitem(spark, sf())
      .select(col("l_returnflag"), col("l_quantity").cast("long").as("q"))
    val got = li.groupBy("l_returnflag")
      .agg(quantileDisc(histSketch(col("q"), Buckets), 50).as("p50"),
        quantileDisc(histSketch(col("q"), Buckets), 99).as("p99"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val byFlag = li.collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    def disc(xs: Seq[Long], pct: Int): Long =
      xs(((xs.length * pct + 99) / 100 - 1).max(0)) // smallest idx with 100*(i+1) >= pct*n
    val want = byFlag.map { case (f, xs) => (f, disc(xs, 50), disc(xs, 99)) }.toSet
    assert(got == want)
  }

  test("serialize/deserialize round-trips counts exactly") {
    val agg = HistogramAgg(org.apache.spark.sql.graft.bridge.expression(lit(0)), buckets = 10)
    val buf = agg.createAggregationBuffer()
    buf(0) = Long.MaxValue; buf(3) = 42L; buf(9) = 1L
    assert(agg.deserialize(agg.serialize(buf)).toSeq == buf.toSeq)
  }

  test("value outside [0, buckets) fails fast instead of silently clamping") {
    val e = intercept[Exception] {
      Tables.lineitem(spark, sf())
        .select(col("l_quantity").cast("long").as("q"))
        .agg(histSketch(col("q"), 8)).collect()
    }
    def mentions(t: Throwable): Boolean =
      t != null && (Option(t.getMessage).exists(_.contains("outside")) || mentions(t.getCause))
    assert(mentions(e))
  }

  test("nulls are ignored and empty histograms yield null quantiles") {
    import spark.implicits._
    val df = Seq[Option[Long]](None, None).toDF("q")
    val r = df.agg(quantileDisc(histSketch(col("q"), 8), 50).as("p"),
      histTotal(histSketch(col("q"), 8)).as("n")).head
    assert(r.isNullAt(0) && r.getLong(1) == 0L)
  }
}
