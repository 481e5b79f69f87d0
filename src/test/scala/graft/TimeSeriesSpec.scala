package graft

import org.apache.spark.sql.functions._
import graft.operators.TimeSeries

/** Window-operator semantics, including the pandas
  * interpolate(limit_direction="both") golden pattern from FIXTURES.md:
  * interior gaps linear by position, leading nulls backfilled, trailing
  * nulls forward-filled.
  */
class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  test("interpolateBoth: interior linear, leading bfill, trailing ffill") {
    // A: interior 2-gap + trailing null; B: leading nulls
    val df = Seq(
      ("A", 1, Some(10.0)), ("A", 2, None), ("A", 3, None), ("A", 4, Some(40.0)), ("A", 5, None),
      ("B", 1, None), ("B", 2, None), ("B", 3, Some(3.0)), ("B", 4, Some(5.0)), ("B", 5, Some(7.0)))
      .toDF("k", "pos", "v")
    val out = TimeSeries.interpolateBoth(df, Seq("k"), "pos", "v", "vi")
      .orderBy("k", "pos").select("k", "pos", "vi").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getDouble(2)))
    assert(out.toSeq == Seq(
      ("A", 1, 10.0), ("A", 2, 20.0), ("A", 3, 30.0), ("A", 4, 40.0), ("A", 5, 40.0),
      ("B", 1, 3.0), ("B", 2, 3.0), ("B", 3, 3.0), ("B", 4, 5.0), ("B", 5, 7.0)))
  }

  test("ffill carries last non-null; bfill carries next non-null") {
    val df = Seq(("A", 1, Some(1.0)), ("A", 2, None), ("A", 3, Some(3.0)))
      .toDF("k", "pos", "v")
    val out = df
      .withColumn("f", TimeSeries.ffill(col("v"), Seq(col("k")), Seq(col("pos"))))
      .withColumn("b", TimeSeries.bfill(col("v"), Seq(col("k")), Seq(col("pos"))))
      .orderBy("pos").collect()
    assert(out.map(_.getDouble(3)).toSeq == Seq(1.0, 1.0, 3.0))
    assert(out.map(_.getDouble(4)).toSeq == Seq(1.0, 3.0, 3.0))
  }

  test("cumsum and pctChange") {
    val df = Seq(("A", 1, 100.0), ("A", 2, 110.0), ("A", 3, 99.0)).toDF("k", "pos", "v")
    val out = df
      .withColumn("cs", TimeSeries.cumsum(col("v"), Seq(col("k")), Seq(col("pos"))))
      .withColumn("pc", TimeSeries.pctChange(col("v"), Seq(col("k")), Seq(col("pos"))))
      .orderBy("pos").collect()
    assert(out.map(_.getDouble(3)).toSeq == Seq(100.0, 210.0, 309.0))
    val pc = out.map(_.getDouble(4))
    assert(pc(0) == 0.0 && math.abs(pc(1) - 0.1) < 1e-12 && math.abs(pc(2) + 0.1) < 1e-12)
  }

  test("cumprodOnePlus reproduces a product series") {
    val df = Seq(("A", 1, 0.10), ("A", 2, -0.20), ("A", 3, 0.05)).toDF("k", "pos", "r")
    val out = df.withColumn("cp",
        TimeSeries.cumprodOnePlus(col("r"), Seq(col("k")), Seq(col("pos"))))
      .orderBy("pos").collect().map(_.getDouble(3))
    val expect = Seq(1.1, 1.1 * 0.8, 1.1 * 0.8 * 1.05)
    out.zip(expect).foreach { case (a, e) => assert(math.abs(a - e) < 1e-12) }
  }

  test("rebase100 normalizes the first element to 100") {
    val df = Seq(("A", 1, 50.0), ("A", 2, 60.0), ("A", 3, 45.0)).toDF("k", "pos", "v")
    val out = df.withColumn("ix",
        TimeSeries.rebase100(col("v"), Seq(col("k")), Seq(col("pos"))))
      .orderBy("pos").collect().map(_.getDouble(3))
    assert(out.toSeq == Seq(100.0, 120.0, 90.0))
  }
}
