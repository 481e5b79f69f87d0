package graft

import org.apache.spark.sql.functions._
import graft.functions.ZOrder2
import graft.functions.ZOrder2.zorder2

/** Z-order key properties: interleave math vs an independent bit-walk,
  * codegen/interpreted agreement via the Column API, range-partitioned
  * file disjointness (what makes per-file stats prune), and the
  * out-of-range fail-fast contract. */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  private def reference(a: Long, b: Long): Long = {
    var z = 0L
    for (i <- 0 until 31) {
      z |= ((a >> i) & 1L) << (2 * i)
      z |= ((b >> i) & 1L) << (2 * i + 1)
    }
    z
  }

  test("interleave matches a bit-by-bit reference, exhaustive small + random large") {
    for (a <- 0L to 63L; b <- 0L to 63L)
      assert(ZOrder2.interleave(a, b) == reference(a, b), s"($a,$b)")
    val rng = new scala.util.Random(3)
    for (_ <- 1 to 1000) {
      val a = rng.nextLong(1L << 31); val b = rng.nextLong(1L << 31)
      assert(ZOrder2.interleave(a, b) == reference(a, b), s"($a,$b)")
    }
    // extremes
    val max = (1L << 31) - 1
    assert(ZOrder2.interleave(max, max) == reference(max, max))
    assert(ZOrder2.interleave(0L, 0L) == 0L)
  }

  test("Column API (codegen path) agrees with the Scala evaluator") {
    val rng = new scala.util.Random(5)
    val pairs = Seq.fill(500)((rng.nextLong(1L << 31), rng.nextLong(1L << 31)))
    val got = pairs.toDF("a", "b")
      .select(zorder2(col("a"), col("b")).as("z")).collect().map(_.getLong(0))
    assert(got.toSeq == pairs.map { case (a, b) => ZOrder2.interleave(a, b) })
  }

  test("repartitionByRange on z gives pairwise-disjoint per-file ranges") {
    val rng = new scala.util.Random(9)
    val df = Seq.fill(5000)((rng.nextLong(1000L), rng.nextLong(365L)))
      .toDF("uid", "day")
      .select(zorder2(col("uid"), col("day")).as("z"))
      .repartitionByRange(8, col("z"))
      .sortWithinPartitions("z")
    val ranges = df
      .select(spark_partition_id().as("p"), col("z"))
      .groupBy("p").agg(min("z").as("lo"), max("z").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(ranges.length > 1)
    ranges.sliding(2).foreach { case Array((_, hi1), (lo2, _)) =>
      assert(hi1 <= lo2, s"overlapping file ranges: hi=$hi1 lo=$lo2")
    }
  }

  test("out-of-range inputs fail fast") {
    intercept[IllegalArgumentException](ZOrder2.interleave(-1L, 0L))
    intercept[IllegalArgumentException](ZOrder2.interleave(0L, 1L << 31))
    val e = intercept[Exception] {
      Seq((-5L, 2L)).toDF("a", "b")
        .select(zorder2(col("a"), col("b"))).collect()
    }
    def mentions(t: Throwable): Boolean =
      t != null && (Option(t.getMessage).exists(_.contains("zorder2")) || mentions(t.getCause))
    assert(mentions(e))
  }
}
