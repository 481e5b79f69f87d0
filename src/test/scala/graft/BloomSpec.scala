package graft

import org.apache.spark.sql.functions._
import graft.functions.Bloom
import graft.sources.Tables

/** Bloom build/probe properties the SQL oracle can't see: the
  * no-false-negative contract, a bounded false-positive rate, layout
  * independence of the built filter, and equivalence of the
  * prefiltered join with the plain join.
  */
class BloomSpec extends SparkSpec {

  private val NumBits = 1 << 16
  private val K = 3

  test("no false negatives: every inserted key passes mightContain") {
    import spark.implicits._
    val keys = spark.range(0, 5000).select((col("id") * 7 + 13).as("k"))
    val bf = keys.agg(Bloom.sketch(col("k"), NumBits, K).as("bf"))
    val missed = keys.crossJoin(broadcast(bf))
      .filter(!Bloom.mightContain(col("bf"), col("k"), NumBits, K))
      .count()
    assert(missed == 0L)
  }

  test("false-positive rate on disjoint keys stays near theory") {
    val n = 4000
    val inserted = spark.range(0, n).select(col("id").as("k"))
    val bf = inserted.agg(Bloom.sketch(col("k"), NumBits, K).as("bf"))
    val probes = spark.range(1000000, 1000000 + 20000).select(col("id").as("k"))
    val fp = probes.crossJoin(broadcast(bf))
      .filter(Bloom.mightContain(col("bf"), col("k"), NumBits, K))
      .count()
    // theory: (1 - e^(-kn/m))^k ≈ 0.0036 at k=3, n=4000, m=65536.
    // Allow 3x slack for hash clustering; the contract is "small", not exact.
    val rate = fp.toDouble / 20000
    assert(rate < 0.011, s"false-positive rate $rate too high")
  }

  test("built filter is independent of partitioning and row order") {
    val keys = Tables.orders(spark, sf()).select(col("o_orderkey").as("k"))
    val a = keys.repartition(8).agg(Bloom.sketch(col("k"), NumBits, K))
      .head.getSeq[Long](0)
    val b = keys.orderBy(col("k").desc).coalesce(1)
      .agg(Bloom.sketch(col("k"), NumBits, K)).head.getSeq[Long](0)
    assert(a == b)
  }

  test("bloom-prefiltered join returns exactly the plain join's rows") {
    val sel = Tables.orders(spark, sf())
      .filter(col("o_orderpriority") === "1-URGENT")
      .select("o_orderkey")
    val li = Tables.lineitem(spark, sf()).select("l_orderkey", "l_linenumber")
    val bf = sel.agg(Bloom.sketch(col("o_orderkey"), NumBits, K).as("bf"))
    val pre = li.crossJoin(broadcast(bf))
      .filter(Bloom.mightContain(col("bf"), col("l_orderkey"), NumBits, K))
      .drop("bf")
      .join(sel.hint("merge"), col("l_orderkey") === col("o_orderkey"))
    val plain = li.join(sel, col("l_orderkey") === col("o_orderkey"))
    assert(pre.exceptAll(plain).isEmpty && plain.exceptAll(pre).isEmpty)
  }
}
