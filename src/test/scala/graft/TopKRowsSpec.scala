package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Sampling
import graft.sources.Tables

/** [[graft.functions.TopKRows]] is the bounded-heap engine under
  * [[Sampling.weightedTopK]]. These tests pin it to the declarative
  * implementation it replaced — `row_number <= k` over a per-stratum
  * sort of the same A-Res key — on real data across a forced
  * multi-partition layout (so partial heaps, serde, and merge all
  * execute), and prove malformed (null-ranked) input is skipped rather
  * than NPE-ing inside the heap comparator.
  */
class TopKRowsSpec extends SparkSpec {

  /** The window reference implementation: identical selection whenever
    * (priority, key) pairs are distinct, which md5-derived priorities
    * guarantee in practice. */
  private def windowForm(df: DataFrame, stratum: Column, key: Column,
                         weight: Column, k: Int): DataFrame = {
    val rk = pow(Sampling.hashUniform(key), lit(1.0) / weight.cast("double"))
    val w = Window.partitionBy(stratum).orderBy(rk.desc, key)
    df.withColumn("ares_rn", row_number().over(w))
      .filter(col("ares_rn") <= k).drop("ares_rn")
  }

  test("heap top-k equals the window form, including strata smaller than k") {
    val docs = Tables.documents(spark, sf("sf0.01"))
      .select(col("doc_id"), col("text"))
      .withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
      // 8 strata, one deliberately tinier than k so eval() sees a
      // partially-filled heap
      .withColumn("shard",
        when(pmod(col("doc_id"), lit(97)) === 0, lit(99L))
          .otherwise(pmod(col("doc_id"), lit(7)).cast("long")))
      .drop("text")
      .repartition(13) // many map-side partial heaps -> serde + merge
    def pick(d: DataFrame): Set[Seq[Any]] =
      d.select("shard", "doc_id", "n_tokens").collect().map(_.toSeq).toSet
    val got = pick(Sampling.weightedTopK(
      docs, col("shard"), col("doc_id"), col("n_tokens"), 16))
    val want = pick(windowForm(
      docs, col("shard"), col("doc_id"), col("n_tokens"), 16))
    assert(got.nonEmpty && got == want)
    // the tiny stratum survives whole
    assert(got.count(_.head == 99L) ==
      docs.filter(col("shard") === 99).count())
  }

  test("rows with null priority or tiebreak are skipped, not NPE") {
    import spark.implicits._
    val df = Seq(
      (Option(1L), Option(10.0), "x"),
      (Option.empty[Long], Option(5.0), "x"),  // null key -> null tiebreak
      (Option(3L), Option.empty[Double], "x"), // null weight -> null priority
      (Option(4L), Option(2.0), "x"),
      (Option(5L), Option(8.0), "x"))
      .toDF("id", "wt", "grp")
    val got = Sampling.weightedTopK(df, col("grp"), col("id"), col("wt"), 2)
      .select("id").collect().map(_.getLong(0)).toSet
    val want = windowForm(
        df.filter(col("id").isNotNull && col("wt").isNotNull),
        col("grp"), col("id"), col("wt"), 2)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == want && got.size == 2 && got.subsetOf(Set(1L, 4L, 5L)))
  }
}
