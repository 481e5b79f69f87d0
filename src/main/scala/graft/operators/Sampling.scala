package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines. Spark's
  * `sample`/`sampleBy` draw from per-partition RNG streams, so results
  * change under repartitioning and cannot be reproduced by another
  * engine; these operators derive the coin flip from a hash of a stable
  * key instead — the same row set on every run, every layout, and in
  * the DuckDB oracle. This is how large corpus pipelines keep
  * train/eval splits stable across reprocessing.
  */
object Sampling {

  /** Uniform [0,1) from a key: the first 60 bits of md5(key) scaled.
    * Exactly reproducible in DuckDB
    * (`('0x' || substr(md5(k),1,15))::BIGINT / 2^60`). */
  def hashUniform(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 15), 16, 10).cast("long")
      .cast("double") / (1L << 60).toDouble

  /** Keep each row with probability `rates(stratum)` (or `defaultRate`
    * for unlisted strata), decided by the key hash — per-stratum
    * down/up-weighting of a training mixture. Pure filter: no shuffle,
    * pushes down to the scan where the stratum is a stored column. */
  def stratifiedSample(df: DataFrame, stratum: Column, key: Column,
                       rates: Map[String, Double], defaultRate: Double): DataFrame = {
    val rate = rates.toSeq.sortBy(_._1).foldRight(lit(defaultRate): Column) {
      case ((s, r), rest) => when(stratum === s, lit(r)).otherwise(rest)
    }
    df.filter(hashUniform(key) < rate)
  }

  /** Deterministic weighted reservoir: the k rows per stratum with the
    * largest A-Res keys `u^(1/w)` (Efraimidis-Spirakis), where `u` is
    * the md5 coin of the row key — inclusion probability proportional
    * to `weight`, yet the selected set is a pure function of the data:
    * stable under repartitioning, reprocessing, and replicable by any
    * engine with md5 + pow. This is how a training mixture upweights
    * high-quality documents without losing run-to-run reproducibility.
    *
    * The per-stratum top-k runs as [[graft.functions.TopKRows]], a
    * bounded-heap `TypedImperativeAggregate`: each map task keeps at
    * most k rows per stratum in an O(k) heap, ships those k to the
    * exchange, and merge unions heaps — the distributed-reservoir
    * merge as a first-class aggregate. Against the declarative
    * alternative (`row_number <= k` over a window), the heap never
    * sorts a stratum and its state is O(k) however hot the stratum is;
    * the window form needs a full per-stratum sort even with
    * WindowGroupLimit trimming what crosses the exchange. Rare A-Res
    * key ties (identical priority doubles) resolve on the row key's
    * STRING form, binary UTF8 order. */
  def weightedTopK(df: DataFrame, stratum: Column, key: Column,
                   weight: Column, k: Int): DataFrame = {
    val rk = pow(hashUniform(key), lit(1.0) / weight.cast("double"))
    val entry = struct(rk.as("_pri"), key.cast("string").as("_tb"),
      struct(df.columns.map(col).toIndexedSeq: _*).as("_row"))
    df.groupBy(stratum.as("_stratum"))
      .agg(graft.functions.TopKRows.topKRows(entry, k).as("_top"))
      .select(explode(col("_top")).as("_e"))
      .select(col("_e._row.*"))
  }

  /** Deterministic train/eval split: rows hash below `evalFraction` go
    * to eval. Returns (train, eval). Membership is a property of the
    * KEY, so it survives reprocessing and dataset unions. */
  def trainEvalSplit(df: DataFrame, key: Column,
                     evalFraction: Double): (DataFrame, DataFrame) = {
    val u = hashUniform(key)
    (df.filter(u >= evalFraction), df.filter(u < evalFraction))
  }
}
