package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation helpers. A hot key saturates one reducer in a plain
  * groupBy; salting splits each key into `buckets` sub-keys for a
  * partial aggregate, then merges the partials — two small shuffles
  * instead of one skewed one. AQE's skew-join handling covers joins;
  * this covers aggregations, where AQE does not re-split.
  */
object Skew {

  /** Deterministic per-row salt: xxhash64 of ALL the row's columns,
    * bucketed. A function of the data, not of the scan order — the same
    * row routes to the same bucket on every run, retry, and speculative
    * copy, so partition contents are replayable (debuggable, dedupable
    * under speculation). Identical duplicate rows share a bucket, which
    * is harmless: skew comes from many DISTINCT rows under one hot key,
    * and those differ in some column. */
  private def stableSalt(df: DataFrame, buckets: Int): Column =
    pmod(xxhash64(df.columns.map(col).toIndexedSeq: _*), lit(buckets))

  /** Two-phase salted sum of `value` per `keys`. The salt only routes
    * rows to buckets — it cancels out in the merge. Exact for integral
    * types and the engine's scaled-long sums (merge order never matters
    * for longs). */
  def saltedSum(df: DataFrame, keys: Seq[String], value: Column,
                buckets: Int): DataFrame = {
    val salted = df
      .withColumn("_v", value)
      .withColumn("_salt", stableSalt(df, buckets))
    // stage 1: partial sums per (keys, salt) — spreads the hot key
    val partial = salted.groupBy((keys.map(col) :+ col("_salt")): _*)
      .agg(sum(col("_v")).as("_partial"))
    // stage 2: merge partials per key — at most `buckets` rows per key
    partial.groupBy(keys.map(col): _*).agg(sum(col("_partial")).as("sum"))
  }

  /** Salted equi-join for skewed keys when NEITHER side broadcasts: the
    * probe side gets a per-row salt in [0, buckets), the build side is
    * replicated once per salt value, and the join key becomes
    * (key, salt) — a hot key's rows spread over `buckets` reducers
    * instead of melting one. Replication multiplies only the SMALLER
    * side (x buckets), the classic trade at 100 TB where AQE's runtime
    * skew split can't see the join (e.g. inside streaming micro-batches
    * or under a required child distribution). Exact: salts partition
    * the probe rows, and every probe row still meets every build row of
    * its key exactly once. */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
                 buckets: Int): DataFrame = {
    val salted = probe.withColumn("_salt", stableSalt(probe, buckets))
    val replicated = build.withColumn("_salt",
      explode(array((0 until buckets).map(lit): _*)))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }
}
