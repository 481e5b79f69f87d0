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

  /** Two-phase salted sum of `value` per `keys`. The salt only routes
    * rows to buckets — it cancels out in the merge — so a per-row
    * monotonic id is a fine source even though it is not stable across
    * reruns. Exact for integral types and the engine's scaled-long
    * sums (merge order never matters for longs). */
  def saltedSum(df: DataFrame, keys: Seq[String], value: Column,
                buckets: Int): DataFrame = {
    val salted = df
      .withColumn("_v", value)
      .withColumn("_salt", pmod(hash(monotonically_increasing_id()), lit(buckets)))
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
    val salted = probe.withColumn("_salt",
      pmod(hash(monotonically_increasing_id()), lit(buckets)))
    val replicated = build.withColumn("_salt",
      explode(array((0 until buckets).map(lit): _*)))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }
}
