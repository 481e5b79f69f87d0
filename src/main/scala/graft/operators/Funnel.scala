package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Ordered-event funnel walk: the furthest stage each user reached
  * stepping through `steps`, each step STRICTLY after the anchor of the
  * previous one (earliest-progression semantics — the first step-0
  * event anchors the funnel, the first later step-1 event advances it,
  * and so on).
  *
  * Scale shape: the same streaming ordered fold as [[CostBasis.fold]] —
  * one shuffle on user_id, then `sortWithinPartitions` + `mapPartitions`
  * walking secondary-sorted rows with O(1) state per in-flight user
  * (an int stage + a long anchor). Memory is independent of any single
  * user's event count: a hot key with 10⁸ events streams through,
  * where a per-user `collect_list` buffer (the previous q84 form, kept
  * as the reference in FunnelSpec) would hold the whole history in one
  * aggregation buffer.
  */
object Funnel {

  private val outSchema = StructType(Seq(
    StructField("user_id", LongType),
    StructField("stage", IntegerType)))

  /** One (user_id, stage) row per user. `events` needs columns
    * (user_id, ts, event_id, event_type); ties within a user resolve in
    * (ts, event_id) order — the same total order the fold has always
    * used, and step advancement requires ts strictly after the anchor,
    * so equal-timestamp events never advance past each other. */
  def stages(events: DataFrame, steps: Seq[String]): DataFrame = {
    val n = steps.length
    val stepIdx = steps.zipWithIndex.toMap
    val sorted = events
      .select(col("user_id").cast(LongType),
        unix_micros(col("ts")).as("us"),
        col("event_id").cast(LongType),
        col("event_type").cast(StringType))
      .repartition(col("user_id"))
      .sortWithinPartitions("user_id", "us", "event_id")
    sorted.mapPartitions { iter =>
      new Iterator[Row] {
        private var lookahead: Option[Row] =
          if (iter.hasNext) Some(iter.next()) else None
        override def hasNext: Boolean = lookahead.isDefined
        override def next(): Row = {
          val user = lookahead.get.getLong(0)
          var stage = 0
          var anchorUs = Long.MinValue
          var cur = lookahead
          while (cur.isDefined && cur.get.getLong(0) == user) {
            val r = cur.get
            if (stage < n && stepIdx.get(r.getString(3)).contains(stage)) {
              val us = r.getLong(1)
              if (stage == 0 || us > anchorUs) { stage += 1; anchorUs = us }
            }
            cur = if (iter.hasNext) Some(iter.next()) else None
          }
          lookahead = cur
          Row(user, stage)
        }
      }
    }(Encoders.row(outSchema))
  }
}
