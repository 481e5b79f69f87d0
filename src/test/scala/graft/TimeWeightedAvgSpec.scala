package graft

import org.apache.spark.sql.functions._
import graft.queries.EventsQueries
import graft.sources.Tables

/** q156 time-weighted average: the integral must be EXACT in Long
  * arithmetic. These specs pin (a) value equality against a BigInt
  * reference fold, so any silent Long overflow in Σ vm·Δt would
  * surface as a mismatch; (b) the millis-vs-micros bound the
  * implementation comment claims — on real data the micros integral
  * bound escapes Long while the millis bound stays well inside it;
  * (c) the plan shape: one event_type exchange serves both the lead
  * window and the rollup (the q145 subset rule).
  */
class TimeWeightedAvgSpec extends SparkSpec {

  private def referenceTwa(dir: String): Map[String, (Long, Long, Long)] = {
    val rows = Tables.events(spark, dir)
      .select(col("event_type"), expr("unix_micros(ts)").as("us"),
        round(col("value") * 1e6).cast("long").as("vm"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    rows.groupBy(_._1).map { case (et, g) =>
      val sorted = g.map { case (_, us, vm) => (us, vm) }.sortBy(x => (x._1, x._2))
      val intervals = sorted.zip(sorted.tail).map { case ((us, vm), (nus, _)) =>
        val dtMs = (nus - us) / 1000L
        (dtMs, BigInt(vm) * BigInt(dtMs))
      }
      val span = intervals.map(_._1).sum
      val integral = intervals.map(_._2).sum
      // the reference integral is BigInt: if the engine's Long math
      // overflowed anywhere, twa_micro below would diverge
      et -> (intervals.size.toLong, span, (integral / span).toLong)
    }
  }

  test("q156 equals a BigInt reference fold (no silent overflow)") {
    val want = referenceTwa(sf())
    val got = EventsQueries.q156TimeWeightedAvg(spark, sf())
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got == want)
  }

  test("millis integral is Long-safe where the micros integral is not") {
    // the documented bound: per type, |integral| <= max|vm| * span.
    // Millis keeps that product inside Long at ANY scale factor (span
    // is data-range-bounded, not row-count-bounded); the same bound in
    // micros is 1000x larger and escapes Long on this very dataset.
    val bounds = Tables.events(spark, sf("sf0.01"))
      .select(col("event_type"), expr("unix_micros(ts)").as("us"),
        abs(round(col("value") * 1e6).cast("long")).as("avm"))
      .groupBy("event_type")
      .agg(max("avm").as("vmax"),
        (max("us") - min("us")).as("span_us"))
      .collect()
    assert(bounds.nonEmpty)
    bounds.foreach { r =>
      val vmax = BigInt(r.getLong(1))
      val spanUs = BigInt(r.getLong(2))
      val milliBound = vmax * (spanUs / 1000)
      val microBound = vmax * spanUs
      assert(milliBound < BigInt(Long.MaxValue) / 4,
        s"${r.getString(0)}: millis bound $milliBound too close to Long.Max")
      assert(microBound > BigInt(Long.MaxValue),
        s"${r.getString(0)}: micros bound $microBound unexpectedly Long-safe — " +
          "the millis justification no longer demonstrates on this data")
    }
  }

  test("q156 plans exactly one hash exchange (window + rollup share it)") {
    val plan = EventsQueries.q156TimeWeightedAvg(spark, sf())
      .queryExecution.executedPlan.toString
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(hashExchanges == 1,
      s"expected the event_type exchange only, found $hashExchanges:\n$plan")
  }
}
