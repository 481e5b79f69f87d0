package graft

import graft.sources.Tables

/** S4 timestamp normalization is schema-adaptive AND guarded: any
  * physical layout the lake throws at us (int64 nanos, parquet
  * timestamp[us]) lands on the same microsecond TIMESTAMP, and a unit
  * mix-up (the round-10 silent ~1000× collapse) fails loudly instead
  * of feeding an interval join garbage. */
class TsGuardSpec extends SparkSpec {
  import spark.implicits._

  private def firstTs(df: org.apache.spark.sql.DataFrame): String =
    Tables.normalizeTs(df).collect().head.getTimestamp(0).toInstant.toString

  test("int64 nanos normalize to micros timestamps") {
    val df = Seq(1704067200000000000L).toDF("ts") // 2024-01-01T00:00Z nanos
    assert(firstTs(df).startsWith("2024-01-01T00:00:00"))
  }

  test("timestamp_ntz (parquet timestamp[us]) passes through as UTC") {
    val df = Seq(java.time.LocalDateTime.of(2024, 1, 1, 0, 0, 0)).toDF("ts")
    assert(firstTs(df).startsWith("2024-01-01T00:00:00"))
  }

  test("ISO-8601 string ts normalizes like the binary layouts") {
    val df = Seq("2024-01-01 00:00:00").toDF("ts")
    assert(firstTs(df).startsWith("2024-01-01T00:00:00"))
  }

  test("null ts survives normalization") {
    val df = Seq[Option[Long]](None).toDF("ts")
    assert(Tables.normalizeTs(df).collect().head.isNullAt(0))
  }

  test("micros-magnitude longs heal via per-row unit inference") {
    // 2024-01-01 in MICROS arriving down the long path: round 10's
    // blind div-1000 collapsed this to 1970 and silently exploded the
    // interval joins. Unit inference reads the magnitude and lands on
    // the right instant instead.
    assert(firstTs(Seq(1704067200000000L).toDF("ts"))
      .startsWith("2024-01-01T00:00:00"))
  }

  test("millis- and seconds-magnitude longs infer their units too") {
    assert(firstTs(Seq(1704067200000L).toDF("ts")).startsWith("2024-01-01T00:00:00"))
    assert(firstTs(Seq(1704067200L).toDF("ts")).startsWith("2024-01-01T00:00:00"))
  }

  private def messages(t: Throwable): Seq[String] =
    if (t == null) Nil
    else Option(t.getMessage).toSeq ++ messages(t.getCause)

  test("longs outside every sane unit window fail loudly, not silently") {
    // 42 is below even the seconds window; nothing plausible maps it
    // to [1990, 2100) event time, so normalization must throw.
    val thrown = intercept[Throwable] {
      Tables.normalizeTs(Seq(42L).toDF("ts")).collect()
    }
    assert(messages(thrown).exists(m =>
      m.contains("sane unit window") || m.contains("sane range")),
      s"expected a sanity error, got: ${messages(thrown).mkString(" | ")}")
  }

  test("out-of-window timestamps fail the range guard") {
    val df = Seq(java.time.LocalDateTime.of(1970, 1, 2, 0, 0, 0)).toDF("ts")
    val thrown = intercept[Throwable] { Tables.normalizeTs(df).collect() }
    assert(messages(thrown).exists(_.contains("sane range")),
      s"expected a sane-range error, got: ${messages(thrown).mkString(" | ")}")
  }
}
