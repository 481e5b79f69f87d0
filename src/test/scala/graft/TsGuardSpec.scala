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

  test("micros-as-nanos unit collapse fails loudly, not silently") {
    // 2024-01-01 in MICROS fed down the nanos path: div 1000 lands in
    // 1970 — exactly the corruption that made q30 emit 5 windows
    // instead of 150 in round 10. The guard must throw, not return.
    val df = Seq(1704067200000000L).toDF("ts")
    val thrown = intercept[Throwable] {
      Tables.normalizeTs(df).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(thrown).exists(_.contains("sane range")),
      s"expected a sane-range error, got: ${messages(thrown).mkString(" | ")}")
  }
}
