package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.{AdaptiveRead, Tables, TempDirs}

/** The semantic-schema adaptive reader tolerates every physical
  * re-encoding a lake realistically ships for the same table — epoch
  * longs at any unit, ISO strings, widened ints — and refuses lossy or
  * missing ones loudly at plan time. */
class AdaptiveReadSpec extends SparkSpec {

  private val semantic = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType)))

  private def base: DataFrame =
    Tables.events(spark, sf())
      .select("event_id", "ts", "user_id", "event_type", "value")

  private lazy val reference = base.orderBy("event_id").collect().toSeq

  /** Write a re-encoded physical copy, adaptive-read it back, compare
    * to `expected` (default: the untouched reference). */
  private def roundTrip(recode: DataFrame => DataFrame,
                        expected: => Seq[org.apache.spark.sql.Row] = reference): Unit = {
    val dir = TempDirs.create("graft_adaptive_").toString
    recode(base).write.mode("overwrite").parquet(dir)
    val got = AdaptiveRead.read(spark, dir, semantic)
      .orderBy("event_id").collect().toSeq
    assert(got == expected,
      s"adaptive read mismatch: got ${got.take(2)} vs ${expected.take(2)}")
  }

  test("identical physical schema passes through untouched") {
    roundTrip(identity)
  }

  test("nanos epoch longs infer and normalize") {
    roundTrip(_.withColumn("ts", unix_micros(col("ts")) * 1000))
  }

  test("micros epoch longs infer and normalize") {
    roundTrip(_.withColumn("ts", unix_micros(col("ts"))))
  }

  test("millis epoch longs infer and normalize (at millis precision)") {
    roundTrip(
      _.withColumn("ts", unix_millis(col("ts"))),
      base.withColumn("ts", timestamp_millis(unix_millis(col("ts"))))
        .orderBy("event_id").collect().toSeq)
  }

  test("ISO-8601 strings parse") {
    roundTrip(_.withColumn("ts",
      date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS")))
  }

  test("int ids widen to long") {
    // user_id fits int at test scale; the physical file narrows it,
    // the semantic schema widens it back
    roundTrip(_.withColumn("user_id", col("user_id").cast("int")))
  }

  test("missing semantic column fails at plan time, naming it") {
    val dir = TempDirs.create("graft_adaptive_miss_").toString
    base.drop("value").write.mode("overwrite").parquet(dir)
    val e = intercept[IllegalArgumentException] {
      AdaptiveRead.read(spark, dir, semantic)
    }
    assert(e.getMessage.contains("'value'"))
  }

  test("lossy narrowing is refused at plan time") {
    val dir = TempDirs.create("graft_adaptive_lossy_").toString
    base.write.mode("overwrite").parquet(dir)
    val narrowed = StructType(semantic.fields.map {
      case f if f.name == "value" => f.copy(dataType = LongType)
      case f => f
    })
    val e = intercept[IllegalArgumentException] {
      AdaptiveRead.read(spark, dir, narrowed)
    }
    assert(e.getMessage.contains("'value'") && e.getMessage.contains("losslessly"))
  }
}
