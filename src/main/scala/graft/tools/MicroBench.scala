package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.AsofJoin
import graft.sources.Tables

/** Micro-benchmark: composed (union+window) vs native (merge exec)
  * as-of join on the same slice. Usage:
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.MicroBench /root/testdata/sf0.1"
  */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val ev = Tables.events(spark, sfDir)
    def left = ev.filter(col("value") < 40)
      .select(col("event_id"), col("event_type").as("ticker"), col("ts"))
    def right = ev.filter(col("value") >= 150)
      .select(col("event_type").as("ticker"), col("ts").as("rts"),
        col("value").as("close"), col("event_id").as("rid"))
    def time(label: String)(f: => Long): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        println(f"$label run $i: ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$n")
      }
    }
    time("composed") {
      AsofJoin.backward(left, right, "ticker", "ts", "rts",
        "close", "asof_close", Seq("rid")).count()
    }
    time("native  ") {
      AsofJoin.backwardNative(left, right, "ticker", "ts", "rts",
        "close", "asof_close", Seq("rid")).count()
    }
    spark.stop()
  }
}
