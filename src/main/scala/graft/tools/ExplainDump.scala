package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode
import graft.SparkEntry

/** Plan-audit aid: print the formatted physical plan of selected
  * queries (docs/PLANS.md is curated from this output).
  * Usage: runMain graft.tools.ExplainDump q22,q39 [sfDir]
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.filter(_.nonEmpty).map(_.split(",").map(_.trim).toSet)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
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
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => names.forall(_.exists(n.startsWith)) }
      .foreach { case (n, fn) =>
        println(s"\n===== $n =====")
        try {
          val df = fn(spark, sfDir)
          if (sys.env.contains("SPARK_GRAFT_FINAL")) {
            // drive THIS QueryExecution's RDD (a write/collect would plan
            // a fresh one): AQE finalizes in place and runtime exchange
            // reuse becomes visible, with nothing pulled to the driver
            df.queryExecution.toRdd.foreach(_ => ())
            println(df.queryExecution.executedPlan.toString)
          } else println(df.queryExecution.explainString(FormattedMode))
        } catch { case e: Throwable => println(s"explain failed: ${e.getMessage}") }
      }
    spark.stop()
  }
}
