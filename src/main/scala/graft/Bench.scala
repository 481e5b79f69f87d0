package graft

import org.apache.spark.sql.SparkSession

/** Bench main: times every SparkEntry query at SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line. A warmup pass at sf0.001 first runs each query
  * shape once so whole-stage-codegen compilation (keyed on generated
  * source, shared across scale factors) is paid outside the timed runs —
  * the timings then measure the engine, not the JIT.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Local-iteration aid: GRAFT_ONLY=q22,q39 restricts the timed set.
    val only = sys.env.get("GRAFT_ONLY").map(_.split(",").map(_.trim).toSet)
    val queries = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(o => o.exists(n.startsWith)) }
    val warmupDir = "/root/testdata/sf0.001"
    if (new java.io.File(warmupDir).isDirectory && warmupDir != sfDir) {
      queries.foreach { case (_, fn) =>
        try fn(spark, warmupDir).count() catch { case _: Throwable => () }
      }
      // drop warmup session debris (memory-sink tables, cached relations,
      // young-gen garbage) so it does not tax the timed runs
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      System.gc()
    }
    // a query that throws is reported with NEGATIVE elapsed time and
    // listed in "failed" — a regression that fails fast must not read as
    // a bench speedup
    val results = queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true } catch { case _: Throwable => false }
      val secs = (System.nanoTime() - t0) / 1e9
      // isolate queries from each other OUTSIDE the timed window: drop
      // cached relations, lingering memory-sink streams, and young-gen
      // garbage a query left behind, so a later query's timing measures
      // ITS plan, not its neighbors' debris (observed: q22 at 169 s in a
      // 155-query run vs 4.5 s in a 4-query run, same JVM settings)
      try {
        spark.streams.active.foreach(_.stop())
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      } catch {
        // a broken isolation step must at least be VISIBLE — if this
        // prints, later timings may again include neighbor debris
        case t: Throwable =>
          System.err.println(s"bench: isolation after $name failed: $t")
      }
      System.gc()
      name -> (if (ok) secs else -secs)
    }
    // The harness that captures this output keeps only a bounded tail of
    // it, so the line must stay short: keys are the qNN prefix of the
    // query name (unique by construction) and timings are rounded to ms.
    // With ~90 queries the full-name line had grown past the capture
    // window and the header ("metric"/"value") was being cut off.
    def ms(v: Double): Double = math.round(v * 1000) / 1000.0
    val qs = results.map { case (k, v) =>
      "\"" + k.takeWhile(_ != '_') + "\":" + ms(v)
    }.mkString("{", ",", "}")
    val failed = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = ms(results.map { case (_, v) => math.abs(v) }.sum)
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
