package graft

import java.util.concurrent.Executors
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._

/** A 100 TB engine is multi-tenant: queries arrive concurrently, each
  * in its own FAIR scheduler pool, and isolation means every result is
  * exactly what a serial run would have produced. This spec runs 8
  * registered queries at once (view-free ones — SQL-text queries that
  * register session temp views are a documented serial-only surface;
  * concurrent tenants would use per-tenant sessions via
  * `spark.newSession()`, which scopes temp views) and pins
  * result equality against their serial runs.
  */
class ConcurrentServingSpec extends SparkSpec {

  test("8 concurrent queries on FAIR pools equal their serial results") {
    assert(spark.sparkContext.getSchedulingMode ==
      org.apache.spark.scheduler.SchedulingMode.FAIR)
    val names = Seq("q01_current_qty", "q16_pricing_summary",
      "q17_top_customers", "q32_rollup", "q69_ship_priority",
      "q70_regional_revenue", "q83_cube", "q137_topk_per_group")
    def run(n: String): Seq[Seq[Any]] =
      SparkEntry.queries(n)(spark, sf()).collect().map(_.toSeq).toSeq
    val serial = names.map(n => n -> run(n)).toMap
    val pool = Executors.newFixedThreadPool(names.size)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val futs = names.zipWithIndex.map { case (n, i) =>
        Future {
          // local properties are inheritable-thread-local: each tenant
          // tags its own pool, so one hog cannot starve the others
          spark.sparkContext.setLocalProperty("spark.scheduler.pool", s"tenant$i")
          try n -> run(n)
          finally spark.sparkContext.setLocalProperty("spark.scheduler.pool", null)
        }
      }
      val got = Await.result(Future.sequence(futs), 10.minutes).toMap
      names.foreach { n =>
        assert(got(n) == serial(n), s"$n diverged under concurrency")
      }
    } finally pool.shutdown()
  }
}
