package graft

import java.time.LocalDate
import org.apache.spark.sql.functions._
import graft.queries.DashboardQueries

class DashboardSpec extends SparkSpec {
  import spark.implicits._

  test("periodStart mirrors the reference's anchor arithmetic") {
    val anchor = LocalDate.of(2024, 7, 15)
    assert(DashboardQueries.periodStart(anchor, "Allt").isEmpty)
    assert(DashboardQueries.periodStart(anchor, "YTD").contains(LocalDate.of(2024, 1, 1)))
    assert(DashboardQueries.periodStart(anchor, "1 dag").contains(anchor.minusDays(1)))
    assert(DashboardQueries.periodStart(anchor, "1 vecka").contains(anchor.minusDays(7)))
    assert(DashboardQueries.periodStart(anchor, "3 månader").contains(anchor.minusDays(90)))
    assert(DashboardQueries.periodStart(anchor, "1 år").contains(anchor.minusDays(365)))
  }

  test("portfolio index uses TWR when long enough, static basket otherwise") {
    val panel = Seq(
      ("A", "2024-01-01", 1, 100.0), ("A", "2024-01-02", 2, 110.0),
      ("A", "2024-01-03", 3, 121.0),
      ("B", "2024-01-01", 1, 50.0), ("B", "2024-01-02", 2, 50.0),
      ("B", "2024-01-03", 3, 50.0))
      .toDF("ticker", "tss", "rn", "close")
      .withColumn("ts", to_date($"tss")).drop("tss")
    val qtyNow = Seq(("A", 2.0), ("B", 0.0)).toDF("ticker", "qty")
    val twrLong = Seq(("2024-01-01", 100.0), ("2024-01-02", 101.0), ("2024-01-03", 99.0),
      ("2024-01-04", 102.0), ("2024-01-05", 103.0))
      .toDF("tss", "twr_index").withColumn("ts", to_date($"tss")).drop("tss")
    val twrShort = twrLong.limit(2)

    // long enough -> TWR passthrough
    val viaTwr = DashboardQueries.portfolioIndexWithFallback(panel, qtyNow, twrLong)
      .orderBy("ts").collect()
    assert(viaTwr.length == 5 && viaTwr.head.getDouble(1) == 100.0)

    // short -> static basket of current holdings: pv = 2*close_A
    val viaBasket = DashboardQueries.portfolioIndexWithFallback(panel, qtyNow, twrShort)
      .orderBy("ts").collect().map(_.getDouble(1))
    viaBasket.zip(Seq(100.0, 110.0, 121.0)).foreach { case (a, e) =>
      assert(math.abs(a - e) < 1e-9) } // rebased 200,220,242
  }
}
