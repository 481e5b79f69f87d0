package graft

import java.sql.Date
import org.apache.spark.sql.DataFrame
import graft.operators.CostBasis

/** Golden tests from the reference self-test scenario
  * (/root/reference/app/services/portfolio.py:130-165, trades.py:87-113;
  * see FIXTURES.md): buy 10@200, sell 4@220, buy 6@210 on one ticker
  * => qty 12, avg (6*200+6*210)/12 = 205, realized (220-200)*4 = 80.
  */
class CostBasisSpec extends SparkSpec {
  import spark.implicits._

  private def trades(rows: (Long, Long, Long, String, String, Double, Double, Double)*): DataFrame =
    rows.toSeq.toDF("user_id", "ticker", "id", "tss", "side", "qty", "price", "fee")
      .withColumn("ts", org.apache.spark.sql.functions.to_date(
        org.apache.spark.sql.functions.col("tss")))
      .drop("tss")

  test("reference golden scenario: buy/sell/buy") {
    val df = trades(
      (1L, 7L, 1L, "2024-01-02", "BUY", 10, 200.0, 0.0),
      (1L, 7L, 2L, "2024-01-02", "SELL", 4, 220.0, 0.0),
      (1L, 7L, 3L, "2024-01-02", "BUY", 6, 210.0, 0.0))
    val r = CostBasis.fold(df).collect().head
    assert(r.getDouble(2) == 12.0)    // qty
    assert(r.getDouble(3) == 205.0)   // avg cost
    assert(r.getDouble(4) == 80.0)    // realized
  }

  test("segment-checkpointed fold is bit-equal to the streaming fold on a giant key") {
    import org.apache.spark.sql.functions._
    // one hot (user, ticker) key with 30k events spanning ~10 months
    // (plus a second normal key), segmented by month: every segment
    // boundary respects ts order, so the event sequence — and therefore
    // every IEEE operation — is identical to the single-pass fold
    val df = spark.range(30000).select(
      when(col("id") % 100 === 0, 2L).otherwise(1L).as("user_id"),
      lit(7L).as("ticker"),
      col("id").as("id"),
      date_add(lit(Date.valueOf("2024-01-01")), (col("id") / 100).cast("int")).as("ts"),
      when(col("id") % 3 === 0, "SELL").otherwise("BUY").as("side"),
      (col("id") % 5 + 1).cast("double").as("qty"),
      (col("id") % 97 + 1).cast("double").as("price"),
      ((col("id") % 3).cast("double") * 0.1).as("fee"))
    val direct = CostBasis.fold(df).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .sortBy(t => (t._1, t._2))
    val seg = CostBasis.foldCheckpointed(df, date_trunc("month", col("ts"))).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .sortBy(t => (t._1, t._2))
    assert(direct.sameElements(seg)) // exact, not approximate
  }

  test("checkpointed fold carries state for keys absent from later segments") {
    import org.apache.spark.sql.functions._
    // key (1,7) trades only in January, key (1,8) in both months —
    // January's (1,7) state must survive February's job untouched
    val df = trades(
      (1L, 7L, 1L, "2024-01-02", "BUY", 10, 200.0, 0.0),
      (1L, 8L, 2L, "2024-01-03", "BUY", 5, 50.0, 0.0),
      (1L, 8L, 3L, "2024-02-04", "SELL", 2, 60.0, 0.0))
    val out = CostBasis.foldCheckpointed(df, date_trunc("month", col("ts")))
      .collect().map(r => (r.getLong(1), (r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(out(7L) == ((10.0, 200.0, 0.0)))
    assert(out(8L) == ((3.0, 50.0, 20.0)))
  }

  test("fee is amortized into avg cost on BUY") {
    val df = trades((1L, 1L, 1L, "2024-01-02", "BUY", 10, 100.0, 10.0))
    val r = CostBasis.fold(df).collect().head
    assert(r.getDouble(3) == 101.0) // (10*100+10)/10
  }

  test("oversell clamps at held qty; sells when flat are skipped") {
    val df = trades(
      (1L, 1L, 1L, "2024-01-02", "SELL", 5, 150.0, 0.0),  // flat -> skip
      (1L, 1L, 2L, "2024-01-03", "BUY", 10, 100.0, 0.0),
      (1L, 1L, 3L, "2024-01-04", "SELL", 15, 120.0, 0.0)) // clamp to 10
    val r = CostBasis.fold(df).collect().head
    assert(r.getDouble(2) == 0.0)
    assert(r.getDouble(4) == 200.0) // (120-100)*10
  }

  test("order within a day resolved by id") {
    val df = trades(
      (1L, 1L, 2L, "2024-01-02", "SELL", 5, 200.0, 0.0),
      (1L, 1L, 1L, "2024-01-02", "BUY", 5, 100.0, 0.0))
    val r = CostBasis.fold(df).collect().head
    assert(r.getDouble(2) == 0.0)
    assert(r.getDouble(4) == 500.0) // BUY applies first despite input order
  }

  test("keys are independent across users and tickers") {
    val df = trades(
      (1L, 1L, 1L, "2024-01-02", "BUY", 1, 10.0, 0.0),
      (2L, 1L, 2L, "2024-01-02", "BUY", 2, 20.0, 0.0),
      (1L, 2L, 3L, "2024-01-02", "BUY", 3, 30.0, 0.0))
    val out = CostBasis.fold(df).collect()
    assert(out.length == 3)
    assert(out.map(_.getDouble(2)).sorted.toSeq == Seq(1.0, 2.0, 3.0))
  }

  test("splitting a BUY into two equal halves at the same price preserves avg") {
    val one = trades((1L, 1L, 1L, "2024-01-02", "BUY", 10, 100.0, 2.0))
    val two = trades(
      (1L, 1L, 1L, "2024-01-02", "BUY", 5, 100.0, 1.0),
      (1L, 1L, 2L, "2024-01-02", "BUY", 5, 100.0, 1.0))
    val a = CostBasis.fold(one).collect().head.getDouble(3)
    val b = CostBasis.fold(two).collect().head.getDouble(3)
    assert(math.abs(a - b) < 1e-9)
  }
}
