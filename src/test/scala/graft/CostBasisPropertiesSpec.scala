package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.operators.CostBasis

/** ScalaCheck-generator property tests for the cost-basis fold
  * (SURVEY §5 item 4). Drives Gen directly with fixed seeds (the
  * scalatest bridge artifact is not on the offline classpath), so runs
  * are reproducible.
  */
class CostBasisPropertiesSpec extends SparkSpec {
  import spark.implicits._

  private val genTrade: Gen[(String, Double, Double, Double)] = for {
    side <- Gen.oneOf("BUY", "SELL")
    qty <- Gen.choose(1, 50).map(_.toDouble)
    price <- Gen.choose(1, 10000).map(_ / 10.0)
    fee <- Gen.choose(0, 100).map(_ / 10.0)
  } yield (side, qty, price, fee)

  private def sample(n: Int, seed: Long): Seq[(String, Double, Double, Double)] =
    Gen.listOfN(n, genTrade).pureApply(Gen.Parameters.default, Seed(seed))

  private def run(ts: Seq[(String, Double, Double, Double)]): (Double, Double, Double) = {
    val df = ts.zipWithIndex.map { case ((s, q, p, f), i) =>
      (1L, 1L, (i + 1).toLong, "2024-01-02", s, q, p, f)
    }.toDF("user_id", "ticker", "id", "tss", "side", "qty", "price", "fee")
      .withColumn("ts", to_date($"tss")).drop("tss")
    val out = CostBasis.fold(df).collect()
    if (out.isEmpty) (0.0, 0.0, 0.0)
    else (out.head.getDouble(2), out.head.getDouble(3), out.head.getDouble(4))
  }

  /** Reference Python fold transcribed as the executable model
    * (portfolio.py:18-41, 74-110). */
  private def model(ts: Seq[(String, Double, Double, Double)]): (Double, Double, Double) = {
    var q0 = 0.0; var avg = 0.0; var realized = 0.0
    ts.foreach { case (side, qty, price, fee) =>
      if (side == "BUY") {
        val q1 = q0 + qty
        avg = if (q1 > 0) (q0 * avg + (qty * price + fee)) / q1 else 0.0
        q0 = q1
      } else if (q0 > 0) {
        val sell = math.min(qty, q0)
        realized += (price - avg) * sell
        q0 -= sell
      }
    }
    (q0, avg, realized)
  }

  test("fold equals the sequential reference model on random ledgers") {
    (1L to 20L).foreach { seed =>
      val trades = sample(12, seed)
      assert(run(trades) == model(trades), s"seed $seed: $trades")
    }
  }

  test("qty is never negative and realized is finite") {
    (100L to 110L).foreach { seed =>
      val (q, _, r) = run(sample(10, seed))
      assert(q >= 0.0)
      assert(!r.isNaN && !r.isInfinite)
    }
  }

  test("splitting any even BUY in half (fees split too) preserves avg within 1e-9") {
    (200L to 210L).foreach { seed =>
      val trades = sample(6, seed)
      val split = trades.flatMap {
        case ("BUY", q, p, f) if q >= 2 && q % 2 == 0 =>
          Seq(("BUY", q / 2, p, f / 2), ("BUY", q / 2, p, f / 2))
        case t => Seq(t)
      }
      val (q1, a1, _) = run(trades)
      val (q2, a2, _) = run(split)
      assert(q1 == q2)
      assert(math.abs(a1 - a2) <= 1e-9 * math.max(1.0, math.abs(a1)), s"seed $seed")
    }
  }
}
