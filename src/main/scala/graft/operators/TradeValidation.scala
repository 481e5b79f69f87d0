package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Trade-ingest validation (SURVEY P11/P12; ref
  * /root/reference/app/services/trades.py:14-26 input checks, :51-54
  * oversell guard). The reference validates one trade at a time before
  * INSERT; at scale validation is a column-expression pass that splits
  * a candidate batch into accepted/rejected with a reason — no driver
  * round-trips.
  */
object TradeValidation {

  val OversellEps = 1e-12 // ref trades.py:53

  /** Normalizes side (upper/trim) and appends `reject_reason` (null =
    * valid). Checks mirror _validate_inputs: non-empty user/ticker,
    * side in {BUY, SELL}, qty > 0, price > 0, fee >= 0, parseable date. */
  def validate(candidates: DataFrame): DataFrame = {
    val side = upper(trim(col("side")))
    candidates
      .withColumn("side", side)
      .withColumn("reject_reason",
        when(length(trim(col("user_id").cast("string"))) === 0 ||
          col("user_id").isNull, "empty user")
          .when(length(trim(col("ticker").cast("string"))) === 0 ||
            col("ticker").isNull, "empty ticker")
          .when(!col("side").isin("BUY", "SELL"), "side must be BUY or SELL")
          .when(col("qty").isNull || col("qty") <= 0, "qty must be > 0")
          .when(col("price").isNull || col("price") <= 0, "price must be > 0")
          .when(coalesce(col("fee"), lit(0.0)) < 0, "fee must be >= 0")
          .when(col("ts").isNull, "unparseable date"))
  }

  /** Oversell guard for a candidate batch against an existing ledger:
    * a SELL is rejected when its qty exceeds the holding as of its
    * position in the (ts, id) sequence — and, as in the reference,
    * rejected trades never enter the ledger, so they do NOT affect the
    * holding seen by later candidates. That sequential dependency makes
    * this a per-key fold (same scalable shape as CostBasis.fold: one
    * shuffle + secondary sort + streaming walk). Appends `oversell`. */
  def flagOversell(existing: DataFrame, candidates: DataFrame): DataFrame =
    flagOversellValidated(existing, validate(candidates))

  /** Same as [[flagOversell]] but takes a frame that already carries
    * `reject_reason` from [[validate]] — callers that need both the
    * rejected and accepted branches validate once and share the result
    * instead of re-running the candidate scan. */
  def flagOversellValidated(existing: DataFrame, validated: DataFrame): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types._
    val cols = Seq("user_id", "ticker", "ts", "id", "side", "qty", "price", "fee")
    val tagged = existing.select(cols.map(col): _*).withColumn("is_cand", lit(false))
      .union(validated.filter(col("reject_reason").isNull)
        .select(cols.map(col): _*).withColumn("is_cand", lit(true)))
      .select(col("user_id").cast("long"), col("ticker").cast("long"),
        col("ts"), col("id").cast("long"), col("side"),
        col("qty").cast("double"), col("price").cast("double"),
        coalesce(col("fee"), lit(0.0)).cast("double").as("fee"), col("is_cand"))
    val outSchema = StructType(tagged.schema.fields :+ StructField("oversell", BooleanType))
    tagged
      .repartition(col("user_id"), col("ticker"))
      // is_cand last (false < true): a candidate row byte-identical to an
      // existing ledger row walks AFTER it — total order, and the
      // reference's existing-ledger-first semantics on ties
      .sortWithinPartitions(col("user_id"), col("ticker"), col("ts"),
        col("id"), col("side"), col("qty"), col("price"), col("fee"),
        col("is_cand"))
      .mapPartitions { iter =>
        var curUser = Long.MinValue; var curTicker = Long.MinValue
        var held = 0.0
        iter.map { r =>
          val u = r.getLong(0); val t = r.getLong(1)
          if (u != curUser || t != curTicker) { curUser = u; curTicker = t; held = 0.0 }
          val side = r.getString(4); val qty = r.getDouble(5)
          val isCand = r.getBoolean(8)
          val oversell = isCand && side == "SELL" && qty > held + OversellEps
          // existing rows apply as a plain signed sum (no clamp), matching
          // the reference's current-qty check — a pre-existing oversold
          // ledger keeps its negative holding rather than being repaired
          if (!oversell) held += (if (side == "BUY") qty else -qty)
          Row.fromSeq(r.toSeq :+ oversell)
        }
      }(Encoders.row(outSchema))
      .filter(col("is_cand"))
      .drop("is_cand")
  }
}
