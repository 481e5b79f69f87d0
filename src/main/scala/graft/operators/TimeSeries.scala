package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window-composed time-series operators (ref: SURVEY §2.6 W1-W11).
  * All are pure compositions of built-in window expressions — they stay
  * inside whole-stage codegen, shuffle once on the partition key, and
  * never materialize state on the driver.
  */
object TimeSeries {

  /** Running cumulative sum per key in `order` order
    * (ref: 1_Dashboard.py:116,126 `cumsum`). */
  def cumsum(c: Column, partitionBy: Seq[Column], orderBy: Seq[Column]): Column =
    sum(c).over(Window.partitionBy(partitionBy: _*).orderBy(orderBy: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow))

  /** Forward-fill: last non-null value up to the current row
    * (ref: 1_Dashboard.py:117,351 `reindex(method="ffill")`/`ffill`). */
  def ffill(c: Column, partitionBy: Seq[Column], orderBy: Seq[Column]): Column =
    last(c, ignoreNulls = true).over(
      Window.partitionBy(partitionBy: _*).orderBy(orderBy: _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow))

  /** Backward-fill: first non-null value from the current row on. */
  def bfill(c: Column, partitionBy: Seq[Column], orderBy: Seq[Column]): Column =
    first(c, ignoreNulls = true).over(
      Window.partitionBy(partitionBy: _*).orderBy(orderBy: _*)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing))

  /** Daily percent change per key (ref: 1_Dashboard.py:312 `pct_change()`
    * with inf/NaN -> 0). Spark division by null yields null, so only the
    * null leg needs scrubbing. */
  def pctChange(c: Column, partitionBy: Seq[Column], orderBy: Seq[Column]): Column = {
    val w = Window.partitionBy(partitionBy: _*).orderBy(orderBy: _*)
    coalesce(c / lag(c, 1).over(w) - 1.0, lit(0.0))
  }

  /** Cumulative product via a running log-sum
    * (ref: 1_Dashboard.py:329 `(1+port_ret).cumprod()`).
    * `exp(sum(ln(1+r)))` — uses ln(1.0+x), not log1p, so the DuckDB
    * oracle can apply the identical IEEE operation sequence. */
  def cumprodOnePlus(r: Column, partitionBy: Seq[Column], orderBy: Seq[Column]): Column =
    exp(sum(log(lit(1.0) + r)).over(
      Window.partitionBy(partitionBy: _*).orderBy(orderBy: _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))

  /** Normalize a series so its first element (in `orderBy` order) is 100
    * (ref: 1_Dashboard.py:17-26,341,354 `s / s.iloc[0] * 100`). */
  def rebase100(c: Column, partitionBy: Seq[Column], orderBy: Seq[Column]): Column = {
    val firstVal = first(c, ignoreNulls = true).over(
      Window.partitionBy(partitionBy: _*).orderBy(orderBy: _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    c / firstVal * 100.0
  }

  /** Presentation-edge pivot (SURVEY A7 / §1.4): long (ts, key, value)
    * -> wide (ts, one column per key). Only for the final, small result —
    * all engine math stays long-form. */
  def toWide(df: DataFrame, tsCol: String, keyCol: String, valueCol: String): DataFrame =
    df.groupBy(col(tsCol)).pivot(keyCol).agg(first(col(valueCol)))

  /** Linear interpolation in both directions, pandas
    * `interpolate(limit_direction="both")` semantics
    * (ref: 1_Dashboard.py:82): interior gaps are filled linearly *by row
    * position* (pandas' default method treats values as equally spaced),
    * leading gaps backfill, trailing gaps forward-fill.
    *
    * Input must be a dense grid per key (one row per (key, position),
    * null `valueCol` where unobserved). Adds `outCol`; `posCol` must be a
    * strictly increasing integer row position per key.
    */
  def interpolateBoth(df: DataFrame, keyCols: Seq[String], posCol: String,
                      valueCol: String, outCol: String): DataFrame = {
    val keys = keyCols.map(col)
    val wPrev = Window.partitionBy(keys: _*).orderBy(col(posCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.partitionBy(keys: _*).orderBy(col(posCol))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val v = col(valueCol)
    val prevV = last(v, ignoreNulls = true).over(wPrev)
    val prevP = last(when(v.isNotNull, col(posCol)), ignoreNulls = true).over(wPrev)
    val nextV = first(v, ignoreNulls = true).over(wNext)
    val nextP = first(when(v.isNotNull, col(posCol)), ignoreNulls = true).over(wNext)
    df.withColumn(outCol,
      when(v.isNotNull, v)
        .when(prevV.isNull, nextV)           // leading edge -> bfill
        .when(nextV.isNull, prevV)           // trailing edge -> ffill
        .otherwise(prevV + (nextV - prevV) * (col(posCol) - prevP) / (nextP - prevP)))
  }
}
