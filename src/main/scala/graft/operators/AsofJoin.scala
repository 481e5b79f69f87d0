package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Generic backward as-of join: for every left row, the most recent
  * right row with rightTime <= leftTime within the same key.
  *
  * Composed from built-ins (SURVEY preference (a)): tag both sides,
  * union, one window pass per key ordered by (time, right-first), and a
  * forward-fill of the right payload — one shuffle on the key, no
  * per-key materialization, scales like any windowed scan. Equal
  * timestamps match (right rows sort before left rows at the same
  * instant), which is DuckDB/standard ASOF `>=` semantics.
  */
object AsofJoin {

  /** leftDf(key, leftTime, ...) x rightDf(key, rightTime, payload) ->
    * leftDf columns + `asOfCol` (null when no right row precedes).
    * `rightOrder` breaks ties among right rows at the same instant
    * (last one wins). */
  def backward(leftDf: DataFrame, rightDf: DataFrame, key: String,
               leftTime: String, rightTime: String, payload: String,
               asOfCol: String, rightOrder: Seq[String] = Nil): DataFrame = {
    val leftCols = leftDf.columns
    val l = leftDf
      .withColumn("_t", col(leftTime))
      .withColumn("_side", lit(1))          // left sorts after right at equal time
      .withColumn("_p", lit(null).cast(rightDf.schema(payload).dataType))
    val extraOrder = rightOrder.map(rightDf.schema(_)).map(f =>
      (f.name, f.dataType))
    val r0 = rightDf
      .withColumn("_t", col(rightTime))
      .withColumn("_side", lit(0))
      .withColumn("_p", col(payload))
    // align schemas: left carries nulls for right-only order columns
    val lAligned = extraOrder.foldLeft(l) { case (df, (n, dt)) =>
      if (df.columns.contains(n)) df else df.withColumn(n, lit(null).cast(dt)) }
    val rAligned = leftCols.foldLeft(r0) { case (df, n) =>
      if (df.columns.contains(n)) df else df.withColumn(n, lit(null).cast(leftDf.schema(n).dataType)) }
    val cols = (leftCols.toSeq ++ Seq("_t", "_side", "_p") ++ rightOrder).distinct
    val unioned = lAligned.select(cols.map(col): _*)
      .unionByName(rAligned.select(cols.map(col): _*))
    val order = (Seq(col("_t").asc, col("_side").asc) ++ rightOrder.map(col(_).asc))
    val w = Window.partitionBy(key).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      // fill with a struct tagged per right ROW (non-null even when the
      // payload is null) so the most recent right row wins — a null
      // payload must yield null, not resurrect an older right row
      .withColumn("_m",
        last(when(col("_side") === 0, struct(col("_p"))), ignoreNulls = true).over(w))
      .withColumn(asOfCol, col("_m").getField("_p"))
      .filter(col("_side") === 1)
      .select((leftCols.map(col) :+ col(asOfCol)): _*)
  }
}
