package graft

import org.apache.spark.sql.functions._
import graft.queries.PipelineQueries
import graft.sources.Tables
import graft.streaming.StreamingQueries

/** Observability surface: the row-count / late-row metrics a deployed
  * 100 TB pipeline lives on. Batch queries carry `observe` nodes read
  * off `queryExecution.observedMetrics`; streaming queries report the
  * same observe metrics per micro-batch in their progress events next
  * to the engine's numInputRows / numRowsDroppedByWatermark. These
  * specs assert the observed values equal independently computed
  * oracle counts — a metric that can drift from the data it describes
  * is worse than none.
  */
class ObservabilitySpec extends SparkSpec {

  test("q51 observed stage metrics equal independently computed counts") {
    val df = PipelineQueries.q51CorpusCuration(spark, sf())
    val rows = df.collect()
    val m = df.queryExecution.observedMetrics
    assert(m.keySet == Set("q51_input", "q51_canonical", "q51_output"),
      s"expected all three stage metrics, got ${m.keySet}")
    // input = corpus size, collected by the same job — not a second scan
    val nDocs = Tables.documents(spark, sf()).count()
    assert(m("q51_input").getAs[Long]("n_docs") == nDocs)
    // output metric = delivered rows, exactly
    assert(m("q51_output").getAs[Long]("n_sampled") == rows.length.toLong)
    // canonical sits between: survivors of dedup + quality filtering
    val nCanonical = m("q51_canonical").getAs[Long]("n_canonical")
    assert(nCanonical <= nDocs && nCanonical >= rows.length.toLong,
      s"stage monotonicity broken: $nDocs >= $nCanonical >= ${rows.length}")
  }

  test("q30 streaming progress reports input rows, observed metrics, and late-row counts") {
    val out = StreamingQueries.q30StreamTumbling(spark, sf())
    val nOut = out.count()
    assert(nOut > 0)
    val progress = StreamingQueries.lastQ30Progress
    assert(progress.nonEmpty, "no progress events captured")
    val nEvents = Tables.events(spark, sf()).count()
    // engine-side telemetry: every source row shows up in numInputRows
    val inputRows = progress.map(_.numInputRows).sum
    assert(inputRows == nEvents, s"numInputRows $inputRows != $nEvents")
    // custom observe metric: same total, reported per batch
    val observed = progress.flatMap(p =>
      Option(p.observedMetrics.get("q30_input")))
    assert(observed.nonEmpty, "q30_input observe metric missing from progress")
    val observedRows = observed.map(_.getAs[Long]("n_input_rows")).sum
    assert(observedRows == nEvents, s"observed $observedRows != $nEvents")
    // late-data telemetry: the watermark operator reports dropped rows;
    // a single AvailableNow pass over ordered files drops nothing, and
    // the metric must SAY so (absence of drops is a claim, not a gap)
    val stateOps = progress.flatMap(_.stateOperators)
    assert(stateOps.nonEmpty, "no state operator metrics in progress")
    assert(stateOps.map(_.numRowsDroppedByWatermark).sum == 0L)
  }
}
