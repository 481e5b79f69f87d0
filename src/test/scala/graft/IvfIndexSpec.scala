package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.queries.PipelineQueries

/** q125's scale claim is build-once/query-many: the stored IVF index's
  * query path must (a) reproduce the freshly-trained q75 run exactly
  * and (b) scan only the probed buckets — the bucket store is
  * partitioned by cid, so the probe join must drive partition pruning
  * of the candidate scan (the q89 DPP machinery applied to ANN).
  */
class IvfIndexSpec extends SparkSpec {

  test("persisted-index query path equals the freshly-trained run") {
    val got = PipelineQueries.q125IvfPersisted(spark, sf())
      .collect().map(_.toSeq).toSeq
    val want = PipelineQueries.q75IvfTrained(spark, sf())
      .collect().map(_.toSeq).toSeq
    assert(got == want && got.nonEmpty,
      "store round-trip must not perturb the ANN results")
  }

  test("bucket scan is pruned to probed cids") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfspec").toString
    val emb = spark.read.parquet(PipelineQueries.ClusteredEmbFixture)
    val trained = Similarity.trainCentroids(emb, k = 8, iters = 1)
    trained.write.mode("overwrite").parquet(s"$dir/centroids")
    Similarity.ivfAssign(emb, trained)
      .write.mode("overwrite").partitionBy("cid").parquet(s"$dir/buckets")
    // ONE query vector probing 2 of 8 buckets: the candidate scan must
    // not read the other six partitions
    val queries = emb.filter(col("vec_id") === 0)
    val frame = Similarity.ivfTopKAssigned(
      spark.read.parquet(s"$dir/buckets"), queries,
      spark.read.parquet(s"$dir/centroids"), k = 5, nprobe = 2)
    val planStr = frame.queryExecution.executedPlan.toString
    val pruned = planStr.contains("dynamicpruningexpression") &&
      """dynamicpruningexpression\([^)]*cid""".r.findFirstIn(planStr).isDefined
    assert(pruned, s"no dynamic partition pruning over cid in plan:\n$planStr")
    // and the pruned scan still answers correctly
    assert(frame.count() == 5)
  }
}
