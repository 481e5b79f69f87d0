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

  test("bulk assignment (large k) equals the aggregation path") {
    // above the bulk threshold the assignment runs as a partition-local
    // loop over broadcast centroids instead of a crossJoin aggregation
    // (the n x k row materialization is the index-build bottleneck at
    // scale — see Similarity.assignToNearest). Same argmax, same
    // lowest-cid tiebreak, same dot-product arithmetic: the two paths
    // must agree on every vector's bucket.
    val emb = spark.read.parquet(PipelineQueries.ClusteredEmbFixture)
    val cents = emb.orderBy("vec_id").limit(100) // k=100 > threshold 64
    val got = Similarity.ivfAssign(emb, cents)
      .select("vec_id", "cid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // reference: the small-k aggregation formulation, written inline
    val expected = emb.crossJoin(broadcast(
        cents.select(col("vec_id").as("cid"), col("embedding").as("cv"))))
      .withColumn("csim", Similarity.cosine(col("cv"), col("embedding")))
      .groupBy(col("vec_id"))
      .agg(max_by(col("cid"), struct(col("csim"), negate(col("cid")))).as("cid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected)
    assert(got.size == emb.count())
  }
}
