package graft.operators

import graft.sources.TempDirs
import org.apache.spark.sql.DataFrame

/** Lineage truncation for iterative jobs (connected components, q115
  * PageRank): every round must materialize its frame and CUT the plan,
  * or analysis cost and lineage depth grow by one join per round. Two
  * modes behind one call:
  *
  *  - default: `localCheckpoint` — executor-local blocks, no
  *    replication, the fastest truncation and the right local-bench
  *    default. Fragile to executor loss: blocks die with their
  *    executor, and a loss mid-iteration fails the job because the
  *    truncated lineage cannot recompute them.
  *  - reliable (`graft.checkpoint.reliable=true`): `checkpoint()` to
  *    the context's checkpoint directory — the deploy-grade form. At
  *    100 TB on 1000 executors, losing one executor over a multi-round
  *    fixpoint is the EXPECTED case, not the corner case; reliable
  *    checkpoints survive it at the cost of a write to shared storage
  *    per round. Production points `setCheckpointDir` at durable
  *    storage (HDFS/S3); if unset, a local temp dir is provisioned so
  *    the mode is testable on local[n] — correct there, but NOT
  *    durable across machines, so a real cluster must set its own.
  *
  * Both are EAGER (the round's single job), so callers' convergence
  * probes read already-materialized blocks either way. */
object Lineage {

  /** Runtime conf key selecting reliable checkpointing. */
  val ReliableFlag = "graft.checkpoint.reliable"

  def truncate(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val reliable =
      spark.conf.getOption(ReliableFlag).exists(_.equalsIgnoreCase("true"))
    if (reliable) {
      val sc = spark.sparkContext
      if (sc.getCheckpointDir.isEmpty)
        sc.setCheckpointDir(
          TempDirs.create("graft_ckpt").toString)
      df.checkpoint()
    } else df.localCheckpoint()
  }

  /** [[truncate]] that PRESERVES the frame's physical partitioning
    * across the lineage cut. Under AQE the checkpointed LogicalRDD
    * records the adaptive plan's opaque final partitioning, so a frame
    * deliberately `repartition(key)`-ed before its cut gets RE-EXCHANGED
    * by every downstream join/aggregation on that key — observed on
    * q115, where the edge list was shuffle-written again on every
    * iteration. Materializing the cut with AQE disabled records plain
    * `HashPartitioning(key)`, which downstream ENSURE_REQUIREMENTS
    * recognizes and skips the exchange; AQE stays on for everything
    * after the cut. Use for loop-invariant relations partitioned on
    * their join key (the big side of an iterative join). */
  def truncateKeepPartitioning(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val was = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try truncate(df)
    finally spark.conf.set("spark.sql.adaptive.enabled", was)
  }
}
