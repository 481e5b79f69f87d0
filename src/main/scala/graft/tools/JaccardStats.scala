package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Candidate-volume diagnostic for the prefix-filtered Jaccard join:
  * counts — WITHOUT materializing the verify join — how many candidate
  * pairs the prefix self-join generates at a given scale, and how many
  * of them are CROSS-COPY pairs under ScaleUp's key-shift layout
  * (copy index = doc % mult). Motivation: the sf10 probe's uncapped
  * q21 run exhausted local shuffle disk twice (65 GB on string
  * shingles, then again after the xxhash64 cut), and the question
  * "is that the engine or the workload?" needs numbers, not vibes.
  * The expected answer, confirmed by this tool's output in SCALING.md:
  * word-permutation preserves a small set of permutation-invariant
  * shingles per source doc (short docs, repeated phrases), so every
  * source doc's ~mult copies share them pairwise — candidates grow
  * ~quadratically in mult while TRUE >=t pairs grow linearly. That is
  * the canonical regime where exact all-pairs similarity is
  * super-linear by nature and the capped (q39) / LSH (q22) variants
  * are the scale path.
  *
  * The count streams through one aggregate: prefix postings are
  * shuffled once (small), the pair join feeds count() directly — no
  * distinct, no verify arrays, no pair materialization on disk.
  *
  * Usage: sbt "runMain graft.tools.JaccardStats [sfDir] [threshold] [mult]"
  *        (defaults: /tmp/graft_sf10  0.8  100)
  */
object JaccardStats {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft_sf10")
    val threshold = args.drop(1).headOption.map(_.toDouble).getOrElse(0.8)
    val mult = args.drop(2).headOption.map(_.toInt).getOrElse(100)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "24")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = graft.sources.Tables.documents(spark, sfDir)
    // The stages ARE the production pipeline's (Dedup.prefixStages is
    // shared with the q21/q39 pair search), so these counts describe
    // the join q21 actually runs, not a re-implementation of it.
    val st = Dedup.prefixStages(
      Dedup.shingles(docs, "doc_id", "text"), threshold)
    val nDocs = docs.count()
    val nPostings = st.postings.count()
    val nPrefix = st.prefixPostings.count()
    // raw candidate matches (pre-distinct): the volume the candidate
    // join actually pushes into its shuffle; split by copy locality
    val raw = st.rawCandidates
      .select((pmod(col("ia"), lit(mult)) === pmod(col("ib"), lit(mult)))
        .as("same_copy"))
      .groupBy("same_copy").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getBoolean(0) -> r.getLong(1)).toMap
    val sameCopy = raw.getOrElse(true, 0L)
    val crossCopy = raw.getOrElse(false, 0L)
    println(
      s"""{"sf_dir":"$sfDir","threshold":$threshold,"mult":$mult,
         |"docs":$nDocs,"postings":$nPostings,"prefix_postings":$nPrefix,
         |"raw_candidates_same_copy":$sameCopy,
         |"raw_candidates_cross_copy":$crossCopy}"""
        .stripMargin.replace("\n", ""))
    spark.stop()
  }
}
