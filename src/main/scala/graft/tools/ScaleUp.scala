package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-probe data generator: replicate the driver-provided testdata
  * `mult`× into a sibling layout, so the heavy queries can be timed at
  * ~sf1 (the next scale notch) without touching the read-only
  * testdata. The replication is SEMANTIC, not a blind union — blind
  * copies would distort the workload's complexity class:
  *
  *  - every join/group key is shifted per copy (`key·mult + i`), on
  *    BOTH sides of each relationship, so copies are disjoint
  *    subuniverses: per-key group sizes, join fan-outs, graph degrees
  *    and sessions-per-user stay exactly sf0.1-shaped while totals
  *    grow 10× — which is what a real 10× corpus looks like;
  *  - document TEXT is word-permuted per copy (deterministic per-copy
  *    shuffle): vocabulary and length stats survive (lang-ID, quality,
  *    token counts), but shingles decorrelate, so near-dup pair counts
  *    scale ~linearly as in a real corpus — naive text copies would
  *    make every cross-copy pair a duplicate and turn LSH verification
  *    quadratic, probing a workload that does not exist;
  *  - embedding VECTORS are stride-permuted per copy (a fixed
  *    coprime-stride index permutation): component distributions
  *    survive, cross-copy cosines drop, so ANN/near-dup candidate sets
  *    scale like a grown corpus;
  *  - events keep their real time span (10× users in the same window —
  *    parallel tenants, not a stretched history), so watermarks and
  *    session gaps behave identically;
  *  - dimension tables that are fixed-size in TPC-H (nation, region)
  *    are copied as-is: dims stay dims.
  *
  * A 4th arg `salt` switches documents to DISJOINT-VOCABULARY
  * replication: copy 0 keeps the text VERBATIM; copy c>0 tags every
  * word with the copy index (`w#c`). Each copy is then an exact
  * structural replica of the source corpus (same within-copy document
  * frequencies, duplicate groups, window repeats, shingle statistics)
  * sharing ZERO vocabulary with any other copy — the "10 parallel
  * tenants" shape of a really-grown corpus. Two uses:
  *  - replication-free decade probes: any super-linear scaling left on
  *    this fixture is a plan property, not a cross-copy artifact of the
  *    word permutation (which preserves word BAGS, so copies still
  *    collide on hot words/bands with small probability);
  *  - copy-closed sampled-key oracle twins (tools/sampled_compare.py)
  *    for the corpus-statistic operators: df-caps (q39/q48/q59/q51),
  *    duplicated-window detection (q165/q166) and LSH banding
  *    (q22/q124) are closed under the copy-0 restriction ONLY when no
  *    shingle/window/band value can cross copies — which the word
  *    permutation makes merely unlikely, and the salt makes impossible
  *    by construction.
  *
  * Usage: sbt "runMain graft.tools.ScaleUp [src] [dst] [mult] [salt]"
  *        (defaults: /root/testdata/sf0.1  /tmp/graft_sf1  10  off)
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val dst = args.drop(1).headOption.getOrElse("/tmp/graft_sf1")
    val mult = args.drop(2).headOption.map(_.toInt).getOrElse(10)
    val saltVocab = args.drop(3).headOption.contains("salt")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def raw(t: String): DataFrame = spark.read.parquet(s"$src/$t.parquet")

    // one row per (source row, copy index); the copy column drives the
    // key shifts and the per-copy permutations below
    def copies(df: DataFrame): DataFrame = df
      .withColumn("_c", explode(lit((0 until mult).toArray)))

    def shift(c: String): org.apache.spark.sql.Column =
      col(c) * mult + col("_c")

    def write(df: DataFrame, t: String): Unit = {
      df.drop("_c").write.mode("overwrite").parquet(s"$dst/$t.parquet")
      println(s"scaled $t")
    }

    write(copies(raw("lineitem"))
      .withColumn("l_orderkey", shift("l_orderkey"))
      .withColumn("l_partkey", shift("l_partkey"))
      .withColumn("l_suppkey", shift("l_suppkey")), "lineitem")
    write(copies(raw("orders"))
      .withColumn("o_orderkey", shift("o_orderkey"))
      .withColumn("o_custkey", shift("o_custkey")), "orders")
    write(copies(raw("customer"))
      .withColumn("c_custkey", shift("c_custkey")), "customer")
    write(copies(raw("supplier"))
      .withColumn("s_suppkey", shift("s_suppkey")), "supplier")
    write(copies(raw("part"))
      .withColumn("p_partkey", shift("p_partkey")), "part")
    Seq("nation", "region").foreach(t => write(raw(t), t))

    write(copies(raw("events"))
      .withColumn("event_id", shift("event_id"))
      .withColumn("user_id", shift("user_id")), "events")

    // salt: copy-tagged vocabulary (exact structural replica per copy,
    // zero cross-copy term sharing; copy 0 verbatim). default: word
    // permutation — stable sort of (hash(word, position, copy), word) —
    // same bag of words, unrecognizable n-grams across copies
    val textExpr =
      if (saltVocab) expr(
        // empty tokens (consecutive spaces) stay empty in EVERY copy —
        // tagging them would mint bare '#c' words that copy 0 lacks,
        // breaking the exact-structural-replica property the decade
        // probe's argument rests on
        """concat_ws(' ', transform(split(text, ' '),
          |  w -> if(_c = 0 or w = '', w, concat(w, '#', _c))))""".stripMargin)
      else expr(
        """concat_ws(' ', transform(
          |  array_sort(zip_with(
          |    split(text, ' '),
          |    sequence(1, size(split(text, ' '))),
          |    (w, i) -> struct(xxhash64(w, i, _c) as h, w as w))),
          |  s -> s.w))""".stripMargin)
    write(copies(raw("documents"))
      .withColumn("doc_id", shift("doc_id"))
      .withColumn("text", textExpr)
      .withColumn("n_chars", length(col("text"))), "documents")

    // stride permutation of components: copy c reads index (j*s_c) mod d
    // with s_c odd (coprime with the even dim), so copy 0 keeps the
    // original layout and later copies decorrelate
    write(copies(raw("embeddings"))
      .withColumn("vec_id", shift("vec_id"))
      .withColumn("embedding", expr(
        """transform(sequence(0, size(embedding) - 1),
          |  j -> element_at(embedding,
          |         int((j * (2 * _c + 1)) % size(embedding)) + 1))""".stripMargin)),
      "embeddings")

    spark.stop()
  }
}
