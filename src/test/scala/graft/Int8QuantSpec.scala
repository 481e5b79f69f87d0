package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.queries.PipelineQueries

/** Int8 embedding quantization (q100 + Similarity.int8*): the oracle
  * hash-checks the quantizer's arithmetic; these specs check the
  * quantization CONTRACT (codes in range, max element saturates, error
  * bounded by scale/2 per element) and the end-to-end ANN recall of the
  * int8 candidate pass + exact rerank against the float brute force.
  */
class Int8QuantSpec extends SparkSpec {

  test("quantized codes stay in [-127, 127] and the max element saturates") {
    val e = spark.read.parquet(PipelineQueries.ClusteredEmbFixture)
    val s = Similarity.int8Scale(col("embedding"))
    val stats = e.select(
        aggregate(Similarity.int8Quantize(col("embedding"), s), lit(0),
          (acc, q) => greatest(acc, abs(q.cast("int")))).as("maxq"))
      .agg(min("maxq").as("lo"), max("maxq").as("hi"))
      .head()
    // every vector's largest |code| is exactly the saturation point —
    // the symmetric scale maps max|x| to ±127 by construction
    assert(stats.getAs[Int]("lo") == 127 && stats.getAs[Int]("hi") == 127)
  }

  test("per-vector dequantization error is bounded by d * scale/2") {
    val audited = PipelineQueries.q100Int8Quant(spark, sf("sf0.01"))
    val bad = audited.filter(
      col("sum_abs_err_nano") > lit(64L) * col("scale_nano") / 2 + 64L)
    assert(bad.count() == 0, "rounding error exceeded the half-step bound")
    // saturation exists but is rare: the max element always saturates
    val sat = audited.agg(min("n_saturated").as("lo"), max("n_saturated").as("hi")).head()
    assert(sat.getAs[Long]("lo") >= 1L)
  }

  test("codegen'd Int8VecDot equals the HOF fold and runs inside codegen") {
    val e = spark.read.parquet(PipelineQueries.ClusteredEmbFixture)
    val s = Similarity.int8Scale(col("embedding"))
    val q = e.select(col("vec_id"), Similarity.int8Quantize(col("embedding"), s).as("q"))
    val pairs = q.as("a").crossJoin(q.as("b")).limit(2000)
      .select(Similarity.int8Dot(col("a.q"), col("b.q")).as("fast"),
        Similarity.int8DotHof(col("a.q"), col("b.q")).as("ref"))
    assert(pairs.filter(col("fast") =!= col("ref")).count() == 0)
    // self-dot over the scan: the expression itself must sit inside a
    // WholeStageCodegen span (the join-shaped frame above hides it
    // behind AQE's unfinalized plan string)
    val simple = q.select(Similarity.int8Dot(col("q"), col("q")).as("d"))
    val planStr = simple.queryExecution.executedPlan.toString
    // '*(n)' prefixes a whole-stage-codegen stage in the compact render
    assert("""\*\(\d+\) Project \[int8vecdot""".r.findFirstIn(planStr).isDefined,
      planStr)
    assert(simple.agg(min("d")).head.getLong(0) > 0L)
  }

  test("a null array element yields a null dot product, matching the HOF fold") {
    // user-facing arrays (parquet reads, SQL literals) carry
    // containsNull=true — the codegen'd kernel must propagate element
    // nulls exactly like zip_with/aggregate, not read raw buffer bytes
    val df = spark.sql(
      """SELECT array(cast(1 as tinyint), cast(null as tinyint), cast(3 as tinyint)) AS a,
        |       array(cast(4 as tinyint), cast(5 as tinyint), cast(6 as tinyint)) AS b,
        |       array(cast(1 as tinyint), cast(2 as tinyint), cast(3 as tinyint)) AS c
        |""".stripMargin)
    val r = df.select(
      Similarity.int8Dot(col("a"), col("b")).as("ab"),
      Similarity.int8DotHof(col("a"), col("b")).as("ab_ref"),
      Similarity.int8Dot(col("c"), col("b")).as("cb"),
      Similarity.int8DotHof(col("c"), col("b")).as("cb_ref")).head()
    assert(r.isNullAt(0), "null element must poison the codegen'd dot")
    assert(r.isNullAt(1), "HOF baseline sanity")
    assert(r.getLong(2) == 32L && r.getLong(3) == 32L,
      "null-free arrays must still dot normally")
  }

  test("int8 candidate pass + exact rerank reaches recall@10 >= 0.9 on the clustered corpus") {
    val e = spark.read.parquet(PipelineQueries.ClusteredEmbFixture)
    val queries = e.filter(col("vec_id") % 50 === 0)
    val exact = Similarity.bruteForceTopK(e, queries, 10)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = Similarity.int8TopK(e, queries, 10, rerank = 3)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & got).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall@10 = $recall")
  }
}
