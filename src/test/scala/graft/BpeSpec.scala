package graft

import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis
import graft.queries.PipelineQueries

/** BPE tokenizer contract (graft.functions.BpeEncode): the Spark
  * expression and tools/gen_bpe_fixture.py's Python encoder are two
  * INDEPENDENT implementations of the published BPE-apply semantics
  * (lowest-rank adjacent pair, all occurrences merged leftmost-greedy,
  * words = whitespace splits, symbols = code points). The fixture
  * parity test grades them against each other exactly.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def enc(text: String, merges: Seq[(String, String)]): Seq[String] =
    Seq(text).toDF("t")
      .select(TextAnalysis.bpeEncode(col("t"), merges).as("toks"))
      .collect()(0).getSeq[String](0)

  test("hand-worked merges: priority order, all occurrences, leftmost-greedy") {
    val merges = Seq(("a", "b"), ("ab", "c"), ("c", "d"))
    // rank 0 merges both ab occurrences; rank 1 then finds ab+c
    assert(enc("abcabd", merges) == Seq("abc", "ab", "d"))
    // leftmost-greedy on overlap: "aaa" under (a,a) -> [aa, a]
    assert(enc("aaa", Seq(("a", "a"))) == Seq("aa", "a"))
    // lowest rank wins even when a later rule also matches: (c,d) is
    // rank 2, (ab,c) rank 1 — "abcd" must merge ab first, then abc,
    // leaving d (abc+d is not a rule)
    assert(enc("abcd", merges) == Seq("abc", "d"))
    // untouched word: no rule applies
    assert(enc("xyz", merges) == Seq("x", "y", "z"))
    // multiple words, empties discarded
    assert(enc("  ab  cd \t ab\n", merges) == Seq("ab", "cd", "ab"))
    assert(enc("", merges) == Seq.empty)
  }

  test("token concatenation reproduces each word (nothing lost or invented)") {
    val merges = TextAnalysis.bpeMerges(spark, PipelineQueries.BpeMergesFixture)
    val docs = spark.read.parquet(PipelineQueries.BpeDocsFixture)
    val bad = docs.select(col("text"),
        concat_ws("", TextAnalysis.bpeEncode(col("text"), merges)).as("glued"),
        regexp_replace(col("text"), "\\s+", "").as("squeezed"))
      .filter(col("glued") =!= col("squeezed"))
      .count()
    assert(bad == 0, "BPE must partition each word's characters exactly")
  }

  test("q167 equals the independent Python encoder's committed answer") {
    val got = PipelineQueries.q167BpeTokens(spark, sf())
      .collect().map(_.toSeq).toSeq
    val want = spark.read.parquet(PipelineQueries.BpeExpectedFixture)
      .select(col("doc_id"), col("n_tokens"), col("tokens_str"))
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(got.nonEmpty && got == want,
      "Spark BPE must match the independent Python implementation exactly")
  }

  test("the expression runs inside whole-stage codegen") {
    // the kernel must not fall out of codegen (no CodegenFallback, no
    // interpreted HOF per element): the projection over BpeEncode
    // compiles into a WholeStageCodegen span. Over a parquet source —
    // a local Seq folds to LocalTableScan (eager interpreted eval)
    // and proves nothing about the distributed plan.
    val merges = TextAnalysis.bpeMerges(spark, PipelineQueries.BpeMergesFixture)
    val df = spark.read.parquet(PipelineQueries.BpeDocsFixture)
      .select(TextAnalysis.bpeEncode(col("text"), merges).as("toks"))
    val codegenProjects = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec
        if w.child.exists {
          case p: org.apache.spark.sql.execution.ProjectExec =>
            p.projectList.exists(_.exists(_.isInstanceOf[graft.functions.BpeEncode]))
          case _ => false
        } => w
    }
    assert(codegenProjects.nonEmpty,
      s"BpeEncode projection not inside WholeStageCodegen:\n" +
        df.queryExecution.executedPlan)
    assert(df.count() > 0)
  }
}
