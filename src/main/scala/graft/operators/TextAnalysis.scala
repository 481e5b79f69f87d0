package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: token counting,
  * quality scoring, stopword-based language ID, and bottom-k document
  * fingerprinting. All pure column expressions (codegen'd, no UDFs) and
  * all replicable in the DuckDB oracle.
  */
object TextAnalysis {

  /** Per-language stopword lists for the n-gram/stopword language-ID
    * heuristic. Deterministic, tiny, broadcast as literals. */
  val stopwords: Map[String, Seq[String]] = Map(
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "ein", "mit"),
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is", "for", "on", "with"),
    "es" -> Seq("el", "la", "y", "de", "que", "los", "es", "un"),
    "fr" -> Seq("le", "la", "et", "les", "des", "est", "un", "une"),
    "zh" -> Seq("的", "是", "在", "了", "和", "有"))

  private def tokCount(tokens: Column, words: Seq[String]): Column = {
    val lst = array(words.map(lit): _*)
    size(filter(tokens, t => array_contains(lst, t)))
  }

  /** Tokenization stats + quality score per document.
    * Columns appended: n_tokens, n_bpe_tokens (regex word/number/punct
    * pieces), avg_token_len, stop_ratio (English), digit_ratio,
    * quality_score. */
  def textStats(docs: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    docs
      .withColumn("tok", split(t, " "))
      .withColumn("n_tokens", size(col("tok")).cast("long"))
      .withColumn("n_bpe_tokens",
        size(expr(s"regexp_extract_all($textCol, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)")).cast("long"))
      .withColumn("avg_token_len",
        (length(t) - (col("n_tokens") - 1)).cast("double") / col("n_tokens"))
      .withColumn("stop_ratio",
        tokCount(col("tok"), stopwords("en")).cast("double") / col("n_tokens"))
      .withColumn("digit_ratio",
        (length(t) - length(regexp_replace(t, "[0-9]", ""))).cast("double") / length(t))
      .withColumn("quality_score",
        col("stop_ratio") * 0.5 + lit(1.0) / (lit(1.0) + abs(col("avg_token_len") - 5.0)) * 0.5)
      .drop("tok")
  }

  /** Stopword-vote language ID. Ties resolve to the alphabetically first
    * language (deterministic). Appends lang_pred + per-language scores. */
  def languageId(docs: DataFrame, textCol: String): DataFrame = {
    val withTok = docs.withColumn("tok", split(col(textCol), " "))
    val scored = stopwords.keys.toSeq.sorted.foldLeft(withTok) { (df, lang) =>
      df.withColumn(s"score_$lang", tokCount(col("tok"), stopwords(lang)))
    }
    val langs = stopwords.keys.toSeq.sorted
    // alphabetical-priority argmax: first lang whose score >= all others
    val pred = langs.foldRight(lit(langs.last)) { (lang, rest) =>
      val ge = langs.filter(_ != lang)
        .map(o => col(s"score_$lang") >= col(s"score_$o"))
        .reduce(_ && _)
      when(ge, lit(lang)).otherwise(rest)
    }
    scored.withColumn("lang_pred", pred).drop("tok")
  }

  /** PII redaction patterns — written in the common subset of Java
    * regex and RE2 (no backrefs, no lookaround) so the engine and the
    * DuckDB oracle compile the exact same automata. Order matters:
    * emails first (their local part can contain digits a later pass
    * would mangle), then international-format phones (anchored on the
    * leading '+', so ordinary digit runs survive), then IPv4s. */
  val piiPatterns: Seq[(String, String)] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "<EMAIL>",
    "\\+[0-9][0-9 -]{6,}[0-9]" -> "<PHONE>",
    "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b" -> "<IP>")

  /** Scrub PII from a text column: sequential regexp_replace passes,
    * all codegen'd — the preprocessing step every shared training
    * corpus runs, and at 100 TB it must stay a pure map (no shuffle,
    * no UDF serialization): this is scan → replace → write. */
  def redactPii(text: Column): Column =
    piiPatterns.foldLeft(text) { case (c, (pat, tag)) =>
      regexp_replace(c, pat, tag)
    }

  /** Gopher-style repetition metrics per document — the quality rules
    * that catch boilerplate and degenerate generations: type-token
    * ratio (distinct/total tokens), most-common-token mass, duplicate
    * bigram fraction, and alphabetic-token fraction. One explode + two
    * aggregations (token counts per doc, then doc rollup); bigram
    * stats are pure array expressions on the already-split tokens —
    * no UDFs, everything codegen'd. Thresholds are the caller's
    * policy; this computes the signals. */
  def repetitionStats(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val base = docs
      .withColumn("tok", split(col(textCol), " "))
      .withColumn("n", size(col("tok")))
      .filter(col("n") >= 1)
      // sequence(0, -1) would generate a DESCENDING [0, -1], not empty —
      // guard single-token docs explicitly
      .withColumn("bi", when(col("n") >= 2, expr(
          "transform(sequence(0, size(tok)-2), i -> concat_ws(' ', tok[i], tok[i+1]))"))
        .otherwise(expr("cast(array() as array<string>)")))
      .withColumn("n_bi", size(col("bi")))
    val perTok = base
      .select(col(idCol).as("doc"), explode(col("tok")).as("t"))
      .groupBy("doc", "t").agg(count(lit(1)).as("tf"))
      .groupBy("doc").agg(
        max(col("tf")).as("top_tf"),
        count(lit(1)).as("n_distinct"),
        sum(when(col("t").rlike("^[A-Za-z]+$"), col("tf")).otherwise(0L)).as("n_alpha"))
    base.select(col(idCol).as("doc"), col("n"), col("n_bi"),
        size(array_distinct(col("bi"))).as("n_bi_distinct"))
      .join(perTok, "doc")
      .select(col("doc"),
        (col("n_distinct").cast("double") / col("n")).as("type_token_ratio"),
        (col("top_tf").cast("double") / col("n")).as("top_token_mass"),
        when(col("n_bi") > 0,
          lit(1.0) - col("n_bi_distinct").cast("double") / col("n_bi"))
          .otherwise(lit(0.0)).as("dup_bigram_frac"),
        (col("n_alpha").cast("double") / col("n")).as("alpha_ratio"))
  }

  /** Bottom-k fingerprint: the k lexicographically smallest md5 values
    * of the document's distinct 3-gram shingles, concatenated. Stable
    * under shingle order, replicable in SQL, and usable as a cheap
    * containment sketch. The aggregation is the custom BottomK
    * TypedImperativeAggregate — O(k) state per document with map-side
    * partials, instead of collecting every shingle hash and slicing. */
  def fingerprint(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame =
    Dedup.shingles(docs, idCol, textCol)
      .select(col("doc"), md5(col("sh")).as("h"))
      .groupBy("doc")
      .agg(concat_ws("", graft.functions.BottomK.bottomK(col("h"), k)).as("fingerprint"))

  /** BPE tokenization under an ordered merge list — real-tokenizer
    * token budgets instead of whitespace counts (the two diverge 2-5×
    * on real text, and training-data budgets are set in BPE tokens).
    * Semantics + physical shape: [[graft.functions.BpeEncode]] (a
    * codegen'd expression; the merge table rides the plan once per
    * stage). Returns array<string>. */
  def bpeEncode(text: Column, merges: Seq[(String, String)]): Column =
    graft.functions.BpeEncode.bpe(text, merges)

  /** Load an ordered merge list from a (rank, left, right) parquet —
    * the published merges.txt format's columns. Driver-side collect is
    * bounded by the vocabulary (50k rules for GPT-2 — a dimension
    * table, same class as the broadcast centroid matrix). */
  def bpeMerges(spark: org.apache.spark.sql.SparkSession,
                path: String): Seq[(String, String)] =
    spark.read.parquet(path).orderBy("rank")
      .select("left", "right").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
}
