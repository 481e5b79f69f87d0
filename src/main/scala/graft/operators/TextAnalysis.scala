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
}
