package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Ranked securities-universe search (SURVEY §2.11 Q13; ref
  * app/services/universe.py:25-102) over the `part` dimension:
  * p_name plays name_display, p_brand plays yf_symbol, a p_size bucket
  * plays segment. All-expression (F1-F7): normalization, search blob,
  * containment mask, startswith/position relevance ranks, mixed-direction
  * sort, limit — no UDFs, fully codegen'd, and TakeOrderedAndProject
  * handles the top-k without a global sort at scale.
  */
object SearchQueries {

  /** _normalize_text (universe.py:17-23): strip "(publ)", collapse
    * whitespace, trim. */
  private def normalize(c: Column): Column =
    trim(regexp_replace(regexp_replace(c, "\\(publ\\)", " "), "\\s+", " "))

  def universe(spark: SparkSession, sfDir: String): DataFrame =
    Tables.part(spark, sfDir).select(
      col("p_partkey"),
      normalize(col("p_name")).as("name_display"),
      normalize(col("p_brand")).as("yf_symbol"),
      when(col("p_size") % 3 === 0, "Large")
        .when(col("p_size") % 3 === 1, "Mid")
        .otherwise("Small").as("segment"))
    .withColumn("search_blob",
      lower(concat_ws(" ", col("name_display"), col("yf_symbol"),
        regexp_replace(col("yf_symbol"), "\\.ST$", ""))))
    .withColumn("display", concat(col("name_display"), lit(" — "), col("yf_symbol")))

  /** search_by_name (universe.py:62-102) for a literal query + segment
    * filter + limit 50. Extra deterministic tie-breaks (yf_symbol,
    * p_partkey) appended — the reference relies on input order. */
  def search(spark: SparkSession, sfDir: String, query: String,
             segments: Seq[String] = Nil, limit: Int = 50): DataFrame = {
    val q = query.trim.toLowerCase
    val base = universe(spark, sfDir).filter(col("search_blob").contains(q))
      .withColumn("rank_name_starts", lower(col("name_display")).startsWith(q).cast("int"))
      .withColumn("rank_ticker_starts", lower(col("yf_symbol")).startsWith(q).cast("int"))
      .withColumn("rank_pos",
        when(instr(lower(col("name_display")), q) === 0, 9999)
          .otherwise(instr(lower(col("name_display")), q) - 1))
    val seg = if (segments.nonEmpty)
      base.filter(lower(col("segment")).isin(segments.map(_.toLowerCase): _*))
    else base
    seg.orderBy(col("rank_name_starts").desc, col("rank_ticker_starts").desc,
        col("rank_pos").asc, col("name_display").asc, col("yf_symbol").asc,
        col("p_partkey").asc)
      .limit(limit)
      .select("p_partkey", "name_display", "yf_symbol", "segment", "display")
  }

  def q13UniverseSearch(spark: SparkSession, sfDir: String): DataFrame =
    search(spark, sfDir, "ol", Seq("Large", "Mid"))

  /** One row per (doc, position, token) — the shared tokenizer for the
    * full-text pair q103/q104 (whitespace tokens, matching the corpus
    * generator and q55's vocabulary). */
  private def postings(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), posexplode(split(col("text"), " ")))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        col("col").as("token"))

  /** q103: inverted-index build — token → (document frequency, total
    * term frequency, posting-list digest). ONE shuffle on token with
    * map-side partial aggregation; the posting list (sorted (doc, pos)
    * pairs) is reduced to an md5 digest so the output stays narrow
    * while still pinning every posting exactly (the DuckDB twin
    * string_aggs the same canonical encoding). Hot tokens bound the
    * per-group state by their df — at 100 TB a posting store would be
    * segmented per (token, doc-range) bucket exactly like the sharded
    * layouts of q62/q102; the df/tf/digest statistics aggregate the
    * same way regardless. */
  def q103InvertedIndex(spark: SparkSession, sfDir: String): DataFrame =
    q103InvertedIndexFrom(Tables.documents(spark, sfDir))

  /** Index build over any (doc_id, text) frame — spec entry point. */
  def q103InvertedIndexFrom(docs: DataFrame): DataFrame =
    postings(docs)
      .groupBy("token")
      .agg(
        countDistinct("doc_id").as("df"),
        count(lit(1)).as("tf_total"),
        md5(concat_ws(",",
          transform(
            sort_array(collect_list(struct(col("doc_id"), col("pos")))),
            e => concat(e("doc_id").cast("string"), lit(":"),
              e("pos").cast("string"))))).as("postings_md5"))
      .orderBy("token")

  /** q104: BM25-style ranked retrieval for a 3-term query. Scoring is
    * the BM25 shape (k1 = 1.2, b = 0.75) with a RATIONAL idf,
    * (N − df + 0.5)/(df + 0.5), instead of Lucene's log of it: every
    * term weight is then built from IEEE divisions only (exactly
    * rounded, bit-identical across engines), so per-term weights round
    * to micro-longs and sum order-independently — the oracle is
    * bit-exact where a log would be at the mercy of two libm's last
    * ulps. Monotone per term, so per-term ranking is BM25's; the
    * cross-term mix weighs rare terms more steeply than log-idf.
    *
    * Plan: tf per (doc, term) aggregates map-side BEFORE its one
    * shuffle; df and avgdl are broadcast scalars; the final top-k is
    * TakeOrderedAndProject (no global sort). At 100 TB the term filter
    * is the q103 index's job — the scan side here plays the posting
    * source. */
  def q104Bm25TopK(spark: SparkSession, sfDir: String,
                   terms: Seq[String] = Seq("join", "scan", "window"),
                   k: Int = 20): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val toks = postings(docs)
    val dl = docs.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("dl"))
    val n = docs.count().toDouble
    val avgdl = dl.agg(sum("dl")).head.getLong(0).toDouble / n
    val tf = toks.filter(col("token").isin(terms: _*))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("token").agg(countDistinct("doc_id").as("df"))
    // constants appear as the SAME literals in the DuckDB twin — no
    // compile-time folding like (k1 + 1) whose rounding could differ
    // from the other engine's literal
    val idf = (lit(n) - col("df") + 0.5d) / (col("df") + 0.5d)
    val w = idf * (col("tf") * 2.2d) /
      (col("tf") + lit(1.2d) * (lit(0.25d) + lit(0.75d) * col("dl") / avgdl))
    // df is vocabulary-sized — sublinear in corpus but unbounded, so the
    // hint scales itself (Tables.dimBroadcast) instead of asserting
    tf.join(Tables.dimBroadcast(df), "token")
      .join(dl, "doc_id")
      .withColumn("w_micro", floor(w * 1e6 + 0.5d).cast("long"))
      .groupBy("doc_id")
      .agg(sum("w_micro").as("score_micro"), count(lit(1)).as("n_terms"))
      .orderBy(col("score_micro").desc, col("doc_id").asc)
      .limit(k)
  }

  /** q135: positional-index phrase search — "hash join" as an ADJACENT
    * token pair, not a bag-of-words conjunction. [[postings]] gives
    * each token its offset; the phrase is a self-equi-join on
    * (doc_id, pos+1) between the two terms' posting extractions, so
    * the join input is each term's posting list (sized by the rarer
    * term's df), never the full token stream — the inverted-index
    * phrase plan, where an engine without positions is forced into a
    * LIKE-scan of every document. Both posting sides prune from the
    * same scan; one shuffle on doc_id; occurrence counts per doc. */
  def q135PhraseSearch(spark: SparkSession, sfDir: String): DataFrame = {
    val pos = postings(Tables.documents(spark, sfDir))
    val first = pos.filter(col("token") === "hash")
      .select(col("doc_id"), col("pos"))
    val second = pos.filter(col("token") === "join")
      .select(col("doc_id").as("d2"), col("pos").as("p2"))
    first.join(second,
        col("doc_id") === col("d2") && col("p2") === col("pos") + 1)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_hits"))
      .orderBy("doc_id")
  }

  val oracle: Map[String, String] = Map(
    "q135_phrase_search" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |p AS (
        |  SELECT doc_id, generate_subscripts(toks, 1) AS pos,
        |         unnest(toks) AS tok
        |  FROM t)
        |SELECT a.doc_id, COUNT(*) AS n_hits
        |FROM p a JOIN p b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
        |WHERE a.tok = 'hash' AND b.tok = 'join'
        |GROUP BY a.doc_id ORDER BY a.doc_id""".stripMargin,

    "q103_inverted_index" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS l FROM documents),
        |s AS (
        |  SELECT doc_id, l, unnest(range(len(l))) AS pos FROM t),
        |p AS (
        |  SELECT doc_id, CAST(pos AS BIGINT) AS pos, l[pos + 1] AS token
        |  FROM s)
        |SELECT token, COUNT(DISTINCT doc_id) AS df, COUNT(*) AS tf_total,
        |       md5(string_agg(doc_id || ':' || pos, ','
        |                      ORDER BY doc_id, pos)) AS postings_md5
        |FROM p GROUP BY token ORDER BY token""".stripMargin,

    "q104_bm25_topk" ->
      """WITH p AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS token
        |  FROM documents),
        |dl AS (
        |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
        |  FROM documents),
        |stats AS (
        |  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
        |         (SELECT CAST(SUM(dl) AS DOUBLE) FROM dl)
        |           / CAST(COUNT(*) AS DOUBLE) AS avgdl
        |  FROM documents),
        |tf AS (
        |  SELECT doc_id, token, COUNT(*) AS tf FROM p
        |  WHERE token IN ('join', 'scan', 'window')
        |  GROUP BY doc_id, token),
        |df AS (
        |  SELECT token, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY token),
        |w AS (
        |  SELECT tf.doc_id,
        |         CAST(FLOOR(
        |           ((stats.n - df.df + 0.5) / (df.df + 0.5))
        |           * (tf.tf * 2.2)
        |           / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl))
        |           * 1000000.0 + 0.5) AS BIGINT) AS w_micro
        |  FROM tf JOIN df USING (token) JOIN dl USING (doc_id), stats)
        |SELECT doc_id, CAST(SUM(w_micro) AS BIGINT) AS score_micro,
        |       COUNT(*) AS n_terms
        |FROM w GROUP BY doc_id
        |ORDER BY score_micro DESC, doc_id ASC LIMIT 20""".stripMargin,

    "q13_universe_search" ->
      """WITH uni AS (
        |  SELECT p_partkey,
        |         trim(regexp_replace(regexp_replace(p_name, '\(publ\)', ' ', 'g'), '\s+', ' ', 'g')) AS name_display,
        |         trim(regexp_replace(regexp_replace(p_brand, '\(publ\)', ' ', 'g'), '\s+', ' ', 'g')) AS yf_symbol,
        |         CASE WHEN p_size % 3 = 0 THEN 'Large'
        |              WHEN p_size % 3 = 1 THEN 'Mid' ELSE 'Small' END AS segment
        |  FROM part),
        |blob AS (
        |  SELECT *,
        |         lower(name_display || ' ' || yf_symbol || ' ' ||
        |               regexp_replace(yf_symbol, '\.ST$', '')) AS search_blob,
        |         name_display || ' — ' || yf_symbol AS display
        |  FROM uni),
        |ranked AS (
        |  SELECT *,
        |         CAST(starts_with(lower(name_display), 'ol') AS INT) AS r1,
        |         CAST(starts_with(lower(yf_symbol), 'ol') AS INT) AS r2,
        |         CASE WHEN strpos(lower(name_display), 'ol') = 0 THEN 9999
        |              ELSE strpos(lower(name_display), 'ol') - 1 END AS r3
        |  FROM blob
        |  WHERE contains(search_blob, 'ol')
        |    AND lower(segment) IN ('large', 'mid'))
        |SELECT p_partkey, name_display, yf_symbol, segment, display
        |FROM ranked
        |ORDER BY r1 DESC, r2 DESC, r3 ASC, name_display ASC, yf_symbol ASC, p_partkey ASC
        |LIMIT 50""".stripMargin
  )
}
