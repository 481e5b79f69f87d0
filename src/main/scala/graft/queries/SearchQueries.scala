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

  val oracle: Map[String, String] = Map(
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
