package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** The reference's universe CSV loader re-expressed
  * (ref: /root/reference/app/services/universe.py:25-60): semicolon-
  * separated, BOM-tolerant, all-string read; alias renames
  * ticker->yf_symbol, name->name_display, list->segment; hard error on
  * missing required columns; derived search_blob and display columns.
  */
object UniverseCsv {

  val RequiredCols: Seq[String] = Seq("yf_symbol", "name_display", "segment")
  val Aliases: Map[String, String] = Map(
    "ticker" -> "yf_symbol", "name" -> "name_display", "list" -> "segment")

  /** _normalize_text (universe.py:17-23). */
  def normalizeText(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    trim(regexp_replace(regexp_replace(c, "\\(publ\\)", " "), "\\s+", " "))

  /** Load + validate + derive. `sep` defaults to the reference's ';'. */
  def load(spark: SparkSession, path: String, sep: String = ";"): DataFrame = {
    val raw = spark.read
      .option("sep", sep)
      .option("header", "true")
      .option("encoding", "UTF-8") // Spark's UTF-8 reader strips the BOM
      .csv(path)
    // alias renames (case-insensitive match, only when target absent)
    val lowerCols = raw.columns.map(c => c.toLowerCase -> c).toMap
    val renamed = Aliases.foldLeft(raw) { case (df, (alias, target)) =>
      if (lowerCols.contains(alias) && !df.columns.contains(target))
        df.withColumnRenamed(lowerCols(alias), target)
      else df
    }
    val missing = RequiredCols.filterNot(renamed.columns.contains)
    if (missing.nonEmpty)
      throw new IllegalArgumentException(
        s"universe CSV $path missing columns: ${missing.mkString(", ")}; " +
          s"found: ${renamed.columns.mkString(", ")}")
    val trimmed = RequiredCols.foldLeft(renamed) { (df, c) =>
      df.withColumn(c, normalizeText(col(c).cast(StringType)))
    }
    trimmed
      .withColumn("search_blob",
        lower(concat(col("name_display"), lit(" "), col("yf_symbol"), lit(" "),
          regexp_replace(col("yf_symbol"), "\\.ST", ""))))
      .withColumn("display", concat(col("name_display"), lit(" — "), col("yf_symbol")))
      .select((RequiredCols ++ Seq("search_blob", "display")).map(col): _*)
  }

  /** Schema-stable empty frame (S2, ref etl.py:28-29): unions and
    * downstream schemas survive an empty fetch. */
  def emptyUniverse(spark: SparkSession): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType((RequiredCols ++ Seq("search_blob", "display"))
        .map(StructField(_, StringType))))
}
