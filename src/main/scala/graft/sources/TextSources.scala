package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{FloatType, DoubleType}

/** Text/CSV ingestion surfaces (SURVEY.md S4/S5, mirroring the reference
  * example app's loaders, examples/kaggle_foodpanda_reviews/main.go).
  */
object TextSources {

  /** CSV of floats → (id, vec ARRAY<DOUBLE>) by line order within each
    * file (loadCSVEmbeddings, main.go:26-48). At scale, ship ids in the
    * data instead — positional ids are only stable per file. */
  def csvEmbeddings(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.text(path)
    raw
      .select(split(col("value"), ",").as("cells"))
      .where(size(col("cells")) > 0 && trim(col("cells")(0)) =!= "")
      .select(transform(col("cells"), c => trim(c).cast(DoubleType)).as("vec"))
      .withColumn("id", monotonically_increasing_id())
      .select(col("id"), col("vec"))
  }

  /** " | "-delimited review lines → (id, text, restaurant, cuisine,
    * city); malformed lines (≠ 4 fields) dropped, field prefixes
    * stripped (loadTexts, main.go:51-83). */
  def delimitedReviews(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.text(path)
    raw
      .select(split(col("value"), " \\| ").as("f"))
      .where(size(col("f")) === 4) // P6: malformed-line skip (main.go:64-67)
      .select(
        monotonically_increasing_id().as("id"),
        col("f")(0).as("text"),
        regexp_replace(col("f")(1), "^Restaurant: ", "").as("restaurant"),
        regexp_replace(col("f")(2), "^Cuisine: ", "").as("cuisine"),
        regexp_replace(col("f")(3), "^City: ", "").as("city"))
  }
}
