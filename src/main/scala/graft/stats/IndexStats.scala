package graft.stats

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.IndexIO

/** Index statistics (reference Stats surface, SURVEY.md A3/A4):
  * row counts, dimension, on-disk bytes, config echo, and per-list skew
  * stats for IVF kinds (GetListSizes, ivf.go:227-236).
  */
object IndexStats {

  private def dirBytes(p: Path): Long =
    if (!Files.exists(p)) 0L
    else {
      val s = Files.walk(p)
      try s.filter(Files.isRegularFile(_)).mapToLong(Files.size(_)).sum
      finally s.close()
    }

  /** One-row stats frame for a persisted index. */
  def forPath(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val meta = IndexIO.readMeta(path)
    val table = Seq("vectors", "codes", "graph")
      .find(t => Files.exists(Paths.get(path, t)))
      .getOrElse(throw new IllegalArgumentException(s"no index table under $path"))
    val rows = spark.read.parquet(s"$path/$table").count()
    val bytes = dirBytes(Paths.get(path))
    Seq((
      rows, meta.getOrElse("dim", "0").toInt, meta("index_type"),
      bytes, bytes / (1024.0 * 1024.0),
      meta.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" }.mkString(",")))
      .toDF("total_vectors", "dimension", "index_type",
        "storage_bytes", "storage_mb", "extra_info")
  }

  /** Inverted-list size distribution — the skew signal that decides
    * salting / AQE needs at scale (ivf.go:227-236). */
  def listSizes(assigned: DataFrame): DataFrame =
    assigned.groupBy("cluster_id").agg(count(lit(1)).as("list_size"))

  def listSizeSummary(assigned: DataFrame): DataFrame =
    listSizes(assigned).agg(
      count(lit(1)).as("n_lists"),
      min(col("list_size")).as("min_size"),
      max(col("list_size")).as("max_size"),
      round(avg(col("list_size")), 2).as("avg_size"))
}
