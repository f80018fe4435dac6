package graft.core

import org.apache.spark.sql.SparkSession

/** Session factory with the settings this engine assumes.
  *
  * Local mode is a stand-in for a real cluster: shuffle partitions are sized
  * to cores (not the 200 default), AQE is on so skewed inverted lists /
  * runtime stats re-plan (SURVEY.md §4), and the timezone is pinned for
  * oracle parity.
  */
object GraftSession {
  def local(cores: Int = 32, appName: String = "graft"): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      // driver testdata stores TIMESTAMP(NANOS); Spark 4 needs this to read it
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
