package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named group of driver-contract queries. `queries` maps name →
  * (session, sfDir) → result frame; `oracles` maps the same names to
  * DuckDB-runnable SQL over views of the sfDir parquet tables. Names
  * absent from `oracles` get the driver's weaker rows-only check.
  */
trait QueryProvider {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracles: Map[String, String]
}
