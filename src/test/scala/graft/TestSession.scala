package graft

import org.apache.spark.sql.SparkSession

/** One SparkSession shared across all suites (sbt forks one test JVM). */
object TestSession {
  lazy val spark: SparkSession = graft.core.GraftSession.local(4, "graft-test")
  val Sf0001 = "/root/testdata/sf0.001"
  val Sf001 = "/root/testdata/sf0.01"
}
