package graft.tools

import java.nio.file.{Files, Paths}

import graft.SparkEntry

/** Dump `.explain("formatted")` for declared queries to files — the plan
  * evidence for the optimization rounds (plans/rNN/<query>_{before,after}.txt).
  *
  * Usage: Test/runMain graft.tools.ExplainDump <sfDir> <outDir> <suffix> [names]
  *   names: comma-separated query names, or "all" (default)
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val names: Seq[String] =
      if (args.length < 4 || args(3) == "all") SparkEntry.queries.keys.toSeq.sorted
      else args(3).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.core.GraftSession.local(cpus, "graft-explain")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case Some(fn) =>
          try {
            val plan = fn(spark, sfDir).queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
            Files.writeString(Paths.get(s"$outDir/${name}_$suffix.txt"), plan)
            println(s"[explain] $name -> $outDir/${name}_$suffix.txt")
          } catch {
            case e: Throwable =>
              System.err.println(s"[explain] $name FAILED: ${e.getMessage}")
          }
        case None => System.err.println(s"[explain] unknown query $name")
      }
    }
    spark.stop()
  }
}
