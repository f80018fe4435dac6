package graft

/** Per-query wall-clock probe: run named `SparkEntry.queries` entries
  * against one sf dir and print each `count()` time — the local
  * iteration loop for chasing a single slow headline row without paying
  * for a full `graft.Bench` run.
  *
  * Usage: runMain graft.TimeQuery <sfDir> <name>[,<name>...] [reps]
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val reps = if (args.length > 2) args(2).toInt else 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.core.GraftSession.local(cpus, "graft-timequery")
    for (name <- names; r <- 1 to reps) {
      val fn = SparkEntry.queries.getOrElse(name,
        throw new IllegalArgumentException(s"unknown query: $name"))
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"TIME $name%s rep=$r%d rows=$n%d sec=$sec%.3f")
    }
    spark.stop()
  }
}
