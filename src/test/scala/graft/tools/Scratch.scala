package graft.tools

import org.apache.spark.sql.SparkSession

// temporary profiling scratchpad — not part of the library surface.
// Warm/cold timing for named SparkEntry queries on one box:
//   runMain graft.tools.Scratch <sfdir> <q1,q2,...> <reps>
// Prints cold (first run in this JVM) and min/median of the warm reps —
// the adjudication tool for "is this row slow or was the box busy".
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.lift(1).getOrElse("quality_nb_classify").split(",").map(_.trim)
    val reps = args.lift(2).map(_.toInt).getOrElse(5)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      graft.SparkEntry.queries.get(n) match {
        case Some(fn) =>
          def once(): Double = {
            val t0 = System.nanoTime()
            fn(spark, dir).count()
            (System.nanoTime() - t0) / 1e9
          }
          val cold = once()
          val warm = Array.fill(reps)(once()).sorted
          println(f"[scratch] $n cold $cold%.2f s  warm min ${warm.head}%.2f s" +
            f"  median ${warm(warm.length / 2)}%.2f s  max ${warm.last}%.2f s")
        case None => println(s"[scratch] unknown query '$n'")
      }
    }
    spark.stop()
  }
}
