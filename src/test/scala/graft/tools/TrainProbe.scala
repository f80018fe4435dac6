package graft.tools

import org.apache.spark.sql.functions._

import graft.core.Metric
import graft.index._

/** Timing probe for the driver-local trainers at the bench shape
  * (5000 × 128-d sample, m=16/nbits=8, nlist=316) — the r12 optimization
  * round's before/after evidence for the DriverPar assignment fan-out.
  * Also splits opq_build_sec into train vs encode.
  */
object TrainProbe {
  def t[A](name: String)(body: => A): A = {
    val t0 = System.nanoTime()
    val r = body
    println(f"[train-probe] $name%-32s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.core.GraftSession.local(cpus, "graft-trainprobe")
    val n = 100000L
    val dim = 128
    val vec = spark.range(n).select(col("id"),
      transform(sequence(lit(0), lit(dim - 1)),
        i => pmod(xxhash64(col("id"), i, lit(0L)), lit(1000003L)).cast("double") / 1000003.0).as("vec"))
      .cache()
    vec.count()
    val train = vec.limit(5000).cache(); train.count()
    println(s"[train-probe] width=${DriverPar.width()}")
    // warm JIT
    t("warm ivf.train(64)")(IvfIndex.train(train, 64, Metric.L2))
    t("IvfIndex.train nlist=316")(IvfIndex.train(train, 316, Metric.L2))
    t("PqIndex.train m16 nbits8")(PqIndex.train(train, 16, 8, Metric.L2))
    val opq = t("OpqIndex.train m16 nbits8")(OpqIndex.train(train, 16, 8, Metric.L2))
    t("IvfPqIndex.train nlist316")(IvfPqIndex.train(train, 316, 16, 8, Metric.L2))
    t("OpqIvfPqIndex.train")(OpqIvfPqIndex.train(train, 316, 16, 8, Metric.L2))
    t("OpqIndex.encode 100k")({ val c = OpqIndex.encode(vec, opq).cache(); c.count(); c.unpersist() })
    val pq = PqIndex.train(train, 16, 8, Metric.L2)
    t("PqIndex.encode 100k")({ val c = PqIndex.encode(vec, pq).cache(); c.count(); c.unpersist() })
    spark.stop()
  }
}
