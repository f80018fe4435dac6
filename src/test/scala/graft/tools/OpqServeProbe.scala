package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.Metric
import graft.index.{OpqIndex, PqIndex}

/** Isolation probe for VERDICT r11 wrong #1: serve_opq read 85-96 ms vs
  * serve_pq's 19 ms in BOTH the driver artifact and the clean r11c
  * snapshot, while the in-process twins sit at parity — implicating the
  * bench SECTION's heap state, not the serving path. This main rebuilds
  * the two serving stacks in a fresh JVM with NOTHING else cached and
  * times them back to back; if they read at parity here, the bench-side
  * cache hygiene (blocking release before the timed window) is the whole
  * fix and the OpqServer/PqServer kernels need no work.
  *
  * Run: sbt "Test/runMain graft.tools.OpqServeProbe [n] [nq]"
  */
object OpqServeProbe {
  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toLong).getOrElse(100000L)
    val nq = args.lift(1).map(_.toInt).getOrElse(200)
    val dim = 128
    val K = 10
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val vectors = graft.core.VectorGen.random(spark, n, dim, seed = 11L).cache()
    vectors.count()
    val queries = graft.core.VectorGen.random(spark, nq.toLong, dim, seed = 12L)
      .select(col("id").as("query_id"), col("vec").as("qvec"))
    val singles = queries.collect().map(_.getSeq[Double](1).toArray)

    val train = vectors.limit(5000).cache(); train.count()
    val pqModel = PqIndex.train(train, m = 16, nbits = 8, Metric.L2)
    val opqModel = OpqIndex.train(train, m = 16, nbits = 8, Metric.L2)
    val pqCodes = PqIndex.encode(vectors, pqModel).cache(); pqCodes.count()
    val opqCodes = OpqIndex.encode(vectors, opqModel).cache(); opqCodes.count()

    def p(times: Array[Double], q: Double) =
      times.sorted.apply(math.min(times.length - 1, (q * times.length).toInt))
    def run(name: String)(call: Array[Double] => Unit): Unit = {
      call(singles.head); call(singles.head)
      System.gc()
      val ts = singles.map { q =>
        val t0 = System.nanoTime(); call(q); (System.nanoTime() - t0) / 1e6
      }
      println(f"[probe] $name p50=${p(ts, 0.5)}%.1f ms p95=${p(ts, 0.95)}%.1f ms")
    }

    println(s"[probe] pqCodes parts=${pqCodes.rdd.getNumPartitions} " +
      s"opqCodes parts=${opqCodes.rdd.getNumPartitions}")

    // order matters for a contamination read: pq, opq, then pq again
    val pqServer = new graft.query.PqServer(pqCodes, pqModel).warm()
    run("serve_pq_1")(q => pqServer.search(q, K))
    val opqServer = new graft.query.OpqServer(opqCodes, opqModel).warm()
    run("serve_opq")(q => opqServer.search(q, K))
    run("serve_pq_2")(q => pqServer.search(q, K))
    // layout-vs-rotation split: the SAME PqServer kernel directly on the
    // OPQ codes frame (unrotated queries — wrong results, right cost)
    val pqOnOpq = new graft.query.PqServer(opqCodes, opqModel.pq).warm()
    run("serve_pq_on_opqcodes")(q => pqOnOpq.search(q, K))
    pqOnOpq.unpersist()
    opqServer.unpersist(); pqServer.unpersist()
    spark.stop()
  }
}
