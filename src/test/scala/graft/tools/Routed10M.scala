package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.Metric
import graft.index.RoutedHnswIndex

// temporary profiling scratchpad — not part of the library surface.
// The 10M-row routed build+serve run (VERDICT r10 stretch #9): makes the
// "per-query work constant in corpus size at fixed R" claim
// three-points-measured (100k, 1M, 10M). Distributed shapes only — at
// 10M rows the raw vectors are ~10 GiB and nothing collects to one heap.
//   SPARK_DRIVER_MEM=100g sbt "runMain graft.tools.Routed10M [n] [q] [regions]"
// Prints [row] lines plus one JSON line for the artifact.
object Routed10M {
  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toLong).getOrElse(10000000L)
    val nq = args.lift(1).map(_.toInt).getOrElse(1000)
    val truthQ = 100 // exact ground truth on a subset: flat at 10M is the cost
    val regions = args.lift(2).map(_.toInt).getOrElse(64)
    val dim = 128
    val K = 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.driver.maxResultSize", "4g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val results = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    def gcMs: Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).sum
    }
    def timed[A](name: String)(body: => A): A = {
      System.gc()
      val g0 = gcMs
      val t0 = System.nanoTime()
      val r = body
      val sec = (System.nanoTime() - t0) / 1e9
      results(s"${name}_sec") = sec
      results(s"${name}_gc_ms") = (gcMs - g0).toDouble
      println(f"[row] ${name}_sec $sec%.2f (gc ${gcMs - g0} ms)")
      r
    }

    val spec = graft.core.VectorGen.ClusteredWorldSpec.Bench
    results("world_fp") = spec.fingerprint(spark, n + nq, dim)
    val all = spec.generate(spark, n + nq, dim)
    val vec = all.where(col("id") < n).cache()
    timed("materialize")(vec.count())
    val q = all.where(col("id") >= n)
      .select(col("id").as("query_id"), col("vec").as("qvec")).cache()
    q.count()

    val shardRows = RoutedHnswIndex.deriveTargetShardRows(dim, cores = cpus)
    results("target_shard_rows") = shardRows.toDouble
    val model = timed("train")(RoutedHnswIndex.train(
      vec, regions, Metric.L2, targetShardRows = shardRows))
    results("num_shards") = model.numShards.toDouble
    val graph = timed("build") {
      val g = RoutedHnswIndex.build(vec, model).cache(); g.count(); g
    }

    // exact ground truth on the truthQ subset (recall grading)
    val qT = q.limit(truthQ).cache(); qT.count()
    val truth = timed("flat_truth") {
      graft.index.FlatIndex.knnBlocked(vec, qT, K, Metric.L2)
        .select("query_id", "neighbor_id").collect()
        .groupBy(_.getLong(0)).map { case (k2, rs) => (k2, rs.map(_.getLong(1)).toSet) }
    }
    def recallOf(res: org.apache.spark.sql.DataFrame): Double = {
      val got = res.select("query_id", "neighbor_id").collect()
        .groupBy(_.getLong(0)).map { case (k2, rs) => (k2, rs.map(_.getLong(1)).toSet) }
      val (hits, total) = truth.foldLeft((0L, 0L)) { case ((h, t), (qid, ts)) =>
        (h + got.getOrElse(qid, Set.empty[Long]).count(ts.contains), t + ts.size)
      }
      hits.toDouble / total
    }

    // raw vectors are dead weight from here (truth is computed, the
    // graph is built) — at 10M the cached frame is ~40 GB of the heap
    // the probe phases OOM'd into on the first attempt
    vec.unpersist()

    // ADVICE r11: NonFatal only — an OOM/VM error leaves a JVM whose
    // subsequent rows would look valid but mean nothing; record the
    // failure marker, then rethrow so the run dies honestly
    def safe(name: String)(body: => Unit): Unit =
      try body
      catch {
        case scala.util.control.NonFatal(e) =>
          results(s"${name}_failed") = 1.0
          println(s"[row] ${name}_failed ${e.getClass.getSimpleName}")
        case e: Throwable =>
          results(s"${name}_failed") = 1.0
          println(s"[row] ${name}_failed FATAL ${e.getClass.getSimpleName}")
          throw e
      }

    // cold batch at the R dial (the per-query work ∝ R claim at 10M),
    // plus one ef-dial point (the quality lever at fixed R — in this
    // world regions ≡ clusters, so R beyond the query's cluster adds
    // nothing and ef is what buys recall)
    if (sys.env.getOrElse("SPARK_GRAFT_10M_SKIP_COLD", "0") != "1") {
      Seq((2, 50), (4, 50), (8, 50), (4, 400)).foreach { case (r, ef) =>
        val name = if (ef == 50) s"knn_r$r" else s"knn_r${r}_ef$ef"
        safe(name) {
          val res = timed(name)(
            { val d = RoutedHnswIndex.knn(graph, model, qT, K, probeRegions = r,
                efSearch = ef).cache(); d.count(); d })
          results(s"${name}_recall") = recallOf(res)
          println(f"[row] ${name}_recall ${results(s"${name}_recall")}%.4f")
          res.unpersist()
        }
      }
    }

    // hand the graph to serving THROUGH disk (the production shape:
    // serve from the persisted index) — at 10M the cached graph frame
    // plus warm()'s resident CSR copies plus the compile transients
    // exceeded the heap when all three coexisted (first-attempt OOM);
    // parquet + unpersist leaves warm() just the decode transient and
    // the ~12 GB resident graphs
    val graphDir = "/tmp/routed10m_graph"
    val servedGraph = {
      val t0 = System.nanoTime()
      graph.write.mode("overwrite").parquet(graphDir)
      results("graph_persist_sec") = (System.nanoTime() - t0) / 1e9
      println(f"[row] graph_persist_sec ${results("graph_persist_sec")}%.2f")
      graph.unpersist()
      spark.read.parquet(graphDir)
    }

    // warm distributed serving: resident graphs, full nq batch + singles
    safe("warm_serving") {
      val server = timed("server_warm")(
        new graft.query.RoutedHnswServer(servedGraph, model).warm())
      val qArr = q.collect()
      val qDf = q
      def warmBatch(): Double = {
        val t0 = System.nanoTime()
        server.searchBatch(qDf, K, probeRegions = 8, efSearch = 50).count()
        (System.nanoTime() - t0) / 1e9
      }
      warmBatch() // warm
      val bsec = math.min(warmBatch(), warmBatch())
      results("warm_batch_qps") = nq / bsec
      val bres = server.searchBatch(qDf.limit(truthQ), K, probeRegions = 8, efSearch = 50)
      results("warm_batch_recall") = recallOf(bres)
      println(f"[row] warm_batch_qps ${nq / bsec}%.0f recall ${results("warm_batch_recall")}%.4f")
      val singles = qArr.take(200).map { row =>
        val qv = row.getSeq[Double](1).toArray
        val t0 = System.nanoTime()
        server.search(qv, K, probeRegions = 8, efSearch = 50)
        (System.nanoTime() - t0) / 1e6
      }.sorted
      results("serve_p50_ms") = singles(singles.length / 2)
      results("serve_p95_ms") = singles((singles.length * 95) / 100)
      println(f"[row] serve p50 ${results("serve_p50_ms")}%.1f ms p95 ${results("serve_p95_ms")}%.1f ms")
    }
    results("jvm_gc_total_ms") = gcMs.toDouble
    val qs = results.map { case (k2, v) =>
      s""""$k2":${if (v.isNaN || v.isInfinite) "0" else f"$v%.4f"}"""
    }.mkString("{", ",", "}")
    println(s"""{"metric":"routed_10m","n":$n,"q":$nq,"queries":$qs}""")
    spark.stop()
  }
}
