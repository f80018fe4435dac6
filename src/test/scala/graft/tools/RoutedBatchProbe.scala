package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.Metric
import graft.index.{HnswIndex, RoutedHnswIndex}

// temporary profiling scratchpad — not part of the library surface.
// Isolates the clustered-world in-process batch triplet (all-shard
// fan-out vs routed vs replicated-routed) at the bench protocol so the
// new rows can be adjudicated without a full bench pass:
//   runMain graft.tools.RoutedBatchProbe [n] [q] [regions]
object RoutedBatchProbe {
  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toLong).getOrElse(100000L)
    val nq = args.lift(1).map(_.toInt).getOrElse(1000)
    val regions = args.lift(2).map(_.toInt).getOrElse(32)
    val dim = 128
    val K = 10
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      // the probe's whole point is the single-heap serving shape at 1M —
      // the graph collect is ~1.2 GiB and the 56g driver holds it fine
      .config("spark.driver.maxResultSize", "8g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val all = graft.core.VectorGen.clusteredBridged(
      spark, n + nq, dim, 64, spread = 0.3, bridgeFrac = 0.25, seed = 23L)
    val cvec = all.where(col("id") < n).cache(); cvec.count()
    val cq = all.where(col("id") >= n)
      .select(col("id").as("query_id"), col("vec").as("qvec")).cache(); cq.count()

    val cFlat = graft.index.FlatIndex.knnBlocked(cvec, cq, K, Metric.L2)
    val truth = cFlat.select("query_id", "neighbor_id").collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => (q, rs.map(_.getLong(1)).toSet) }
    val cqArr = cq.collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val cqVecs = cqArr.map(_._2)
    def recall(out: Array[Array[(Long, Double, Int)]]): Double = {
      var hits = 0L; var total = 0L
      cqArr.indices.foreach { i =>
        val t = truth(cqArr(i)._1)
        total += t.size
        hits += out(i).count { case (id, _, _) => t.contains(id) }
      }
      hits.toDouble / total
    }
    def bench(name: String)(body: => Array[Array[(Long, Double, Int)]]): Unit = {
      var out = body // warm
      val secs = Array.fill(3) {
        val t0 = System.nanoTime(); out = body; (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $name qps ${nq / secs.min}%.0f  recall ${recall(out)}%.4f")
    }

    val shardRows = math.max(1000L, math.min(
      RoutedHnswIndex.deriveTargetShardRows(dim, cores = 32), n / regions))

    val t0 = System.nanoTime()
    val hg = HnswIndex.build(cvec, regions, Metric.L2).cache(); hg.count()
    println(f"[probe] fanout build ${(System.nanoTime() - t0) / 1e9}%.1f s")
    val fan = new graft.query.LocalHnswServer(hg, Metric.L2, regions)
    bench("fanout_batch")(fan.searchBatch(cqVecs, K, efSearch = 50))
    locally {
      val blk = HnswIndex.knnBlocked(hg, cq, K, Metric.L2, efSearch = 50,
        numShards = regions).select("query_id", "neighbor_id").collect()
      var hits = 0L; var total = 0L
      blk.groupBy(_.getLong(0)).foreach { case (q, rs) =>
        val t = truth(q); total += t.size
        hits += rs.count(r => t.contains(r.getLong(1)))
      }
      println(f"[probe] fanout_blocked recall ${hits.toDouble / total}%.4f")
    }
    hg.unpersist()

    val model = RoutedHnswIndex.train(cvec, regions, Metric.L2, targetShardRows = shardRows)
    val t1 = System.nanoTime()
    val cg = RoutedHnswIndex.build(cvec, model).cache(); cg.count()
    println(f"[probe] routed build ${(System.nanoTime() - t1) / 1e9}%.1f s")
    val routed = new graft.query.LocalRoutedHnswServer(cg, model)
    Seq(1, 2, 4).foreach { r =>
      bench(s"routed_batch_r$r")(routed.searchBatch(cqVecs, K, probeRegions = r, efSearch = 50))
    }
    cg.unpersist()

    val (crModel, crg0) = RoutedHnswIndex.buildReplicatedBalanced(
      cvec, model, eps = 0.6, maxReplicas = 2, targetShardRows = shardRows)
    val crg = crg0.cache(); crg.count()
    println(f"[probe] blowup ${crg.count().toDouble / n}%.4f")
    val rep = new graft.query.LocalRoutedHnswServer(crg, crModel)
    Seq(2, 4).foreach { r =>
      bench(s"rep_batch_r$r")(rep.searchBatch(cqVecs, K, probeRegions = r, efSearch = 50))
    }
    spark.stop()
  }
}
