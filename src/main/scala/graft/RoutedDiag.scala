package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Metric
import graft.index.{FlatIndex, HnswIndex, RoutedHnswIndex}

/** Focused routed-HNSW diagnosis on the bridged-cluster distribution —
  * the two questions VERDICT r8 left open, answerable without a full
  * bench run:
  *
  *  1. R-dial attribution: recall over the R × efSearch grid. If recall
  *     is flat in R but climbs in efSearch, the plateau is per-shard
  *     WALK depth; if flat in both, the residual misses are boundary
  *     mass (replication's job — measured by the replicated rows).
  *  2. GC attribution: per-PHASE gc_ms/wall (train, build, search,
  *     replicated build) instead of one section-wide number — the
  *     VERDICT r8 #3 bar ("build gc < 10% of build wall") needs the
  *     build phases isolated from the cached-search phases.
  *
  * Env: SPARK_GRAFT_BENCH_N (default 1,000,000), SPARK_GRAFT_BENCH_Q
  * (default 1,000), SPARK_GRAFT_CPUS. Prints one JSON line.
  */
object RoutedDiag {

  private def gcTotalMs: Long = {
    val it = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans.iterator()
    var total = 0L
    while (it.hasNext) { total += it.next().getCollectionTime }
    total
  }

  private def time[A](body: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val r = body
    (r, (System.nanoTime() - t0) / 1e9)
  }

  /** Wall + gc over a phase, with a controlled collection BEFORE so the
    * phase doesn't inherit the previous phase's garbage. */
  private def phase[A](results: scala.collection.mutable.LinkedHashMap[String, Double],
      name: String)(body: => A): A = {
    System.gc()
    val gc0 = gcTotalMs
    val (r, sec) = time(body)
    results(s"${name}_wall_sec") = sec
    results(s"${name}_gc_ms") = (gcTotalMs - gc0).toDouble
    results(s"${name}_gc_frac") = (gcTotalMs - gc0) / 1000.0 / math.max(1e-9, sec)
    r
  }

  private def recallVs(flat: DataFrame, approx: DataFrame): Double = {
    val total = flat.count()
    val hits = flat.select("query_id", "neighbor_id")
      .join(approx.select("query_id", "neighbor_id"), Seq("query_id", "neighbor_id"))
      .count()
    hits.toDouble / total
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val n = sys.env.getOrElse("SPARK_GRAFT_BENCH_N", "1000000").toLong
    val q = sys.env.getOrElse("SPARK_GRAFT_BENCH_Q", "1000").toLong
    val dim = 128
    val k = 10
    val regions = 32
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val results = scala.collection.mutable.LinkedHashMap[String, Double]()
    results("n") = n.toDouble

    // same distribution + params as the bench's hnsw_routed_clustered
    val all = graft.core.VectorGen.clusteredBridged(
      spark, n + q, dim, 64, spread = 0.3, bridgeFrac = 0.25, seed = 23L)
    val vecs = all.where(col("id") < n).cache(); vecs.count()
    val queries = all.where(col("id") >= n)
      .select(col("id").as("query_id"), col("vec").as("qvec")).cache()
    queries.count()
    val flat = phase(results, "flat_truth") {
      val f = FlatIndex.knnBlocked(vecs, queries, k, Metric.L2).cache()
      f.count(); f
    }

    val shardRows = math.max(1000L, math.min(
      RoutedHnswIndex.deriveTargetShardRows(dim, cores = cpus.toInt),
      n / regions))
    results("target_shard_rows") = shardRows.toDouble
    val model = phase(results, "train") {
      RoutedHnswIndex.train(vecs, regions, Metric.L2, targetShardRows = shardRows)
    }
    val graph = phase(results, "build") {
      val g = RoutedHnswIndex.build(vecs, model).cache(); g.count(); g
    }
    // the R × efSearch grid — one warmed, gc-collected run per cell
    for (r <- Seq(1, 2, 4); ef <- Seq(50, 200)) {
      val res = phase(results, s"search_r${r}_ef$ef") {
        val d = RoutedHnswIndex.knn(graph, model, queries, k,
          probeRegions = r, efSearch = ef).cache()
        d.count(); d
      }
      results(s"recall_r${r}_ef$ef") = recallVs(flat, res)
      res.unpersist()
    }
    graph.unpersist()

    // replication-aware balance (VERDICT r9 #5): the closure build
    // multiplies region mass, so shards are re-split from REPLICATED
    // counts at the same heap-derived cap — serving routes with the
    // returned model (shard offsets moved)
    val (repModel, rep) = phase(results, "build_replicated") {
      val (m2, g0) = RoutedHnswIndex.buildReplicatedBalanced(
        vecs, model, eps = 0.6, maxReplicas = 2, targetShardRows = shardRows)
      val g = g0.cache(); g.count(); (m2, g)
    }
    results("replicated_blowup") = rep.count().toDouble / n
    for (r <- Seq(2, 4); ef <- Seq(50, 200)) {
      val res = phase(results, s"search_rep_r${r}_ef$ef") {
        val d = RoutedHnswIndex.knn(rep, repModel, queries, k,
          probeRegions = r, efSearch = ef).cache()
        d.count(); d
      }
      results(s"recall_rep_r${r}_ef$ef") = recallVs(flat, res)
      res.unpersist()
    }
    rep.unpersist()

    // the dial that KEEPS working once the R-dial saturates: wider
    // closure replication (more runner-up regions, looser eps) — the
    // storage↔recall trade, measured honestly via the blowup row
    val (repWideModel, repWide) = phase(results, "build_replicated_wide") {
      val (m2, g0) = RoutedHnswIndex.buildReplicatedBalanced(
        vecs, model, eps = 1.0, maxReplicas = 3, targetShardRows = shardRows)
      val g = g0.cache(); g.count(); (m2, g)
    }
    results("replicated_wide_blowup") = repWide.count().toDouble / n
    for (r <- Seq(2, 4)) {
      val res = phase(results, s"search_repw_r${r}_ef50") {
        val d = RoutedHnswIndex.knn(repWide, repWideModel, queries, k,
          probeRegions = r, efSearch = 50).cache()
        d.count(); d
      }
      results(s"recall_repw_r${r}_ef50") = recallVs(flat, res)
      res.unpersist()
    }
    repWide.unpersist(); flat.unpersist(); vecs.unpersist(); queries.unpersist()

    def fmt(v: Double): String =
      if (v == math.rint(v) && math.abs(v) < 1e15) v.toLong.toString
      else BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP).toString
    println(results.map { case (kk, v) => "\"" + kk + "\":" + fmt(v) }
      .mkString("{", ",", "}"))
    spark.stop()
  }
}
