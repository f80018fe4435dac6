package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Metric
import graft.index._

/** Benchmark main (driver contract): prints ONE JSON line
  * `{"metric":...,"value":seconds,"unit":"sec","queries":{...},"sf":...}`.
  *
  * Two sections, both folded into the `queries` map:
  *  - headline driver-testdata queries (seconds each);
  *  - a BASELINE-comparable synthetic vector benchmark mirroring the
  *    reference harness (BASELINE.md: 100k × 128-dim vectors, 1000
  *    queries, k=10, l2, train capped at 5000 — benchmark_comparison.go):
  *    build/search seconds, QPS, and recall@10 vs the flat oracle for
  *    flat / IVF(nlist=316, nprobe=10) / PQ(m=16) / IVFPQ(nlist=316, m=8).
  */
object Bench {

  private val K = 10

  /** Deterministic pseudo-random component in [0,1): xxhash64 mixing so
    * components are independent (a linear-congruential formula produces a
    * lattice — vectors on a line — which degenerates quantizer benchmarks),
    * reproducible across runs (no RNG stream). */
  private def pseudo(id: org.apache.spark.sql.Column, i: org.apache.spark.sql.Column, salt: Long) =
    pmod(xxhash64(id, i, lit(salt)), lit(1000003L)).cast("double") / 1000003.0

  private def syntheticVectors(spark: SparkSession, n: Long, dim: Int, salt: Long,
      idName: String, vecName: String): DataFrame =
    spark.range(n).select(
      col("id").as(idName),
      transform(sequence(lit(0), lit(dim - 1)), i => pseudo(col("id"), i, salt)).as(vecName))

  private def time[A](body: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val r = body
    (r, (System.nanoTime() - t0) / 1e9)
  }

  private def recallVs(flat: DataFrame, approx: DataFrame): Double = {
    val total = flat.count()
    val hits = flat.select("query_id", "neighbor_id")
      .join(approx.select("query_id", "neighbor_id"), Seq("query_id", "neighbor_id"))
      .count()
    hits.toDouble / total
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val benchN = sys.env.getOrElse("SPARK_GRAFT_BENCH_N", "100000").toLong
    val benchQ = sys.env.getOrElse("SPARK_GRAFT_BENCH_Q", "1000").toLong
    val dim = 128
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val results = scala.collection.mutable.LinkedHashMap[String, Double]()

    // -- headline testdata queries --
    val headline = Seq(
      "knn_flat_l2", "knn_flat_cosine", "q1_lineitem_agg", "q_revenue_by_nation",
      "q_events_hourly", "near_dup_minhash", "dedup_exact_groups", "doc_fingerprint",
      "events_sessionize", "knn_ivf_det", "knn_pq_det", "knn_ivfpq_det", "knn_lsh")
    headline.foreach { name =>
      SparkEntry.queries.get(name).foreach { fn =>
        val (_, sec) = time(fn(spark, sfDir).count())
        results(name) = sec
      }
    }

    // -- BASELINE-comparable synthetic vector benchmark --
    val vectors = syntheticVectors(spark, benchN, dim, 0L, "id", "vec").cache()
    vectors.count() // materialize outside the timed sections
    val queries = syntheticVectors(spark, benchQ, dim, 7777777L, "query_id", "qvec").cache()
    queries.count()

    val (flatRes, flatSec) = time {
      val r = FlatIndex.knnBlocked(vectors, queries, K, Metric.L2).cache()
      r.count(); r
    }
    results("flat_search_sec") = flatSec
    results("flat_qps") = benchQ / flatSec
    results("flat_recall") = 1.0

    val trainCap = math.min(benchN / 2, 5000L).toInt // reference's training cap
    val trainSet = vectors.limit(trainCap).cache(); trainSet.count()
    val nlist = math.max(16, math.sqrt(benchN.toDouble).toInt) // ref: 316 at 100k

    val (ivfModel, ivfBuild) = time(IvfIndex.train(trainSet, nlist, Metric.L2))
    val (assigned, ivfAssign) = time {
      val a = IvfIndex.assign(vectors, ivfModel).cache(); a.count(); a
    }
    val (ivfRes, ivfSec) = time {
      val r = IvfIndex.search(assigned, ivfModel, queries, K, nprobe = 10).cache()
      r.count(); r
    }
    results("ivf_build_sec") = ivfBuild + ivfAssign
    results("ivf_search_sec") = ivfSec
    results("ivf_qps") = benchQ / ivfSec
    results("ivf_recall") = recallVs(flatRes, ivfRes)

    val (pqModel, pqBuild) = time(PqIndex.train(trainSet, m = 16, nbits = 8, Metric.L2))
    val (pqCodes, pqEncode) = time {
      val c = PqIndex.encode(vectors, pqModel).cache(); c.count(); c
    }
    val (pqRes, pqSec) = time {
      val r = PqIndex.knnBlocked(pqCodes, pqModel, queries, K).cache(); r.count(); r
    }
    results("pq_build_sec") = pqBuild + pqEncode
    results("pq_search_sec") = pqSec
    results("pq_qps") = benchQ / pqSec
    results("pq_recall") = recallVs(flatRes, pqRes)

    val (ivfpqModel, ivfpqBuild) = time(
      IvfPqIndex.train(trainSet, nlist, m = 8, nbits = 8, Metric.L2))
    val (ivfpqCodes, ivfpqEncode) = time {
      val c = IvfPqIndex.encode(vectors, ivfpqModel).cache(); c.count(); c
    }
    val (ivfpqRes, ivfpqSec) = time {
      val r = IvfPqIndex.search(ivfpqCodes, ivfpqModel, queries, K, nprobe = 10).cache()
      r.count(); r
    }
    results("ivfpq_build_sec") = ivfpqBuild + ivfpqEncode
    results("ivfpq_search_sec") = ivfpqSec
    results("ivfpq_qps") = benchQ / ivfpqSec
    results("ivfpq_recall") = recallVs(flatRes, ivfpqRes)

    // -- single-query serving latency (A6: the reference's per-query
    // benchmarkSearch shape — warmup, then timed singles, percentiles) --
    val serveQ = sys.env.getOrElse("SPARK_GRAFT_BENCH_SERVE", "30").toInt
    if (serveQ > 0) {
      val singles = queries.limit(serveQ).collect()
      val one = spark.createDataFrame(
        java.util.Arrays.asList(singles.head),
        queries.schema)
      FlatIndex.knn(vectors, one, K, Metric.L2).count() // warmup
      val times = singles.map { row =>
        val df = spark.createDataFrame(java.util.Arrays.asList(row), queries.schema)
        val t0 = System.nanoTime()
        FlatIndex.knn(vectors, df, K, Metric.L2).count()
        (System.nanoTime() - t0) / 1e6
      }.sorted
      def pct(p: Double) = times(math.min(times.length - 1, (p * times.length).toInt))
      results("serve_p50_ms") = pct(0.50)
      results("serve_p95_ms") = pct(0.95)
      results("serve_p99_ms") = pct(0.99)
      results("serve_qps") = 1000.0 * times.length / times.sum
    }

    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.4f" }
      .mkString("{", ",", "}")
    val total = results.filter(_._1.endsWith("sec")).values.sum +
      headline.flatMap(results.get).sum
    println(f"""{"metric":"total","value":$total%.4f,"unit":"sec","queries":$qs,"sf":"$sfDir","bench_n":$benchN,"bench_q":$benchQ}""")
    spark.stop()
  }
}
