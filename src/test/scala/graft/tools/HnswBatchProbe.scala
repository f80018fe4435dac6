package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.Metric
import graft.index.HnswIndex

// temporary profiling scratchpad — not part of the library surface.
// Isolates the in-process HNSW batch row at the bench protocol
// (100k × 128d, 32 shards, 1000 queries, ef=50) so kernel work can be
// adjudicated without a full bench pass:
//   runMain graft.tools.HnswBatchProbe [n] [q] [shards] [reps]
// Prints single-query p50 and warm batch QPS + recall@10 vs flat.
object HnswBatchProbe {
  private def pseudo(id: org.apache.spark.sql.Column, i: org.apache.spark.sql.Column,
      salt: Long) =
    pmod(xxhash64(id, i, lit(salt)), lit(1000003L)).cast("double") / 1000003.0

  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toLong).getOrElse(100000L)
    val nq = args.lift(1).map(_.toInt).getOrElse(1000)
    val shards = args.lift(2).map(_.toInt).getOrElse(32)
    val reps = args.lift(3).map(_.toInt).getOrElse(3)
    val dim = 128
    val K = 10
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      // NOTE: driver memory cannot be set here — in local mode the JVM is
      // already running (ADVICE r10 #3); it comes from build.sbt's
      // javaOptions (-Xmx via SPARK_DRIVER_MEM, default 56g)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def synth(count: Long, salt: Long, idName: String, vecName: String) =
      spark.range(count).select(col("id").as(idName),
        transform(sequence(lit(0), lit(dim - 1)), i => pseudo(col("id"), i, salt)).as(vecName))
    val vectors = synth(n, 0L, "id", "vec").cache(); vectors.count()
    val queries = synth(nq.toLong, 7777777L, "query_id", "qvec").cache(); queries.count()

    val par = args.lift(5).exists(_.startsWith("par")) // shards==1 via the concurrent builder
    // ADVICE r11: 'par' with shards != 1 used to silently fall back to the
    // sharded DataFrame build while the build line still printed par=true
    require(!par || shards == 1,
      s"'par' requests the concurrent single-graph builder — pass shards=1 (got $shards)")
    if (args.lift(5).contains("parraw")) {
      // isolate the insert kernel: arrays in, arrays out, no DataFrame
      val rows = vectors.select(col("id"), col("vec")).collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).sortBy(_._1)
      val ids = rows.map(_._1)
      for (rep <- 1 to 2) {
        val vs = rows.map(_._2.clone())
        System.gc()
        val tr = System.nanoTime()
        val b = graft.index.HnswParallelBuilder.fromRows(16, 200, Metric.L2, ids, vs, 32)
        b.run()
        println(f"[probe] raw kernel rep$rep ${(System.nanoTime() - tr) / 1e9}%.1f s")
      }
    }
    val t0 = System.nanoTime()
    val localPre =
      if (par && shards == 1) {
        val g = HnswIndex.buildParallelCompiled(vectors, Metric.L2)
        Some(graft.query.LocalHnswServer.fromCompiled(Array(g), Metric.L2))
      } else None
    val graph = if (localPre.isDefined) null
      else { val g = HnswIndex.build(vectors, shards, Metric.L2).cache(); g.count(); g }
    println(f"[probe] build ${(System.nanoTime() - t0) / 1e9}%.1f s " +
      s"(path=${if (localPre.isDefined) "parallel-single" else s"sharded-$shards"})")

    val truth = graft.index.FlatIndex.knnBlocked(vectors, queries, K, Metric.L2)
      .select("query_id", "neighbor_id").collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => (q, rs.map(_.getLong(1)).toSet) }

    val local = localPre.getOrElse(new graft.query.LocalHnswServer(graph, Metric.L2, shards))
    val qArr = queries.collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val qVecs = qArr.map(_._2)

    // single-query p50
    val lat = qVecs.take(200).map { q =>
      val t = System.nanoTime(); local.search(q, K, 50); (System.nanoTime() - t) / 1e6
    }.sorted
    println(f"[probe] single p50 ${lat(lat.length / 2)}%.3f ms")

    val efs = args.lift(4).map(_.split(",").map(_.trim.toInt).toSeq)
      .getOrElse(Seq(10, 16, 25, 50))
    efs.foreach { ef =>
      var out: Array[Array[(Long, Double, Int)]] = null
      def runBatch(): Double = {
        val t = System.nanoTime()
        out = local.searchBatch(qVecs, K, ef)
        (System.nanoTime() - t) / 1e9
      }
      runBatch() // warm
      val secs = Array.fill(reps)(runBatch())
      var hits = 0L; var total = 0L
      qArr.indices.foreach { i =>
        val t = truth(qArr(i)._1)
        total += t.size
        hits += out(i).count { case (id, _, _) => t.contains(id) }
      }
      println(f"[probe] batch ef$ef qps best ${nq / secs.min}%.0f  median ${nq / secs.sorted.apply(reps / 2)}%.0f  recall ${hits.toDouble / total}%.4f")
    }
    spark.stop()
  }
}
