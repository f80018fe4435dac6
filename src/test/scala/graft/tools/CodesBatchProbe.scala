package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.Metric
import graft.index._

// temporary profiling scratchpad — not part of the library surface.
// In-process batch throughput of the CODE-PACKED kinds (pq/sq8/bq) at
// corpus scales where the raw-vector kinds' single-heap contract no
// longer holds (1M × 128d doubles is 1.02 GiB; the codes are 8–64×
// smaller). Recall graded against exact flat truth.
//   runMain graft.tools.CodesBatchProbe [n] [q]
object CodesBatchProbe {
  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toLong).getOrElse(1000000L)
    val nq = args.lift(1).map(_.toInt).getOrElse(1000)
    val dim = 128
    val K = 10
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def pseudo(id: org.apache.spark.sql.Column, i: org.apache.spark.sql.Column, salt: Long) =
      pmod(xxhash64(id, i, lit(salt)), lit(1000003L)).cast("double") / 1000003.0
    def synth(count: Long, salt: Long, idName: String, vecName: String) =
      spark.range(count).select(col("id").as(idName),
        transform(sequence(lit(0), lit(dim - 1)), i => pseudo(col("id"), i, salt)).as(vecName))
    val vectors = synth(n, 0L, "id", "vec").cache(); vectors.count()
    val queries = synth(nq.toLong, 7777777L, "query_id", "qvec").cache(); queries.count()
    val truth = FlatIndex.knnBlocked(vectors, queries, K, Metric.L2)
      .select("query_id", "neighbor_id").collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => (q, rs.map(_.getLong(1)).toSet) }
    val qArr = queries.collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val qs = qArr.map(_._2)
    def bench(name: String)(run: () => Array[Array[Long]]): Unit = {
      run() // warm
      var out: Array[Array[Long]] = null
      def once(): Double = {
        val t0 = System.nanoTime(); out = run(); (System.nanoTime() - t0) / 1e9
      }
      val sec = math.min(once(), once())
      var hits = 0L; var total = 0L
      qArr.indices.foreach { i =>
        val t = truth(qArr(i)._1); total += t.size; hits += out(i).count(t.contains)
      }
      println(f"[probe] $name qps ${nq / sec}%.0f  recall ${hits.toDouble / total}%.4f")
    }

    val trainCap = math.min(n / 2, 5000L).toInt
    val trainSet = vectors.limit(trainCap).cache(); trainSet.count()

    locally {
      val model = PqIndex.train(trainSet, m = 16, nbits = 8, Metric.L2)
      val codes = PqIndex.encode(vectors, model).cache(); codes.count()
      val s = new graft.query.LocalPqServer(codes, model)
      bench("pq_1m_batch")(() => s.searchBatch(qs, K).map(_.map(_._1)))
      codes.unpersist()
    }
    locally {
      val model = Sq8Index.train(vectors, Metric.L2)
      val codes = Sq8Index.encode(vectors, model).cache(); codes.count()
      val s = new graft.query.LocalSq8Server(codes, model)
      bench("sq8_1m_batch")(() => s.searchBatch(qs, K).map(_.map(_._1)))
      codes.unpersist()
    }
    locally {
      val model = BqIndex.train(vectors, Metric.L2)
      val codes = BqIndex.encode(vectors, model).cache(); codes.count()
      val s = new graft.query.LocalBqServer(codes, model)
      bench("bq_1m_batch")(() => s.searchBatch(qs, K).map(_.map(_._1)))
      codes.unpersist()
    }
    spark.stop()
  }
}
