package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.functions._

import graft.core.Metric
import graft.index._

/** Probe for the VERDICT r12 anti-scaling finding: the quantized-family
  * distributed QPS rows (bq/lsh/ivf/ivfpq/pq) read FASTER at 8 cores than
  * 32. Replicates each row's timed kernel at the bench shape and prints a
  * per-stage breakdown (wall, task-time sum, max task, task count) so the
  * overhead can be attributed: scheduling, shuffle, or scan.
  *
  * Run: SPARK_GRAFT_CPUS=32 sbt "Test/runMain graft.tools.ScalingProbe"
  */
object ScalingProbe {

  final class StageStats extends SparkListener {
    case class S(name: String, wallMs: Long, taskMs: Long, maxTaskMs: Long, nTasks: Int)
    val stages = scala.collection.mutable.ArrayBuffer.empty[S]
    private val taskAgg = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Long, Int)]()
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      val ms = t.taskInfo.duration
      taskAgg.merge(t.stageId, (ms, ms, 1),
        (a, b) => (a._1 + b._1, math.max(a._2, b._2), a._3 + b._3))
    }
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      val info = sc.stageInfo
      val wall = (for { s <- info.submissionTime; c <- info.completionTime } yield c - s).getOrElse(-1L)
      val (tsum, tmax, n) = Option(taskAgg.get(info.stageId)).getOrElse((0L, 0L, 0))
      stages += S(info.name.takeWhile(_ != '\n').take(60), wall, tsum, tmax, n)
    }
    def reset(): Unit = { stages.clear(); taskAgg.clear() }
    def dump(tag: String): Unit = {
      println(s"[stages:$tag]")
      stages.foreach(s => println(
        f"    wall=${s.wallMs}%5d ms  taskSum=${s.taskMs}%6d  maxTask=${s.maxTaskMs}%5d  n=${s.nTasks}%3d  ${s.name}"))
    }
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.core.GraftSession.local(cpus, "scaling-probe")
    import spark.implicits._
    val listener = new StageStats
    spark.sparkContext.addSparkListener(listener)

    val benchN = 100000L
    val benchQ = 1000L
    val dim = 128
    val K = 10
    def pseudo(id: org.apache.spark.sql.Column, i: org.apache.spark.sql.Column, salt: Long) =
      pmod(xxhash64(id, i, lit(salt)), lit(1000003L)).cast("double") / 1000003.0
    def synth(n: Long, salt: Long, idName: String, vecName: String) =
      spark.range(n).select(col("id").as(idName),
        transform(sequence(lit(0), lit(dim - 1)), i => pseudo(col("id"), i, salt)).as(vecName))

    val vectors = synth(benchN, 0L, "id", "vec").cache(); vectors.count()
    val queries = synth(benchQ, 7777777L, "query_id", "qvec").cache(); queries.count()
    println(s"[probe] cpus=$cpus vec partitions=${vectors.rdd.getNumPartitions}")

    def timed(name: String, reps: Int = 3)(mk: () => org.apache.spark.sql.DataFrame): Unit = {
      mk().count() // warm
      System.gc()
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); mk().count(); (System.nanoTime() - t0) / 1e9
      }
      // split driver-side construction (collect queries, build/broadcast
      // tables, plan) from the action
      def gcMs: Long = {
        val it = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.iterator()
        var t = 0L; while (it.hasNext) t += it.next().getCollectionTime; t
      }
      val tc0 = System.nanoTime(); val df = mk(); val tc = (System.nanoTime() - tc0) / 1e9
      val g0 = gcMs
      val ta0 = System.nanoTime(); df.count(); val ta = (System.nanoTime() - ta0) / 1e9
      print(f"[probe-gc] action_gc_ms=${gcMs - g0}%d ")
      listener.reset()
      mk().count()
      Thread.sleep(200) // listener drain
      println(f"[probe] $name%-18s min=${times.min}%.3f s  qps=${benchQ / times.min}%.0f  construct=$tc%.3f action=$ta%.3f  all=${times.map(t => f"$t%.3f").mkString(",")}")
      listener.dump(name)
    }

    // BQ
    val bqModel = BqIndex.train(vectors, Metric.L2)
    val bqCodes = BqIndex.encode(vectors, bqModel).cache(); bqCodes.count()
    timed("bq_qps")(() => BqIndex.knnBlocked(bqCodes, bqModel, queries, K))

    // LSH
    val lshIdx = LshIndex.index(vectors, 6).cache(); lshIdx.count()
    timed("lsh_qps")(() => LshIndex.knnBlocked(lshIdx, queries, K, 6, Metric.L2))

    // IVF
    val nlist = math.max(16, math.sqrt(benchN.toDouble).toInt)
    val trainSet = vectors.limit(5000).cache(); trainSet.count()
    val ivfModel = IvfIndex.train(trainSet, nlist, Metric.L2)
    val assigned = IvfIndex.assign(vectors, ivfModel).cache(); assigned.count()
    timed("ivf_qps")(() => IvfIndex.searchBlocked(assigned, ivfModel, queries, K, nprobe = 10))

    // PQ
    val pqModel = PqIndex.train(trainSet, m = 16, nbits = 8, Metric.L2)
    val pqCodes = PqIndex.encode(vectors, pqModel).cache(); pqCodes.count()
    timed("pq_qps")(() => PqIndex.knnBlocked(pqCodes, pqModel, queries, K))

    // IVFPQ
    val ivfpqModel = IvfPqIndex.train(trainSet, nlist, m = 8, nbits = 8, Metric.L2)
    val ivfpqCodes = IvfPqIndex.encode(vectors, ivfpqModel).cache(); ivfpqCodes.count()
    timed("ivfpq_qps")(() => IvfPqIndex.searchBlocked(ivfpqCodes, ivfpqModel, queries, K, nprobe = 10))

    // flat for contrast (scales correctly per PERF_r12)
    timed("flat_qps")(() => FlatIndex.knnBlocked(vectors, queries, K, Metric.L2))

    spark.stop()
  }
}
