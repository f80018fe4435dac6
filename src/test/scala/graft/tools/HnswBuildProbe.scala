package graft.tools

import graft.core.Metric
import graft.index.HnswBuilder

/** Profile the sequential per-shard HNSW build kernel at the bench s8
  * shape (VERDICT r12 next #4): 12.5k nodes × 128d per shard, 8 shards
  * built concurrently on separate threads (the task layout of
  * `hnsw_s8_build_sec`). Prints wall times and a sampled-stack
  * attribution of where insert time goes (distance evals vs heap ops vs
  * prune), so the parallelization question is decided by measurement.
  *
  * Run: sbt "Test/runMain graft.tools.HnswBuildProbe"
  */
object HnswBuildProbe {
  private def synthVec(id: Long, dim: Int, salt: Long): Array[Double] = {
    // same xxhash64-free driver-side shape is unnecessary here — the walk
    // cost depends on geometry class, not the exact hash; splitmix gives
    // the same uniform cloud
    val v = new Array[Double](dim)
    var i = 0
    var z = id * 1000003L + salt
    while (i < dim) {
      z += 0x9e3779b97f4a7c15L
      var x = z
      x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
      x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
      x = x ^ (x >>> 31)
      v(i) = ((x >>> 11) % 1000003L).toDouble / 1000003.0
      i += 1
    }
    v
  }

  def buildShard(n: Int, dim: Int, salt: Long): HnswBuilder = {
    val b = new HnswBuilder(16, 200, Metric.L2, n)
    var i = 0
    while (i < n) { b.insert(i.toLong * 8 + salt % 8, synthVec(i, dim, salt)); i += 1 }
    b
  }

  def main(args: Array[String]): Unit = {
    val n = 12500
    val dim = 128
    // warm JIT
    buildShard(2000, dim, 0L)

    // sampled-stack attribution during one sequential build
    val mainThread: Thread = Thread.currentThread()
    val sampler = new Thread(() => {
      val counts = new scala.collection.mutable.HashMap[String, Int]
      try {
        while (!Thread.currentThread().isInterrupted) {
          Thread.sleep(2)
          val st = mainThread.getStackTrace
          val frame = st.find(f =>
            f.getClassName.contains("Metric") || f.getClassName.contains("HnswBuilder") ||
            f.getClassName.contains("PosDistHeap") || f.getClassName.contains("BoundedTopK"))
          val key = frame.map(f => s"${f.getClassName.split('.').last}.${f.getMethodName}")
            .getOrElse(st.headOption.map(f => f.getClassName.split('.').last + "." + f.getMethodName).getOrElse("?"))
          counts(key) = counts.getOrElse(key, 0) + 1
        }
      } catch { case _: InterruptedException => }
      val total = counts.values.sum.toDouble
      counts.toSeq.sortBy(-_._2).take(12).foreach { case (k, c) =>
        println(f"[stack] ${100 * c / total}%5.1f%%  $k")
      }
    })
    val t0 = System.nanoTime()
    sampler.start()
    buildShard(n, dim, 1L)
    sampler.interrupt(); sampler.join()
    println(f"[probe] sequential 1×$n%d build: ${(System.nanoTime() - t0) / 1e9}%.2f s")

    // 8 concurrent shard builds (the s8 task layout)
    val t1 = System.nanoTime()
    val threads = (0 until 8).map { s =>
      val th = new Thread(() => { buildShard(n, dim, 100L + s); () })
      th.start(); th
    }
    threads.foreach(_.join())
    println(f"[probe] 8 concurrent $n%d builds: ${(System.nanoTime() - t1) / 1e9}%.2f s wall")
  }
}
