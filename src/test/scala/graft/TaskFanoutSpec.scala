package graft.query

import java.util.concurrent.atomic.AtomicInteger

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bounded intra-task fan-out (VERDICT r11 wrong #3a / next #4:
  * the executor-side batch kernels previously fanned across the ForkJoin
  * common pool, oversubscribing multi-slot executors). */
class TaskFanoutSpec extends AnyFunSuite {

  // the shared test session must exist so SparkEnv carries a local master
  private val spark = graft.TestSession.spark

  test("width is bounded and derived from the local master's core share") {
    assert(spark.sparkContext.isLocal)
    val w = TaskFanout.width()
    val cores = Runtime.getRuntime.availableProcessors()
    assert(w >= 1)
    assert(w == math.max(1, cores / ServeBlocks.ServePartitions),
      s"local-mode width $w != cores($cores)/ServePartitions(${ServeBlocks.ServePartitions})")
    // the cluster-hazard bound: never wider than the whole machine
    assert(w <= cores)
  }

  test("foreach visits every index exactly once and never exceeds width " +
      "concurrent workers") {
    val n = 500
    val visits = new Array[AtomicInteger](n)
    var i = 0
    while (i < n) { visits(i) = new AtomicInteger(0); i += 1 }
    val inFlight = new AtomicInteger(0)
    val maxInFlight = new AtomicInteger(0)
    TaskFanout.foreach(n) { idx =>
      val now = inFlight.incrementAndGet()
      maxInFlight.updateAndGet(m => math.max(m, now))
      visits(idx).incrementAndGet()
      Thread.sleep(0, 50000) // widen the overlap window
      inFlight.decrementAndGet()
    }
    assert(visits.forall(_.get() == 1), "some index not visited exactly once")
    assert(maxInFlight.get() <= TaskFanout.width(),
      s"observed ${maxInFlight.get()} concurrent workers > width ${TaskFanout.width()}")
  }

  test("a worker throwable propagates to the caller") {
    val ex = intercept[IllegalStateException] {
      TaskFanout.foreach(100) { i => if (i == 37) throw new IllegalStateException("boom") }
    }
    assert(ex.getMessage == "boom")
  }

  test("n smaller than width degrades to the sequential loop") {
    val seen = new AtomicInteger(0)
    TaskFanout.foreach(1)(_ => seen.incrementAndGet())
    assert(seen.get() == 1)
  }
}
