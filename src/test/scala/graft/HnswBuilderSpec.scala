package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.Metric
import graft.index.{HnswBuilder, LocalHnsw}

/** Graph-level bit-identity of the flat-packed [[HnswBuilder]] against
  * the r10 [[LocalHnsw]] insert path it replaces in
  * [[graft.index.HnswIndex.buildFromShardCol]]: same ids, levels, edge
  * lists (same neighbors in the same order) and vectors for every node,
  * across metrics, sizes and sparse id spaces. The two implementations
  * share no traversal code — parity here pins that the position-interned
  * kernel made no semantic change. */
class HnswBuilderSpec extends AnyFunSuite {

  private def vecOf(id: Long, dim: Int, salt: Long): Array[Double] =
    Array.tabulate(dim) { j =>
      var z = id * 1000003L + j * 31L + salt + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z = z ^ (z >>> 31)
      ((z >>> 11).toDouble / (1L << 53).toDouble) * 2.0 - 1.0
    }

  private def sparseIds(n: Int, salt: Long): Array[Long] =
    Array.tabulate(n) { i =>
      var z = i.toLong + salt
      z = (z ^ (z >>> 33)) * 0xff51afd7ed558ccdL
      i.toLong * 7L + ((z >>> 60) & 3L) // ascending, gappy
    }

  private def graphs(ids: Array[Long], dim: Int, salt: Long, metric: Metric) = {
    val m = 8
    val efc = 40
    val ref = new LocalHnsw(m, efc, metric)
    val fast = new HnswBuilder(m, efc, metric, ids.length)
    ids.foreach { id =>
      val v = vecOf(id, dim, salt)
      ref.insert(id, v.clone())
      fast.insert(id, v)
    }
    (ref.nodeRows.toArray.sortBy(_._1), fast.nodeRows.toArray.sortBy(_._1))
  }

  for (metric <- Metric.all) {
    test(s"builder ≡ LocalHnsw under ${metric.name}: ids, levels, edges, vectors") {
      val ids = sparseIds(600, salt = metric.name.hashCode.toLong)
      val (ref, fast) = graphs(ids, dim = 12, salt = 5L, metric)
      assert(ref.length === fast.length)
      ref.zip(fast).foreach { case ((ri, rv, rl, re), (fi, fv, fl, fe)) =>
        assert(ri === fi)
        assert(rl === fl, s"level mismatch at id $ri")
        assert(rv.toSeq === fv.toSeq, s"vector mismatch at id $ri")
        assert(re.length === fe.length, s"layer count mismatch at id $ri")
        re.indices.foreach { l =>
          assert(re(l).toSeq === fe(l).toSeq,
            s"edge list mismatch at id $ri layer $l")
        }
      }
    }
  }

  test("builder ≡ LocalHnsw at a larger L2 graph (prune-heavy regime)") {
    val ids = sparseIds(2500, salt = 99L)
    val (ref, fast) = graphs(ids, dim = 6, salt = 17L, Metric.L2)
    assert(ref.length === fast.length)
    ref.zip(fast).foreach { case ((ri, _, _, re), (fi, _, _, fe)) =>
      assert(ri === fi)
      re.indices.foreach(l => assert(re(l).toSeq === fe(l).toSeq))
    }
  }

  test("builder rejects non-ascending ids") {
    val b = new HnswBuilder(8, 40, Metric.L2, 4)
    b.insert(10L, Array(1.0, 2.0))
    intercept[IllegalArgumentException](b.insert(10L, Array(1.0, 2.0)))
    intercept[IllegalArgumentException](b.insert(3L, Array(1.0, 2.0)))
  }
}
