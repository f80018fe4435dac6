package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.Metric
import graft.index.{CompiledHnsw, HnswBuilder, HnswIndex, HnswParallelBuilder}

/** The concurrent-insert single-graph builder is NOT deterministic (edge
  * selection depends on thread interleaving — documented), so unlike
  * [[HnswBuilderSpec]] there is no bit-identity to pin. What IS invariant
  * and pinned here: every structural contract of the graph format (level
  * function, degree caps, no self/duplicate/dangling edges, layer
  * validity of every edge target), and search quality — the parallel
  * graph's recall must match the sequential graph's on the same world
  * within noise, not merely clear a floor. */
class HnswParallelBuilderSpec extends AnyFunSuite {

  private def vecOf(id: Long, dim: Int, salt: Long): Array[Double] =
    Array.tabulate(dim) { j =>
      var z = id * 1000003L + j * 31L + salt + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z = z ^ (z >>> 31)
      ((z >>> 11).toDouble / (1L << 53).toDouble) * 2.0 - 1.0
    }

  private val m = 8
  private val efc = 60

  private def parallelBuilder(ids: Array[Long], dim: Int, salt: Long,
      metric: Metric, threads: Int) = {
    val vs = ids.map(vecOf(_, dim, salt))
    val b = HnswParallelBuilder.fromRows(m, efc, metric, ids, vs, threads)
    b.run()
    b
  }

  private def parallelRows(ids: Array[Long], dim: Int, salt: Long,
      metric: Metric, threads: Int) =
    parallelBuilder(ids, dim, salt, metric, threads).nodeRows.toArray

  for (metric <- Metric.all) {
    test(s"parallel build structural invariants under ${metric.name}") {
      val dim = 12
      val salt = metric.name.hashCode.toLong
      val ids = Array.tabulate(800)(i => i.toLong * 3 + (i % 2)) // ascending, gappy
      val rows = parallelRows(ids, dim, salt, metric, threads = 8)
      assert(rows.length === ids.length)
      val idSet = ids.toSet
      val levelOf = ids.map(id => id -> HnswIndex.levelOf(id, m)).toMap
      rows.foreach { case (id, vec, level, edges) =>
        assert(idSet.contains(id))
        assert(level === levelOf(id), s"level drift at id $id")
        assert(vec.toSeq === vecOf(id, dim, salt).toSeq, s"vector corruption at id $id")
        assert(edges.length === level + 1, s"layer count at id $id")
        edges.zipWithIndex.foreach { case (layer, l) =>
          val cap = if (l == 0) 2 * m else m
          assert(layer.length <= cap, s"degree ${layer.length} > cap $cap at id $id layer $l")
          assert(!layer.contains(id), s"self edge at id $id layer $l")
          assert(layer.distinct.length === layer.length, s"duplicate edge at id $id layer $l")
          layer.foreach { nb =>
            assert(idSet.contains(nb), s"dangling edge $nb at id $id")
            assert(levelOf(nb) >= l, s"edge to below-layer node $nb at layer $l")
          }
        }
      }
    }
  }

  test("parallel graph recall matches the sequential graph's (L2, k=10)") {
    val dim = 16
    val n = 1500
    val k = 10
    val ef = 120
    val ids = Array.tabulate(n)(_.toLong)
    val seq = new HnswBuilder(m, efc, Metric.L2, n)
    ids.foreach(id => seq.insert(id, vecOf(id, dim, 7L)))
    val par = parallelRows(ids, dim, 7L, Metric.L2, threads = 8)

    val gSeq = CompiledHnsw.fromTuples(
      seq.nodeRows.map { case (id, v, l, e) => (id, v.toSeq, l, e.map(_.toSeq).toSeq) }.toSeq,
      Metric.L2)
    val gPar = CompiledHnsw.fromTuples(
      par.map { case (id, v, l, e) => (id, v.toSeq, l, e.map(_.toSeq).toSeq) }.toSeq,
      Metric.L2)

    val queries = Array.tabulate(60)(qi => vecOf(qi + 900001L, dim, 13L))
    def l2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    val vecsById = ids.map(id => id -> vecOf(id, dim, 7L)).toMap
    def recall(g: CompiledHnsw): Double = {
      var hits = 0
      queries.foreach { q =>
        val truth = ids.sortBy(id => (l2(q, vecsById(id)), id)).take(k).toSet
        hits += g.knn(q, k, ef).count { case (id, _) => truth.contains(id) }
      }
      hits.toDouble / (queries.length * k)
    }
    val rSeq = recall(gSeq)
    val rPar = recall(gPar)
    assert(rPar >= rSeq - 0.03,
      f"parallel recall $rPar%.4f fell more than noise below sequential $rSeq%.4f")
    assert(rPar >= 0.85, f"parallel recall $rPar%.4f below absolute floor")
  }

  test("toCompiled ≡ fromTuples(nodeRows): identical top-k on every query") {
    val dim = 10
    val ids = Array.tabulate(700)(i => i.toLong * 2 + 1)
    val b = parallelBuilder(ids, dim, 11L, Metric.L2, threads = 8)
    val direct = b.toCompiled
    val viaRows = CompiledHnsw.fromTuples(
      b.nodeRows.map { case (id, v, l, e) => (id, v.toSeq, l, e.map(_.toSeq).toSeq) }.toSeq,
      Metric.L2)
    (0 until 40).foreach { qi =>
      val q = vecOf(qi + 777000L, dim, 23L)
      assert(direct.knn(q, 10, 80).toSeq === viaRows.knn(q, 10, 80).toSeq,
        s"direct/CSR-from-rows divergence on query $qi")
    }
  }

  test("single worker degenerates to a well-formed graph (threads=1)") {
    val ids = Array.tabulate(300)(_.toLong * 2)
    val rows = parallelRows(ids, dim = 8, salt = 3L, Metric.L2, threads = 1)
    assert(rows.length === 300)
    // reachability from the entry at layer 0: a (nearly) connected graph;
    // concurrent/locked appends must not orphan nodes
    val adj = rows.map { case (id, _, _, e) => id -> e(0).toSet }.toMap
    val entry = rows.maxBy { case (id, _, l, _) => (l, -id) }._1
    val seen = scala.collection.mutable.Set(entry)
    var frontier = List(entry)
    while (frontier.nonEmpty) {
      val next = frontier.flatMap(adj(_)).filterNot(seen)
      next.foreach(seen += _)
      frontier = next
    }
    assert(seen.size >= (rows.length * 95) / 100,
      s"only ${seen.size}/${rows.length} nodes reachable from entry")
  }

  test("sortIndicesByKey: permutation sorted by key, all sizes and orders " +
      "(the primitive replacement for the boxed id-order sort)") {
    val rnd = new scala.util.Random(42)
    for (n <- Seq(0, 1, 2, 15, 16, 17, 100, 5000)) {
      val keys = rnd.shuffle((0 until n).map(i => i.toLong * 7 - 3)).toArray
      val perm = HnswIndex.sortIndicesByKey(keys)
      assert(perm.sorted.toSeq == (0 until n), s"n=$n: not a permutation")
      assert(perm.map(keys).toSeq == keys.sorted.toSeq, s"n=$n: not key-sorted")
    }
    // already-sorted and reverse-sorted inputs (quicksort edge orders)
    for (keys <- Seq(Array.tabulate(1000)(_.toLong),
                     Array.tabulate(1000)(i => (999 - i).toLong))) {
      val perm = HnswIndex.sortIndicesByKey(keys)
      assert(perm.map(keys).toSeq == keys.sorted.toSeq)
    }
  }
}
