package graft.index

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.core.Metric

/** Sharded HNSW — the reference's default ANN index
  * (pkg/index/hnsw/hnsw.go, pkg/search/search.go:220-228) re-expressed
  * for Spark's execution model.
  *
  * A single navigable-small-world graph is a sequential, pointer-chasing
  * structure — anti-Spark as one object. The scale-correct shape is the
  * one production ANN systems use to go distributed: SHARD the corpus
  * (deterministically, `id % numShards`), build an independent HNSW
  * graph per shard inside one `mapPartitions` pass (embarrassingly
  * parallel, zero cross-shard traffic), and serve a query by fanning out
  * to every shard's graph and merging the per-shard top-k with the
  * engine-wide [[BoundedTopK]] tie-break. Each shard is sized to fit an
  * executor core's memory, so the design scales horizontally: 100 TB is
  * just more shards, not a bigger graph.
  *
  * Determinism (an intentional refinement over the reference, which
  * draws levels from `math/rand` — hnsw.go:283-289): the level of node
  * `id` is the reference's exact formula fed by a splitmix64 hash of the
  * id instead of the RNG stream, and every ordering (candidate heaps,
  * neighbor selection, pruning, final ranks) tie-breaks on ascending id.
  * Same input → bit-identical graph and results, across runs and
  * cluster layouts. Insertion order within a shard is ascending id.
  *
  * Graph semantics per shard mirror hnsw.go: greedy descent through
  * layers > 0 (hnsw.go:156-173), ef-bounded best-first at each build
  * layer (searchLayer, hnsw.go:343-394), distance-sorted neighbor
  * selection of M (2M at layer 0; hnsw.go:314-341), bidirectional edges
  * with pruning back to M (hnsw.go:414-431 — minus its short-list bug
  * that pads pruned edge lists with node-id 0). Level cap 16.
  */
object HnswIndex {

  /** Reference defaults (hnsw.go:45-51). */
  val M = 16
  val EfConstruction = 200
  val EfSearch = 200
  private val MaxLevel = 16

  /** Deterministic level for `id`: the reference's draw
    * `level = floor(-ln(1 - u) / ln(M))` with `u = rand.Intn(1e6)/1e6`
    * (hnsw.go:283-289) fed by splitmix64(id) instead of the RNG. */
  def levelOf(id: Long, m: Int): Int = {
    var z = id + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z = z ^ (z >>> 31)
    val u = (((z >>> 11) % 1000000L + 1000000L) % 1000000L).toDouble / 1000000.0
    val r = -math.log(1.0 - u) / math.log(m.toDouble)
    math.min(r.toInt, MaxLevel)
  }

  /** Identity partitioner on the shard id: exactly one shard per
    * partition. A hash `repartition(n, col("shard"))` would land ~n/e
    * partitions with 2-3 shards and leave others empty (balls-in-bins) —
    * stragglers on both the build and every fan-out search. */
  private final class ShardPartitioner(n: Int) extends org.apache.spark.Partitioner {
    def numPartitions: Int = n
    def getPartition(key: Any): Int = key.asInstanceOf[Int]
  }

  /** (shard → rows) with exactly one shard per partition. */
  private def byShardRdd[T: scala.reflect.ClassTag](
      keyed: org.apache.spark.rdd.RDD[(Int, T)], numShards: Int) =
    keyed.partitionBy(new ShardPartitioner(numShards))

  /** Build the sharded graph from an (id, vec) frame. One row per node:
    * (shard, id, vec, level, edges) with `edges(l)` the layer-l adjacency
    * list. One shuffle (the identity shard partition), then each shard
    * builds independently inside its own partition. */
  def build(vectors: DataFrame, numShards: Int, metric: Metric,
      m: Int = M, efConstruction: Int = EfConstruction): DataFrame = {
    require(numShards >= 1, s"numShards must be >= 1, got $numShards")
    val spark = vectors.sparkSession
    import spark.implicits._
    val keyed = vectors
      .select(pmod(col("id"), lit(numShards.toLong)).cast("int").as("shard"),
        col("id").cast("long"), col("vec"))
      .as[(Int, Long, Seq[Double])]
      .rdd
      .map { case (s, id, v) => (s, (id, v)) }
    val built = byShardRdd(keyed, numShards).mapPartitions { it =>
      val rows = new mutable.ArrayBuffer[(Long, Array[Double])]
      var shard = -1
      it.foreach { case (s, (id, v)) => shard = s; rows += ((id, v.toArray)) }
      if (rows.isEmpty) Iterator.empty
      else {
        val g = new LocalHnsw(m, efConstruction, metric)
        rows.sortInPlace()(Ordering.by(_._1))
        rows.foreach { case (id, v) => g.insert(id, v) }
        g.nodeRows.map { case (id, vec, level, edges) =>
          (shard, id, vec.toSeq, level, edges.map(_.toSeq).toSeq)
        }
      }
    }
    spark.createDataset(built).toDF("shard", "id", "vec", "level", "edges")
  }

  /** Incremental add (hnsw.go:97-139 Add-after-build): new vectors
    * route to their shard (`id % numShards`), and ONLY the affected
    * shards are rebuilt — untouched shards pass through, so the cost is
    * proportional to the touched fraction (and the rebuild read is
    * partition-pruned on a disk-backed graph). Because builds are
    * deterministic with ascending-id insertion, the result is
    * bit-identical to `build(old ∪ new)` — stronger than the reference's
    * order-dependent in-place insertion. */
  def add(graph: DataFrame, vectors: DataFrame, numShards: Int, metric: Metric,
      m: Int = M, efConstruction: Int = EfConstruction): DataFrame = {
    val newRows = vectors
      .select(pmod(col("id"), lit(numShards.toLong)).cast("int").as("shard"),
        col("id").cast("long"), col("vec"))
    val affected = newRows.select("shard").distinct()
    val untouched = graph.join(broadcast(affected), Seq("shard"), "left_anti")
    val toRebuild = graph.join(broadcast(affected), Seq("shard"), "left_semi")
      .select(col("id"), col("vec"))
      .unionByName(vectors.select(col("id"), col("vec")))
    untouched.unionByName(build(toRebuild, numShards, metric, m, efConstruction))
  }

  /** Remove nodes by id (hnsw.go:203-242 — the reference supports Remove
    * on HNSW only): drop the nodes' rows AND every edge pointing at them
    * (a per-row projection, no shuffle). The entry point needs no stored
    * update — [[LocalHnsw.fromRows]] recomputes it from the surviving
    * max-level nodes, which is exactly the reference's fallback
    * (hnsw.go:226-238). */
  def remove(graph: DataFrame, removed: Seq[Long]): DataFrame =
    graph
      .where(not(col("id").isin(removed: _*)))
      .withColumn("edges",
        transform(col("edges"), lvl => filter(lvl, e => !e.isin(removed: _*))))

  /** Batch kNN over the sharded graph: broadcast the query batch, fan
    * out to every shard (rebuilt node-map + stored edges — O(n) load, no
    * re-insertion), run the reference's descent + layer-0 ef-search per
    * query per shard, and merge shard-local top-ks through the shared
    * [[BoundedTopK]] → [[FlatIndex.topK]] pipeline. At most k·shards
    * rows reach the final merge per query. The defensive shard
    * repartition keeps each graph whole even if the input frame was
    * re-read or filtered; k ≤ 0 clamps to the engine-wide "all rows
    * ranked" brute-force path (flat.go:82-84 semantics). */
  def knnBlocked(graph: DataFrame, queries: DataFrame, k: Int, metric: Metric,
      efSearch: Int = EfSearch): DataFrame = {
    if (k <= 0)
      return FlatIndex.knn(graph.select(col("id"), col("vec")), queries, k, metric)
    val spark = graph.sparkSession
    import spark.implicits._
    val qRows = queries.select(col("query_id").cast("long"), col("qvec")).collect()
    val qids = qRows.map(_.getLong(0))
    val qvecs = qRows.map(_.getSeq[Double](1).toArray)
    val bc = spark.sparkContext.broadcast((qids, qvecs))
    val ef = math.max(efSearch, k)
    val nShards = graph.agg(max(col("shard"))).head.getInt(0) + 1
    val partials = byShardRdd(shardKeyed(graph), nShards)
      .mapPartitions { it =>
        val (ids, qs) = bc.value
        val heaps = Array.fill(qs.length)(new BoundedTopK(k))
        val rows = it.map(_._2).toArray
        if (rows.nonEmpty) {
          val g = LocalHnsw.fromTuples(rows, metric)
          var qi = 0
          while (qi < qs.length) {
            g.knn(qs(qi), k, ef).foreach { case (id, d) => heaps(qi).insert(id, d) }
            qi += 1
          }
        }
        BoundedTopK.drain(heaps, ids)
      }
    FlatIndex.topK(
      spark.createDataset(partials).toDF("query_id", "neighbor_id", "rank_key"),
      k, metric)
  }

  /** Graph rows keyed by shard for the identity partitioner. */
  private[graft] def shardKeyed(graph: DataFrame)
      : org.apache.spark.rdd.RDD[(Int, (Long, Seq[Double], Int, Seq[Seq[Long]]))] = {
    val spark = graph.sparkSession
    import spark.implicits._
    graph
      .select(col("shard"), col("id").cast("long"), col("vec"), col("level"),
        col("edges"))
      .as[(Int, Long, Seq[Double], Int, Seq[Seq[Long]])]
      .rdd
      .map { case (s, id, v, l, e) => (s, (id, v, l, e)) }
  }

  private[graft] def shardPartitioned(graph: DataFrame, numShards: Int)
      : org.apache.spark.rdd.RDD[(Int, (Long, Seq[Double], Int, Seq[Seq[Long]]))] =
    byShardRdd(shardKeyed(graph), numShards)
}

/** One shard's in-memory HNSW graph. Build-side mirrors
  * hnsw.go insertNode/searchLayer/selectNeighbors/pruneConnections with
  * heaps instead of re-sorted slices (same comparisons — orderings are
  * (rankKey, id), a monotone refinement of the reference's
  * distance-only sort) and deterministic levels from [[HnswIndex.levelOf]].
  */
private[graft] final class LocalHnsw(m: Int, efConstruction: Int, metric: Metric) {

  private final class Node(val id: Long, val vec: Array[Double], val level: Int) {
    val edges: Array[mutable.ArrayBuffer[Long]] =
      Array.fill(level + 1)(new mutable.ArrayBuffer[Long])
  }

  private val nodes = new mutable.LongMap[Node]
  private var entryPoint = -1L
  private var maxLevel = 0

  private def key(q: Array[Double], id: Long): Double =
    metric.rankKeyScalar(q, nodes(id).vec)

  /** Ascending (dist, id) — the engine tie-break. */
  private val nearestFirst: Ordering[(Double, Long)] = Ordering.Tuple2[Double, Long]

  def insert(id: Long, vec: Array[Double]): Unit = {
    val level = HnswIndex.levelOf(id, m)
    val node = new Node(id, vec, level)
    if (entryPoint == -1L) {
      entryPoint = id; maxLevel = level; nodes(id) = node; return
    }
    // Greedy descent from the entry point down to level+1 (hnsw.go:295-312)
    var curr = entryPoint
    var currDist = key(vec, curr)
    var lc = maxLevel
    while (lc > level) {
      var changed = true
      while (changed) {
        changed = false
        val cn = nodes(curr)
        if (lc < cn.edges.length) cn.edges(lc).foreach { nb =>
          val d = key(vec, nb)
          if (d < currDist) { currDist = d; curr = nb; changed = true }
        }
      }
      lc -= 1
    }
    // Register before connecting so back-edge pruning can score the new
    // node (the reference instead nil-skips it in pruneConnections,
    // hnsw.go:418-420, silently dropping the fresh back-edge — refined).
    nodes(id) = node
    // Connect at each layer from min(level, maxLevel) down to 0 (hnsw.go:314-341)
    lc = math.min(level, maxLevel)
    while (lc >= 0) {
      val cands = searchLayer(vec, curr, efConstruction, lc)
      val mMax = if (lc == 0) m * 2 else m
      val selected = cands.sorted(nearestFirst).take(mMax)
      selected.foreach { case (_, nbId) =>
        node.edges(lc) += nbId
        val nb = nodes(nbId)
        if (lc <= nb.level) {
          nb.edges(lc) += id
          if (nb.edges(lc).length > mMax) prune(nb, lc, mMax)
        }
      }
      if (selected.nonEmpty) curr = selected.head._2
      lc -= 1
    }
    if (level > maxLevel) { maxLevel = level; entryPoint = id }
  }

  /** Keep the M nearest of a node's layer edges (hnsw.go:414-431, with
    * the short-list truncated rather than zero-padded). */
  private def prune(node: Node, layer: Int, mMax: Int): Unit = {
    val kept = node.edges(layer)
      .map(nb => (metric.rankKeyScalar(node.vec, nodes(nb).vec), nb))
      .sorted(nearestFirst)
      .take(mMax)
      .map(_._2)
    node.edges(layer).clear()
    node.edges(layer) ++= kept
  }

  /** ef-bounded best-first expansion at one layer (hnsw.go:343-394):
    * min-heap of frontier candidates, bounded max-heap of the ef best
    * results; stop when the nearest frontier entry is farther than the
    * current worst kept result. */
  private def searchLayer(q: Array[Double], entry: Long, ef: Int,
      layer: Int): mutable.ArrayBuffer[(Double, Long)] = {
    val visited = new mutable.HashSet[Long]
    val frontier = new java.util.PriorityQueue[(Double, Long)](nearestFirst)
    val results = new java.util.PriorityQueue[(Double, Long)](nearestFirst.reverse)
    val d0 = key(q, entry)
    frontier.add((d0, entry)); results.add((d0, entry)); visited += entry
    while (!frontier.isEmpty) {
      val c = frontier.poll()
      if (nearestFirst.compare(c, results.peek()) > 0) {
        frontier.clear() // nearest frontier is beyond the worst keeper: done
      } else {
        val cn = nodes(c._2)
        if (layer < cn.edges.length) cn.edges(layer).foreach { nb =>
          if (visited.add(nb)) {
            val d = key(q, nb)
            if (results.size < ef || nearestFirst.compare((d, nb), results.peek()) < 0) {
              frontier.add((d, nb)); results.add((d, nb))
              if (results.size > ef) results.poll()
            }
          }
        }
      }
    }
    val out = new mutable.ArrayBuffer[(Double, Long)](results.size)
    results.forEach(e => out += e)
    out
  }

  /** Search this shard's graph (hnsw.go:141-186): greedy descent through
    * layers > 0, then layer-0 ef-search; top-k ascending (rankKey, id). */
  def knn(q: Array[Double], k: Int, efSearch: Int): Array[(Long, Double)] = {
    if (entryPoint == -1L) return Array.empty
    var curr = entryPoint
    var currDist = key(q, curr)
    var lc = maxLevel
    while (lc > 0) {
      var changed = true
      while (changed) {
        changed = false
        val cn = nodes(curr)
        if (lc < cn.edges.length) cn.edges(lc).foreach { nb =>
          val d = key(q, nb)
          if (d < currDist) { currDist = d; curr = nb; changed = true }
        }
      }
      lc -= 1
    }
    searchLayer(q, curr, efSearch, 0)
      .sorted(nearestFirst).take(k)
      .map { case (d, id) => (id, d) }.toArray
  }

  /** (id, vec, level, edges-per-level) rows for the graph table. */
  def nodeRows: Iterator[(Long, Array[Double], Int, Array[Array[Long]])] =
    nodes.valuesIterator.map(n => (n.id, n.vec, n.level, n.edges.map(_.toArray).toArray))
}

private[graft] object LocalHnsw {

  /** Rebuild a shard graph from stored (id, vec, level, edges) rows —
    * O(n) load, no re-insertion. The entry point is recomputed as the
    * min-id node of the max level, which is exactly the build-time
    * entry point: insertion is ascending by id and the entry only moves
    * when a node's level strictly exceeds the running max. */
  def fromTuples(rows: Iterable[(Long, Seq[Double], Int, Seq[Seq[Long]])],
      metric: Metric): LocalHnsw = {
    val g = new LocalHnsw(HnswIndex.M, HnswIndex.EfConstruction, metric)
    var entry = -1L
    var top = -1
    rows.foreach { case (id, vec, level, stored) =>
      val node = new g.Node(id, vec.toArray, level)
      var l = 0
      while (l <= level) {
        node.edges(l) ++= stored(l)
        l += 1
      }
      g.nodes(id) = node
      if (level > top || (level == top && id < entry)) { top = level; entry = id }
    }
    g.entryPoint = entry
    g.maxLevel = math.max(top, 0)
    g
  }
}
