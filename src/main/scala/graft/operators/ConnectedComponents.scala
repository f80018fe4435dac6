package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components by iterative min-label propagation —
  * the clustering step that turns verified near-duplicate PAIRS into
  * duplicate GROUPS (pick one keeper per component, drop the rest).
  *
  * Each iteration is two equi-joins and a min-aggregation, all keyed on
  * the node id — no cross products, no driver-side graph. Convergence
  * takes diameter(G) rounds; near-dup graphs are unions of small dense
  * clusters (diameter 2–3 in practice), so the loop is short. For
  * adversarial long-chain graphs the large-star/small-star rewrite
  * (Kiveris et al., "Connected Components in MapReduce and Beyond")
  * drops this to O(log n) rounds; plain propagation is kept here because
  * near-dup components are shallow and the semantics stay expressible as
  * the DuckDB reachability oracle.
  *
  * Per-round frames are materialized via cache()+count() so each
  * iteration's plan reads the previous labels once instead of replaying
  * the whole lineage; the previous round is unpersisted as soon as the
  * next is resident.
  */
object ConnectedComponents {

  /** Label every node with the minimum node id reachable from it.
    *
    * @param nodes single-column frame `(id LONG)` — every node to label,
    *              including isolated ones (they keep their own id)
    * @param edges undirected edge list `(id_a, id_b)`; orientation and
    *              duplicates are irrelevant
    * @return `(id, comp)` with `comp` = min reachable id
    */
  def label(nodes: DataFrame, edges: DataFrame, maxIter: Int = 25): DataFrame = {
    val adj = edges.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(edges.select(col("id_b").as("src"), col("id_a").as("dst")))
      .cache()
    var labels = nodes.select(col("id"), col("id").as("comp")).cache()
    labels.count()
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val viaNeighbor = adj
        .join(labels.select(col("id").as("dst"), col("comp")), Seq("dst"))
        .select(col("src").as("id"), col("comp"))
      val next = labels.select(col("id"), col("comp")).union(viaNeighbor)
        .groupBy("id").agg(min("comp").as("comp"))
        .cache()
      val changed = next
        .join(labels.select(col("id"), col("comp").as("prev")), Seq("id"))
        .where(col("comp") =!= col("prev"))
        .count()
      labels.unpersist()
      labels = next
      converged = changed == 0
      iter += 1
    }
    adj.unpersist()
    labels
  }
}
