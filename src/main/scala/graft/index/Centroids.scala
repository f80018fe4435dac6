package graft.index

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Centroid training + nearest-centroid assignment (SURVEY.md J2/A1/A2).
  *
  * Assignment is a zero-shuffle argmin: the centroid set (≤ 65536 × dim
  * doubles — a few MB at most) travels as a foldable literal inside the
  * projection, so assigning a 100 TB vector table is a pure map with no
  * join and no shuffle — the Spark analog of the reference's in-memory
  * `findNearestCentroid` loop (ivf.go:240-252).
  */
object Centroids {

  /** Reference default nlist = ⌊√n⌋ clamped to [10, 65536]
    * (ivf.go:32-45; lower clamp is 1 when n is tiny). */
  def defaultNlist(n: Long): Int =
    math.max(1, math.min(65536, math.min(n, math.max(10, math.sqrt(n.toDouble).toInt)))).toInt

  /** `ARRAY<ARRAY<DOUBLE>>` literal of the centroid matrix. */
  def centroidLit(centroids: Seq[Seq[Double]]): Column = typedlit(centroids)

  /** Argmin over the centroid literal: returns STRUCT<cluster_id INT,
    * dist2 DOUBLE> — a codegen'd fold, no shuffle, no UDF. Ties break
    * toward the lower cluster_id (strict `<`). */
  def nearest(vec: Column, centroids: Seq[Seq[Double]]): Column = {
    val cents = centroidLit(centroids)
    aggregate(
      sequence(lit(0), lit(centroids.size - 1)),
      struct(lit(-1).cast("int").as("cluster_id"), lit(Double.MaxValue).as("dist2")),
      (acc, i) => {
        val d = l2Sq(vec, element_at(cents, i + 1))
        when(d < acc("dist2"),
          struct(i.cast("int").as("cluster_id"), d.as("dist2"))).otherwise(acc)
      })
  }

  /** Deterministic, SQL-expressible "training": centroid c = mean of the
    * vectors whose `id % nlist == c`. Exercises the same assignment /
    * probe machinery as k-means centroids while staying reproducible in
    * the DuckDB oracle. Returns centroids ordered by bucket. */
  def bucketMeans(vectors: DataFrame, nlist: Int,
      idCol: String = "id", vecCol: String = "vec"): Seq[Seq[Double]] = {
    val rows = vectors
      .select((col(idCol) % nlist).cast("int").as("bucket"), posexplode(col(vecCol)).as(Seq("pos", "x")))
      .groupBy(col("bucket"), col("pos"))
      .agg(avg(col("x")).as("m"))
      .groupBy(col("bucket"))
      .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("ps"))
      .select(col("bucket"), col("ps.m").as("cv"))
      .orderBy("bucket")
      .collect()
    rows.map(r => r.getSeq[Double](1).toVector).toVector
  }

  /** MLlib k-means centroids (the production trainer — parallel Lloyd's,
    * replacing the reference's serial loop, ivf.go:255-317 / SURVEY.md A2).
    * maxIter 10 mirrors the reference's iteration cap. */
  def kMeans(vectors: DataFrame, k: Int, seed: Long = 42L, maxIter: Int = 10,
      vecCol: String = "vec"): Seq[Seq[Double]] = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val feats = vectors.select(array_to_vector(col(vecCol)).as("features"))
    val model = new KMeans()
      .setK(k).setSeed(seed).setMaxIter(maxIter)
      .setFeaturesCol("features")
      .fit(feats)
    model.clusterCenters.map(_.toArray.toVector).toVector
  }
}
