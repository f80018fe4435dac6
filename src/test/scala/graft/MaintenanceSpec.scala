package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Metric, Validation}
import graft.index._
import graft.io.IndexIO
import graft.queries.VectorQueries

/** Incremental index maintenance on the persisted IVF kind: append new
  * vectors under the FROZEN trained model (the reference's add-after-
  * train staleness semantics — ivf.go:93-112: new vectors are assigned
  * with the existing centroids until an explicit re-train), remove ids
  * (P7 anti-join), re-save, re-open — search reflects both edits.
  */
class MaintenanceSpec extends AnyFunSuite {

  lazy val spark = TestSession.spark

  test("IVF append (frozen model) + remove + re-open round-trip") {
    import spark.implicits._
    val (corpus, queries) = VectorQueries.vecTables(spark, TestSession.Sf0001)
    val model = IvfIndex.trainDeterministic(corpus, 8, Metric.L2)
    val path = Files.createTempDirectory("graft_maint").toString
    IndexIO.saveIvf(spark, path, model, IvfIndex.assign(corpus, model))

    // -- append: new vectors assigned with the frozen centroids --
    val (loaded, codes) = IndexIO.loadIvf(spark, path)
    assert(loaded.centroids == model.centroids, "re-open must not re-train")
    val maxId = corpus.agg(max(col("id"))).first().getLong(0)
    val fresh = corpus.limit(20)
      .select((col("id") + maxId + 1).as("id"), col("vec"))
    val appended = codes.unionByName(IvfIndex.assign(fresh, loaded))

    // -- remove: a slice of the original ids, via the P7 anti-join --
    val removed = corpus.limit(10).select(col("id"))
    val maintained = Validation.removeIds(appended, removed)

    val path2 = Files.createTempDirectory("graft_maint2").toString
    IndexIO.saveIvf(spark, path2, loaded, maintained)
    val (model2, codes2) = IndexIO.loadIvf(spark, path2)
    assert(model2.centroids == model.centroids)

    val total = corpus.count() + 20 - 10
    assert(codes2.count() == total, s"expected $total rows after append+remove")

    // removed ids can never surface; appended ids are searchable
    val res = IvfIndex.searchBlocked(codes2, model2, queries, 10, nprobe = 8).cache()
    val removedIds = removed.as[Long].collect().toSet
    assert(res.where(col("neighbor_id").isin(removedIds.toSeq: _*)).count() == 0,
      "removed ids surfaced in search results")
    // an exact-duplicate query of an appended vector must find it at rank 1
    val probe = fresh.limit(1).select(col("id"), col("vec")).first()
    val qdf = Seq((probe.getLong(0), probe.getSeq[Double](1))).toDF("query_id", "qvec")
    val hit = IvfIndex.searchBlocked(codes2, model2, qdf, 1, nprobe = 1).first()
    assert(hit.getLong(1) == probe.getLong(0) && hit.getDouble(2) == 0.0,
      s"appended vector not served back: $hit")
    res.unpersist()
  }
}
