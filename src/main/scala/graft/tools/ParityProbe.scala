package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.Metric
import graft.index.HnswIndex

// temporary debugging scratchpad — not part of the library surface.
object ParityProbe {
  def main(args: Array[String]): Unit = {
    val n = 5000L
    val nq = 50
    val regions = 8
    val dim = 128
    val K = 10
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val all = graft.core.VectorGen.clusteredBridged(
      spark, n + nq, dim, 16, spread = 0.3, bridgeFrac = 0.25, seed = 23L)
    val cvec = all.where(col("id") < n).cache(); cvec.count()
    val cq = all.where(col("id") >= n)
      .select(col("id").as("query_id"), col("vec").as("qvec")).cache(); cq.count()
    val hg = HnswIndex.build(cvec, regions, Metric.L2).cache(); hg.count()

    val blocked = HnswIndex.knnBlocked(hg, cq, K, Metric.L2, efSearch = 50,
      numShards = regions)
      .select("query_id", "neighbor_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .groupBy(_._1).map { case (q, rs) => (q, rs.sortBy(_._3).map(_._2).toSeq) }

    val local = new graft.query.LocalHnswServer(hg, Metric.L2, regions)
    val qArr = cq.collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val single = qArr.map { case (qid, qv) =>
      (qid, local.search(qv, K, efSearch = 50).map(_._1).toSeq)
    }.toMap
    val batchOut = local.searchBatch(qArr.map(_._2), K, efSearch = 50)
    val batch = qArr.indices.map(i => (qArr(i)._1, batchOut(i).map(_._1).toSeq)).toMap

    var sVb = 0; var bVblk = 0
    qArr.foreach { case (qid, _) =>
      if (single(qid) != batch(qid)) {
        sVb += 1
        if (sVb <= 2) println(s"single!=batch q=$qid\n  s=${single(qid)}\n  b=${batch(qid)}")
      }
      if (batch(qid) != blocked(qid)) {
        bVblk += 1
        if (bVblk <= 2) println(s"batch!=blocked q=$qid\n  b=${batch(qid)}\n  k=${blocked(qid)}")
      }
    }
    println(s"[parity] single!=batch: $sVb/${qArr.length}  batch!=blocked: $bVblk/${qArr.length}")
    spark.stop()
  }
}
