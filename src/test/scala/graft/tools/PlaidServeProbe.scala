package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// temporary profiling scratchpad — not part of the library surface.
// Isolates PlaidServer.search latency at the bench's plaid_sel protocol:
//   runMain graft.tools.PlaidServeProbe [nDocs] [c] [vocab]
// Prints p50/p95/p99 plus a driver-prep-only timing split so a serving
// regression can be attributed to driver prep vs the job.
object PlaidServeProbe {
  def main(args: Array[String]): Unit = {
    val nDocs = args.lift(0).map(_.toLong).getOrElse(10000L)
    val c = args.lift(1).map(_.toInt)
      .getOrElse(graft.index.PlaidIndex.defaultC(nDocs * 48))
    val vocab = args.lift(2).map(_.toInt).getOrElse(math.max(4096, 8 * c))
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println(s"[probe] nDocs=$nDocs C=$c vocab=$vocab")
    val world = graft.core.CorpusGen.plaidWorld(spark, nDocs, vocab, c, 48, 1)
    val post = graft.index.PlaidIndex.build(world.docs, world.model).cache()
    post.count()
    val server = new graft.query.PlaidServer(world.docs, post, world.model).warm()
    val qTexts = world.docs.where(col("doc_id") < 100)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // control: no-op jobs over a trivial 8-partition cached rdd — if this
    // also reads tens of ms, the floor is scheduler warmup/dispatch, not
    // anything about the serving rdd
    val ctl = spark.sparkContext.parallelize(1 to 8, 8).cache()
    ctl.count()
    (1 to 200).foreach(_ => ctl.mapPartitions(_ => Iterator.single(1)).collect())
    val ctlT = (1 to 30).map { _ =>
      val t0 = System.nanoTime()
      ctl.mapPartitions(_ => Iterator.single(1)).collect()
      (System.nanoTime() - t0) / 1e6
    }.sorted
    println(f"[probe] control floor p50 ${ctlT(15)}%.1f ms")
    // floor: the no-op job over the same partitions
    val floor = (1 to 30).map { _ =>
      val t0 = System.nanoTime(); server.floorProbe(); (System.nanoTime() - t0) / 1e6
    }.sorted
    println(f"[probe] floor p50 ${floor(15)}%.1f ms")
    qTexts.take(5).foreach { case (qid, text) => server.search(qid, text, 50, 10) }
    val times = qTexts.map { case (qid, text) =>
      val t0 = System.nanoTime()
      server.search(qid, text, 50, 10)
      (System.nanoTime() - t0) / 1e6
    }.sorted
    def pct(p: Double) = times(math.min(times.length - 1, (times.length * p).toInt))
    println(f"[probe] search p50 ${pct(0.50)}%.1f p95 ${pct(0.95)}%.1f p99 ${pct(0.99)}%.1f ms")
    spark.stop()
  }
}
