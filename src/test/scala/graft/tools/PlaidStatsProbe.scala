package graft.tools

import org.apache.spark.sql.functions._

/** Isolates plaid_sel_stats_sec (PlaidIndex.probeStats at the bench's
  * selectivity-world shape) — the r13 32c bench runs read 24–35 s where
  * r12 read ~5 s and the r13 8c run read 2.6 s; this probe decides
  * weather vs regression. Run:
  *   SPARK_GRAFT_CPUS=N sbt "Test/runMain graft.tools.PlaidStatsProbe"
  */
object PlaidStatsProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.core.GraftSession.local(cpus, "plaid-stats-probe")
    import graft.index.{PlaidIndex => PI}
    val selDocs = 10000L
    val selC = PI.defaultC(selDocs * 48)
    val selVocab = math.max(4096, 8 * selC)
    val world = graft.core.CorpusGen.plaidWorld(spark, selDocs,
      vocabSize = selVocab, c = selC, tokensPerDoc = 48, nprobe = PI.DefaultNprobe)
    val post = PI.build(world.docs, world.model).cache(); post.count()
    val q = world.docs.where(col("doc_id") < 100)
      .select(col("doc_id").as("query_id"), col("text"))
    def once(): Double = {
      val t0 = System.nanoTime()
      PI.probeStats(post, q, world.model)
        .agg(avg(col("scan_frac")), avg(col("cand_frac"))).first()
      (System.nanoTime() - t0) / 1e9
    }
    once() // warm
    val times = (1 to 3).map(_ => once())
    println(f"[plaid-stats] cpus=$cpus C=$selC min=${times.min}%.2f all=${times.map(t => f"$t%.2f").mkString(",")}")
    spark.stop()
  }
}
