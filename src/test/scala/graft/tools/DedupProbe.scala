package graft.tools

import org.apache.spark.sql.functions._

/** Stage-level timing for dedup_components (r12: 24 s stable vs the
  * 3 s of its verifiedPairs sibling — find where the other 21 s go). */
object DedupProbe {
  def t[A](name: String)(body: => A): A = {
    val t0 = System.nanoTime()
    val r = body
    println(f"[dedup-probe] $name%-36s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.core.GraftSession.local(cpus, "graft-dedupprobe")
    val q = graft.SparkEntry.queries
    t("near_dup_minhash (warm #1)")(q("near_dup_minhash")(spark, dir).count())
    t("near_dup_minhash (warm #2)")(q("near_dup_minhash")(spark, dir).count())
    // dedup_components pieces
    val d = graft.core.Tables.load(spark, dir, "documents").where(col("doc_id") < 1000)
    val pairs = q("near_dup_minhash")(spark, dir)
      .select(col("id_a"), col("id_b"))
    val e = t("edges cache+count")({ val e = pairs.cache(); println("edges=" + e.count()); e })
    val collected = t("edges collect")(e.collect())
    println(s"[dedup-probe] edges collected: ${collected.length}")
    t("full dedup_components")(q("dedup_components")(spark, dir).count())
    t("full dedup_components again")(q("dedup_components")(spark, dir).count())
    spark.stop()
  }
}
