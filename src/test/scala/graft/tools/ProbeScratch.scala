package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// temporary profiling scratchpad — not part of the library surface.
// Isolates PlaidIndex.probeStats stages on the clustered-vocab world.
object ProbeScratch {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toLong).getOrElse(10000L)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[probe] $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    // corpus-scaled C (the bench's rule): C = ⌊√tokens⌋, vocab ≥ 8·C
    val c = args.lift(1).map(_.toInt)
      .getOrElse(graft.index.PlaidIndex.defaultC(nDocs * 48))
    val vocab = args.lift(2).map(_.toInt).getOrElse(math.max(4096, 8 * c))
    println(s"[probe] nDocs=$nDocs C=$c vocab=$vocab")
    val world = t("world")(graft.core.CorpusGen.plaidWorld(
      spark, nDocs, vocab, c, 48, 1))
    val post = t("build") {
      val p = graft.index.PlaidIndex.build(world.docs, world.model).cache()
      p.count(); p
    }
    val selQ = world.docs.where(col("doc_id") < 100)
      .select(col("doc_id").as("query_id"), col("text"))
    t("probeStats-1")(graft.index.PlaidIndex
      .probeStats(post, selQ, world.model)
      .agg(avg(col("scan_frac"))).first())
    t("probeStats-2")(graft.index.PlaidIndex
      .probeStats(post, selQ, world.model)
      .agg(avg(col("scan_frac"))).first())
    val selQc = selQ.cache(); selQc.count()
    t("probeStats-cachedQ")(graft.index.PlaidIndex
      .probeStats(post, selQc, world.model)
      .agg(avg(col("scan_frac"))).first())
    // nprobe recall ladder at this C: pruned vs full-probe (the bench's
    // plaid_sel_recall grading), plus scan/cand fractions per step
    val qTexts = world.docs.where(col("doc_id") < 100)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val fullLocal = new graft.query.LocalPlaidServer(world.docs, post,
      world.model.copy(nprobe = world.model.cents.length))
    val fullTop = qTexts.map { case (id, text) =>
      (id, fullLocal.search(id, text, 100, 10).map(_._1))
    }.toMap
    args.lift(3).map(_.split(",").map(_.trim.toInt).toSeq)
      .getOrElse(Seq(1, 2, 4, 8)).foreach { np =>
      val m = world.model.copy(nprobe = np)
      val stats = graft.index.PlaidIndex.probeStats(post, selQc, m)
        .agg(avg(col("scan_frac")), avg(col("cand_frac"))).first()
      val local = new graft.query.LocalPlaidServer(world.docs, post, m)
      var hits = 0; var total = 0
      qTexts.foreach { case (id, text) =>
        val pruned = local.search(id, text, 100, 10).map(_._1).toSet
        val full = fullTop(id)
        hits += full.count(pruned.contains); total += full.length
      }
      println(f"[probe] np$np recall ${hits.toDouble / total}%.4f scan_frac ${stats.getDouble(0)}%.4f cand_frac ${stats.getDouble(1)}%.4f")
    }
    spark.stop()
  }
}
