package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Committed-artifact run of the 1M-token PLAID C-frontier (VERDICT r11
  * next #2: the `defaultC = 2·√tokens` rule in `PlaidIndex.defaultC` was
  * justified by ProbeScratch readings that existed only as SURVEY prose —
  * this main reproduces the ladder from HEAD and writes ONE JSON artifact
  * so the number that set the default is reproducible from the repo).
  *
  * Protocol (the r10/r11 probe shape): 100k docs × 48 token slots
  * (4.8M tokens), clustered vocab ≫ C, 100 query docs; for each C in
  * {√t, 2·√t (the rule), 4·√t} and each nprobe in {4, 8, 10, 16}:
  * recall of the pruned two-stage top-100 vs the full-probe pipeline,
  * mean scan_frac, mean cand_frac.
  *
  * Run: sbt "Test/runMain graft.tools.PlaidFrontier [nDocs] [outPath]"
  */
object PlaidFrontier {
  def main(args: Array[String]): Unit = {
    val nDocs = args.lift(0).map(_.toLong).getOrElse(100000L)
    val out = args.lift(1).getOrElse("BENCH_LOCAL_r12_1m_plaid.json")
    val tokensPerDoc = 48
    val totalTokens = nDocs * tokensPerDoc
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val sqrtT = math.sqrt(totalTokens.toDouble).toInt
    val ruleC = graft.index.PlaidIndex.defaultC(totalTokens)
    val ladder = Seq(("sqrt", sqrtT), ("rule_2sqrt", ruleC), ("4sqrt", 4 * sqrtT))
    val nprobes = Seq(4, 8, 10, 16)
    val sb = new StringBuilder
    sb.append(s"""{"protocol":"plaid_c_frontier","n_docs":$nDocs,""")
    sb.append(s""""tokens_per_doc":$tokensPerDoc,"total_tokens":$totalTokens,""")
    sb.append(s""""default_nprobe":${graft.index.PlaidIndex.DefaultNprobe},"points":[""")
    var first = true

    ladder.foreach { case (label, c) =>
      val vocab = math.max(4096, 8 * c)
      println(s"[frontier] C=$c ($label) vocab=$vocab")
      val t0 = System.nanoTime()
      val world = graft.core.CorpusGen.plaidWorld(
        spark, nDocs, vocab, c, tokensPerDoc, 1)
      val post = graft.index.PlaidIndex.build(world.docs, world.model).cache()
      post.count()
      val buildSec = (System.nanoTime() - t0) / 1e9
      println(f"[frontier] build $buildSec%.1f s")

      val qTexts = world.docs.where(col("doc_id") < 100)
        .collect().map(r => (r.getLong(0), r.getString(1)))
      val selQ = world.docs.where(col("doc_id") < 100)
        .select(col("doc_id").as("query_id"), col("text")).cache()
      selQ.count()
      // full-probe ground truth through the SAME pipeline
      val fullLocal = new graft.query.LocalPlaidServer(world.docs, post,
        world.model.copy(nprobe = world.model.cents.length))
      val fullTop = qTexts.map { case (id, text) =>
        (id, fullLocal.search(id, text, 100, 10).map(_._1))
      }.toMap

      nprobes.foreach { np =>
        val m = world.model.copy(nprobe = np)
        val stats = graft.index.PlaidIndex.probeStats(post, selQ, m)
          .agg(avg(col("scan_frac")), avg(col("cand_frac"))).first()
        val local = new graft.query.LocalPlaidServer(world.docs, post, m)
        var hits = 0L; var total = 0L
        qTexts.foreach { case (id, text) =>
          val pruned = local.search(id, text, 100, 10).map(_._1).toSet
          val full = fullTop(id)
          hits += full.count(pruned.contains); total += full.length
        }
        val recall = hits.toDouble / total
        val (scan, cand) = (stats.getDouble(0), stats.getDouble(1))
        println(f"[frontier] C=$c np$np recall $recall%.4f scan $scan%.4f cand $cand%.4f")
        if (!first) sb.append(",")
        first = false
        sb.append(f"""{"label":"$label","c":$c,"nprobe":$np,""")
        sb.append(f""""recall":$recall%.4f,"scan_frac":$scan%.4f,""")
        sb.append(f""""cand_frac":$cand%.4f,"build_sec":$buildSec%.1f}""")
      }
      selQ.unpersist(); post.unpersist()
    }
    sb.append("]}")
    Files.writeString(Paths.get(out), sb.toString + "\n")
    println(s"[frontier] wrote $out")
    spark.stop()
  }
}
