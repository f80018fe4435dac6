package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** CLI lifecycle (cmd/cli/main.go surface): generate → build → info →
  * search, each subcommand driving the same library paths users call. */
class CliSpec extends AnyFunSuite {

  lazy val spark = TestSession.spark

  test("generate -> build ivf -> info -> search lifecycle") {
    val vecs = Files.createTempDirectory("cli_vecs").toString
    val idx = Files.createTempDirectory("cli_idx").toString
    Cli.run(spark, "generate",
      Map("n" -> "300", "dim" -> "8", "seed" -> "42", "output" -> vecs))
    assert(spark.read.parquet(vecs).count() == 300)
    Cli.run(spark, "build",
      Map("type" -> "ivf", "input" -> vecs, "output" -> idx, "nlist" -> "8"))
    val meta = graft.io.IndexIO.readMeta(idx)
    assert(meta("index_type") == "ivf" && meta("nlist") == "8")
    Cli.run(spark, "info", Map("index" -> idx))
    Cli.run(spark, "search",
      Map("index" -> idx, "query" -> vecs, "k" -> "3", "nprobe" -> "2", "limit" -> "3"))
    // in-process serving mode through the same persisted index
    Cli.run(spark, "search",
      Map("index" -> idx, "query" -> vecs, "k" -> "3", "nprobe" -> "2",
        "limit" -> "3", "local" -> "true"))
  }

  test("build hnsw (reference default type) -> search lifecycle") {
    val vecs = Files.createTempDirectory("cli_vecs3").toString
    val idx = Files.createTempDirectory("cli_idx3").toString
    Cli.run(spark, "generate",
      Map("n" -> "300", "dim" -> "8", "seed" -> "7", "output" -> vecs))
    // the reference CLI's documented command line (cmd/cli/main.go:84-87)
    // works verbatim and lands on the real sharded-HNSW kind
    Cli.run(spark, "build",
      Map("type" -> "hnsw", "input" -> vecs, "output" -> idx, "shards" -> "4"))
    val meta = graft.io.IndexIO.readMeta(idx)
    assert(meta("index_type") == "hnsw" && meta("num_shards") == "4")
    Cli.run(spark, "info", Map("index" -> idx)) // stats must resolve the graph table
    Cli.run(spark, "search",
      Map("index" -> idx, "query" -> vecs, "k" -> "3", "limit" -> "3"))
    Cli.run(spark, "bench",
      Map("type" -> "hnsw", "vectors" -> "200", "dim" -> "8", "queries" -> "10", "shards" -> "2"))
  }

  test("build bq / opq / hnsw_routed -> info -> search lifecycles (round-8 kinds)") {
    val vecs = Files.createTempDirectory("cli_vecs_r8").toString
    Cli.run(spark, "generate",
      Map("n" -> "300", "dim" -> "8", "seed" -> "11", "output" -> vecs))
    Seq(
      ("bq", Map.empty[String, String], Map("index_type" -> "bq")),
      ("opq", Map("m" -> "4", "nbits" -> "4"), Map("index_type" -> "opq", "m" -> "4")),
      ("hnsw_routed", Map("nlist" -> "4", "shardrows" -> "64"),
        Map("index_type" -> "hnsw_routed", "nlist" -> "4")),
      // replicated variant: -eps turns on closure assignment; the saved
      // graph serves through the same searcher (merge dedups replicas)
      ("hnsw_routed", Map("nlist" -> "4", "shardrows" -> "64",
        "eps" -> "0.4", "replicas" -> "2"),
        Map("index_type" -> "hnsw_routed", "nlist" -> "4"))
    ).foreach { case (tpe, extra, expect) =>
      val idx = Files.createTempDirectory(s"cli_idx_$tpe").toString
      Cli.run(spark, "build",
        Map("type" -> tpe, "input" -> vecs, "output" -> idx) ++ extra)
      val meta = graft.io.IndexIO.readMeta(idx)
      expect.foreach { case (k, v) => assert(meta(k) == v, s"$tpe meta $k") }
      Cli.run(spark, "info", Map("index" -> idx)) // stats resolve the codes/graph table
      Cli.run(spark, "search",
        Map("index" -> idx, "query" -> vecs, "k" -> "3", "nprobe" -> "2", "limit" -> "3"))
    }
  }

  test("build lsh -> search lifecycle") {
    val vecs = Files.createTempDirectory("cli_vecs4").toString
    val idx = Files.createTempDirectory("cli_idx4").toString
    Cli.run(spark, "generate",
      Map("n" -> "300", "dim" -> "8", "seed" -> "7", "output" -> vecs))
    Cli.run(spark, "build",
      Map("type" -> "lsh", "input" -> vecs, "output" -> idx, "planes" -> "6"))
    val meta = graft.io.IndexIO.readMeta(idx)
    assert(meta("index_type") == "lsh" && meta("planes") == "6")
    Cli.run(spark, "search",
      Map("index" -> idx, "query" -> vecs, "k" -> "3", "limit" -> "3"))
    Cli.run(spark, "bench",
      Map("type" -> "lsh", "vectors" -> "200", "dim" -> "8", "queries" -> "10", "planes" -> "4"))
  }

  test("build sq8 -> search lifecycle") {
    val vecs = Files.createTempDirectory("cli_vecs5").toString
    val idx = Files.createTempDirectory("cli_idx5").toString
    Cli.run(spark, "generate",
      Map("n" -> "300", "dim" -> "8", "seed" -> "11", "output" -> vecs))
    Cli.run(spark, "build",
      Map("type" -> "sq8", "input" -> vecs, "output" -> idx))
    val meta = graft.io.IndexIO.readMeta(idx)
    assert(meta("index_type") == "sq8" && meta("dim") == "8")
    Cli.run(spark, "search",
      Map("index" -> idx, "query" -> vecs, "k" -> "3", "limit" -> "3"))
    Cli.run(spark, "bench",
      Map("type" -> "sq8", "vectors" -> "200", "dim" -> "8", "queries" -> "10"))
  }

  test("build flat + bench smoke") {
    val vecs = Files.createTempDirectory("cli_vecs2").toString
    val idx = Files.createTempDirectory("cli_idx2").toString
    Cli.run(spark, "generate",
      Map("n" -> "100", "dim" -> "4", "seed" -> "1", "output" -> vecs))
    Cli.run(spark, "build", Map("type" -> "flat", "input" -> vecs, "output" -> idx))
    assert(graft.io.IndexIO.readMeta(idx)("index_type") == "flat")
    Cli.run(spark, "bench",
      Map("type" -> "flat", "vectors" -> "200", "dim" -> "8", "queries" -> "10"))
  }

  test("reconstruct subcommand: exact for flat, dequantized round trip for sq8") {
    val vecs = Files.createTempDirectory("cli_vecs_r").toString
    Cli.run(spark, "generate",
      Map("n" -> "100", "dim" -> "8", "seed" -> "5", "output" -> vecs))
    val truth = spark.read.parquet(vecs).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    for ((tpe, exact) <- Seq("flat" -> true, "sq8" -> false)) {
      val idx = Files.createTempDirectory(s"cli_idx_r_$tpe").toString
      val out = Files.createTempDirectory(s"cli_rec_$tpe").toString
      Cli.run(spark, "build", Map("type" -> tpe, "input" -> vecs, "output" -> idx))
      Cli.run(spark, "reconstruct", Map("index" -> idx, "output" -> out))
      val rec = spark.read.parquet(out).collect()
        .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
      assert(rec.keySet == truth.keySet)
      if (exact) rec.foreach { case (id, v) => assert(v == truth(id), s"$tpe $id") }
      else rec.foreach { case (id, v) =>
        v.zip(truth(id)).foreach { case (a, b) => assert(math.abs(a - b) < 0.1) }
      }
    }
  }
}
