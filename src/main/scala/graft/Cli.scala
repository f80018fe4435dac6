package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{GraftSession, Metric, VectorGen}
import graft.index._
import graft.io.{GofaissImport, IndexIO}
import graft.query.{FlatKind, HnswKind, IvfKind, IvfPqKind, BqKind, LshKind, OpqKind, PqKind, RoutedHnswKind, Searcher, Sq8Kind}

/** Command-line lifecycle surface (reference: cmd/cli/main.go:17-73 —
  * bench/build/search subcommands; generate/info/import added for the
  * Spark-side lifecycle, where data lives in Parquet dirs, not .bin
  * files).
  *
  *   generate -n N -dim D -seed S -output DIR        seeded vector table
  *   build    -type flat|ivf|pq|opq|bq|sq8|ivfpq|lsh|hnsw|hnsw_routed -input DIR -output DIR
  *            [-metric l2|cosine|dot] [-nlist NL] [-m M] [-nbits B] [-planes P]
  *   search   -index DIR -query DIR -k K [-nprobe NP] [-limit L]
  *   bench    -type flat|ivf|pq|opq|bq|sq8|ivfpq|lsh|hnsw|hnsw_routed -vectors N -dim D -queries Q
  *   info     -index DIR                              meta echo
  *   reconstruct -index DIR -output DIR               GetVectors / dequantize dump
  *   merge    -a DIR -b DIR -output DIR               same-kind index union
  *   import   -input gofaiss.json[.gz] -output DIR [-metric l2] [-gzip]
  *
  * `search` opens the index via [[Searcher.open]] (type-detected from
  * meta, search.go:193-208) so the CLI exercises the same facade as
  * library users.
  */
object Cli {

  private def parseFlags(args: Array[String]): Map[String, String] =
    args.sliding(2, 2).collect {
      case Array(k, v) if k.startsWith("-") => k.stripPrefix("-") -> v
    }.toMap

  private def usage(): Nothing = {
    System.err.println(
      """graft-cli — Spark vector index lifecycle
        |  generate -n 10000 -dim 128 -seed 42 -output /tmp/vecs
        |  build    -type flat|ivf|pq|opq|bq|sq8|ivfpq|lsh|hnsw|hnsw_routed -input /tmp/vecs -output /tmp/idx
        |           [-metric l2] [-nlist 100] [-m 16] [-nbits 8] [-planes 8]
        |           [-ef 200] [-shards 32] [-eps 0.3 -replicas 2  (hnsw_routed replication)]
        |  search   -index /tmp/idx -query /tmp/vecs -k 10 -nprobe 10 -limit 5 [-local true]
        |  bench    -type flat|ivf|pq|opq|bq|sq8|ivfpq|lsh|hnsw|hnsw_routed -vectors 10000 -dim 128 -queries 100
        |  info     -index /tmp/idx
        |  reconstruct -index /tmp/idx -output /tmp/vecs_out
        |  merge    -a /tmp/idxA -b /tmp/idxB -output /tmp/idxM
        |  import   -input index.json -output /tmp/idx -metric l2 [-gzip true]""".stripMargin)
    sys.exit(1)
  }

  def main(args: Array[String]): Unit = {
    if (args.isEmpty) usage()
    val flags = parseFlags(args.tail)
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "graft-cli")
    try run(spark, args.head, flags)
    finally spark.stop()
  }

  private[graft] def run(spark: SparkSession, cmd: String, flags: Map[String, String]): Unit = {
    cmd match {
      case "generate" =>
        val n = flags.getOrElse("n", "10000").toLong
        val dim = flags.getOrElse("dim", "128").toInt
        val seed = flags.getOrElse("seed", "42").toLong
        val out = flags.getOrElse("output", usage())
        VectorGen.random(spark, n, dim, seed).write.mode("overwrite").parquet(out)
        println(s"generated $n x $dim vectors -> $out")

      case "build" =>
        val tpe = flags.getOrElse("type", "flat")
        val in = flags.getOrElse("input", usage())
        val out = flags.getOrElse("output", usage())
        val metric = Metric(flags.getOrElse("metric", "l2"))
        val vectors = spark.read.parquet(in).select(col("id"), col("vec"))
        val t0 = System.nanoTime()
        tpe match {
          case "flat" =>
            IndexIO.saveFlat(spark, out, vectors, metric)
          case "ivf" =>
            val nlist = flags.getOrElse("nlist", "100").toInt
            val model = IvfIndex.train(vectors, nlist, metric)
            IndexIO.saveIvf(spark, out, model, IvfIndex.assign(vectors, model))
          case "pq" =>
            val m = flags.getOrElse("m", "16").toInt
            val nbits = flags.getOrElse("nbits", "8").toInt
            val model = PqIndex.train(vectors, m, nbits, metric)
            IndexIO.savePq(spark, out, model, PqIndex.encode(vectors, model))
          case "opq" =>
            val m = flags.getOrElse("m", "16").toInt
            val nbits = flags.getOrElse("nbits", "8").toInt
            val model = OpqIndex.train(vectors, m, nbits, metric)
            IndexIO.saveOpq(spark, out, model, OpqIndex.encode(vectors, model))
          case "bq" =>
            val model = BqIndex.train(vectors, metric)
            IndexIO.saveBq(spark, out, model, BqIndex.encode(vectors, model))
          case "ivfpq" =>
            val nlist = flags.getOrElse("nlist", "100").toInt
            val m = flags.getOrElse("m", "8").toInt
            val nbits = flags.getOrElse("nbits", "8").toInt
            val model = IvfPqIndex.train(vectors, nlist, m, nbits, metric)
            IndexIO.saveIvfPq(spark, out, model, IvfPqIndex.encode(vectors, model))
          case "sq8" =>
            val model = Sq8Index.train(vectors, metric)
            IndexIO.saveSq8(spark, out, model, Sq8Index.encode(vectors, model))
          case "lsh" =>
            val planes = flags.getOrElse("planes", "8").toInt
            IndexIO.saveLsh(spark, out, LshIndex.index(vectors, planes), planes, metric)
          case "hnsw" =>
            // the reference's default index type (cmd/cli/main.go:84-87)
            val m = flags.getOrElse("m", HnswIndex.M.toString).toInt
            val ef = flags.getOrElse("ef", HnswIndex.EfConstruction.toString).toInt
            val shards = flags.getOrElse("shards", "32").toInt
            val graph = HnswIndex.build(vectors, shards, metric, m, ef)
            IndexIO.saveHnsw(spark, out, graph, metric, m, ef)
          case "hnsw_routed" =>
            // k-means-routed shards: -nlist regions, -nprobe at search
            // time; -eps > 0 turns on SPANN-style boundary replication
            // (closure assignment, capped at -replicas copies per vector)
            val m = flags.getOrElse("m", HnswIndex.M.toString).toInt
            val ef = flags.getOrElse("ef", HnswIndex.EfConstruction.toString).toInt
            val nlist = flags.getOrElse("nlist", "16").toInt
            val target = flags.getOrElse("shardrows",
              RoutedHnswIndex.DefaultTargetShardRows.toString).toLong
            val eps = flags.getOrElse("eps", "0").toDouble
            val replicas = flags.getOrElse("replicas", "2").toInt
            val model = RoutedHnswIndex.train(vectors, nlist, metric, target)
            val graph =
              if (eps > 0) RoutedHnswIndex.buildReplicated(vectors, model, eps, replicas, m, ef)
              else RoutedHnswIndex.build(vectors, model, m, ef)
            IndexIO.saveRoutedHnsw(spark, out, model, graph, m, ef)
          case t => System.err.println(s"unknown index type '$t'"); usage()
        }
        println(f"built $tpe index -> $out in ${(System.nanoTime() - t0) / 1e9}%.2f s")

      case "search" =>
        val idx = flags.getOrElse("index", usage())
        val qPath = flags.getOrElse("query", usage())
        val k = flags.getOrElse("k", "10").toInt
        val limit = flags.getOrElse("limit", "20").toInt
        var searcher = Searcher.open(spark, idx).withK(k)
        flags.get("nprobe").foreach(np => searcher = searcher.withNprobe(np.toInt))
        val queries = spark.read.parquet(qPath)
          .select(col("id").as("query_id"), col("vec").as("qvec"))
        if (flags.contains("local")) {
          // in-process mode: index collected to the driver once, each
          // query is a heap-resident scan/walk — no Spark job per query
          val server = searcher.localServer()
          val qRows = queries.orderBy("query_id").limit(limit).collect()
          val t0 = System.nanoTime()
          val out = qRows.map { r =>
            (r.getLong(0), server.search(r.getSeq[Double](1).toArray, k))
          }
          val ms = (System.nanoTime() - t0) / 1000000L
          println(s"${out.map(_._2.length).sum} results in ${ms} ms (local mode)")
          out.foreach { case (qid, rows) =>
            rows.foreach { case (id, d, rk) => println(f"$qid%8d $id%8d $d%12.4f $rk%4d") }
          }
        } else {
          val (res, n, ms) = searcher.searchTimed(queries)
          println(s"$n results in ${ms} ms")
          res.orderBy("query_id", "rank").show(limit, truncate = false)
        }

      case "bench" =>
        val tpe = flags.getOrElse("type", "flat")
        val n = flags.getOrElse("vectors", "10000").toLong
        val dim = flags.getOrElse("dim", "128").toInt
        val nq = flags.getOrElse("queries", "100").toInt
        val vectors = VectorGen.random(spark, n, dim, 42L).cache()
        vectors.count()
        val queries = VectorGen.random(spark, nq.toLong, dim, 1000L)
          .select(col("id").as("query_id"), col("vec").as("qvec")).cache()
        queries.count()
        val t0 = System.nanoTime()
        val kind = tpe match {
          case "flat" => FlatKind(vectors, Metric.L2)
          case "ivf" =>
            val nlist = math.max(16, math.sqrt(n.toDouble).toInt)
            val model = IvfIndex.train(vectors, nlist, Metric.L2)
            IvfKind(model, IvfIndex.assign(vectors, model).cache())
          case "pq" =>
            val model = PqIndex.train(vectors, 16, 8, Metric.L2)
            PqKind(model, PqIndex.encode(vectors, model).cache())
          case "opq" =>
            val model = OpqIndex.train(vectors, 16, 8, Metric.L2)
            OpqKind(model, OpqIndex.encode(vectors, model).cache())
          case "bq" =>
            val model = BqIndex.train(vectors, Metric.L2)
            BqKind(model, BqIndex.encode(vectors, model).cache())
          case "ivfpq" =>
            val nlist = math.max(16, math.sqrt(n.toDouble).toInt)
            val model = IvfPqIndex.train(vectors, nlist, 8, 8, Metric.L2)
            IvfPqKind(model, IvfPqIndex.encode(vectors, model).cache())
          case "sq8" =>
            val model = Sq8Index.train(vectors, Metric.L2)
            Sq8Kind(model, Sq8Index.encode(vectors, model).cache())
          case "lsh" =>
            val planes = flags.getOrElse("planes", "8").toInt
            LshKind(planes, LshIndex.index(vectors, planes).cache(), Metric.L2)
          case "hnsw" =>
            val shards = flags.getOrElse("shards", "32").toInt
            HnswKind(HnswIndex.build(vectors, shards, Metric.L2).cache(), Metric.L2)
          case "hnsw_routed" =>
            val nlist = flags.getOrElse("nlist", "16").toInt
            val target = flags.getOrElse("shardrows",
              RoutedHnswIndex.DefaultTargetShardRows.toString).toLong
            val model = RoutedHnswIndex.train(vectors, nlist, Metric.L2, target)
            RoutedHnswKind(model, RoutedHnswIndex.build(vectors, model).cache())
          case t => System.err.println(s"unknown index type '$t'"); usage()
        }
        val buildS = (System.nanoTime() - t0) / 1e9
        val searcher = Searcher(kind).withK(10)
        searcher.search(queries).count() // warmup
        val (_, cnt, ms) = searcher.searchTimed(queries)
        println(f"""|=== Benchmark Results ===
                    |Index Type: $tpe
                    |Vectors: $n, Dimension: $dim
                    |Build Time: ${buildS * 1000}%.2f ms
                    |Search Time: $ms ms total ($cnt rows)
                    |Avg Query Time: ${ms.toDouble / nq}%.4f ms
                    |Queries Per Second: ${1000.0 * nq / math.max(1L, ms)}%.2f""".stripMargin)

      case "info" =>
        val idx = flags.getOrElse("index", usage())
        IndexIO.readMeta(idx).toSeq.sortBy(_._1)
          .foreach { case (k, v) => println(s"$k: $v") }

      case "reconstruct" =>
        // GetVectors through the facade: verbatim for vector-holding
        // kinds, dequantized for SQ8/PQ/OPQ/IVFPQ, refused for BQ
        val idx = flags.getOrElse("index", usage())
        val out = flags.getOrElse("output", usage())
        val rec = Searcher.open(spark, idx).reconstruct()
        rec.write.mode("overwrite").parquet(out)
        println(s"reconstructed ${spark.read.parquet(out).count()} vectors -> $out")

      case "merge" =>
        val a = flags.getOrElse("a", usage())
        val b = flags.getOrElse("b", usage())
        val out = flags.getOrElse("output", usage())
        IndexIO.merge(spark, a, b, out)
        println(s"merged $a + $b -> $out (${IndexIO.readMeta(out)("index_type")})")

      case "import" =>
        val in = flags.getOrElse("input", usage())
        val out = flags.getOrElse("output", usage())
        val metric = Metric(flags.getOrElse("metric", "l2"))
        val gz = flags.get("gzip").exists(_.toBoolean)
        val (vectors, m) = GofaissImport.importFlat(spark, in, out, metric, gz)
        println(s"imported ${vectors.count()} vectors (metric ${m.name}) -> $out")

      case _ => usage()
    }
  }
}
