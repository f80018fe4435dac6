package graft

import org.apache.spark.sql.functions._

import graft.core.{Metric, Tables}
import graft.index._

/** Scratch profiling main (not part of the driver contract). */
object Profile {
  def t[A](name: String)(body: => A): A = {
    val t0 = System.nanoTime()
    val r = body
    println(f"[profile] $name%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.GraftSession.local(32, "profile")
    import graft.queries.VectorQueries.vecTables

    val (corpus0, queries) = vecTables(spark, dir)
    val corpus = t("corpus cache+count")({ val c = corpus0.cache(); c.count(); c })

    val model = t("trainDeterministic(16)")(IvfIndex.trainDeterministic(corpus, 16, Metric.L2))
    val assigned = t("assign+count")({ val a = IvfIndex.assign(corpus, model); a.count(); a })
    t("probes+count")(IvfIndex.probes(queries, model, 4).count())
    t("ivf knn (uncached corpus)")(IvfIndex.knn(corpus0, model, queries, 10, 4).count())
    t("ivf knn (cached corpus)")(IvfIndex.knn(corpus, model, queries, 10, 4).count())

    t("sessionize")(graft.queries.StreamQueries.queries("events_sessionize")(spark, dir).count())
    val e = t("events load+count")({ val x = Tables.events(spark, dir).cache(); x.count(); x })
    t("sessionize (events cached)")({
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("epoch"), col("event_id"))
      val s = e.select(col("user_id"), col("event_id"), unix_timestamp(col("ts")).as("epoch"), col("value"))
        .withColumn("prev", lag(col("epoch"), 1).over(w))
      s.count()
    })

    // IVFPQ search breakdown at bench shape
    val n = 100000L
    val vec = spark.range(n).select(col("id"),
      transform(sequence(lit(0), lit(127)),
        i => pmod(xxhash64(col("id"), i, lit(0L)), lit(1000003L)).cast("double") / 1000003.0).as("vec"))
    val vecs = t("bench vectors cache")({ val v = vec.cache(); v.count(); v })
    val qs = spark.range(1000).select(col("id").as("query_id"),
      transform(sequence(lit(0), lit(127)),
        i => pmod(xxhash64(col("id"), i, lit(7777777L)), lit(1000003L)).cast("double") / 1000003.0).as("qvec"))
    val qsc = t("bench queries cache")({ val q = qs.cache(); q.count(); q })
    val train = vecs.limit(5000).cache(); train.count()
    val ipq = t("ivfpq train")(IvfPqIndex.train(train, 316, 8, 8, Metric.L2))
    val codes = t("ivfpq encode+cache")({ val c = IvfPqIndex.encode(vecs, ipq).cache(); c.count(); c })
    t("ivfpq probes only")(IvfIndex.probes(qsc, ipq.coarse, 10).count())
    t("ivfpq search")(IvfPqIndex.search(codes, ipq, qsc, 10, 10).count())
    t("ivfpq search again")(IvfPqIndex.search(codes, ipq, qsc, 10, 10).count())
    val ivfm = t("ivf train")(IvfIndex.train(train, 316, Metric.L2))
    val asg = t("ivf assign+cache")({ val a = IvfIndex.assign(vecs, ivfm).cache(); a.count(); a })
    t("ivf search")(IvfIndex.search(asg, ivfm, qsc, 10, 10).count())

    // IVF serving latency breakdown (r6: the serve section read 168 ms p50
    // locally vs 25 ms in r5 — separate job floor from scan cost)
    val singles = qsc.limit(100).collect().map(_.getSeq[Double](1).toArray)
    val server = new graft.query.IvfServer(asg, ivfm).warm()
    def pct(ts: Array[Double], p: Double) =
      ts.sorted.apply(math.min(ts.length - 1, (p * ts.length).toInt))
    def run(name: String)(body: Array[Double] => Unit): Unit = {
      body(singles.head); body(singles.head)
      val ts = singles.map { q =>
        val t0 = System.nanoTime(); body(q); (System.nanoTime() - t0) / 1e6
      }
      println(f"[profile] $name%-30s p50=${pct(ts, 0.5)}%8.2f ms  p95=${pct(ts, 0.95)}%8.2f ms  min=${ts.min}%8.2f ms")
    }
    run("serve ivf single")(q => server.search(q, 10, 10))
    // centroid conversion hoisted OUT of the timed lambda (IvfServer does
    // the same once at construction) — the row must isolate probeSet cost
    val centArrays = ivfm.centroids.map(_.toArray).toArray
    run("probeSet only (driver)")(q =>
      IvfIndex.probeSet(q, centArrays, Metric.L2, 10))
    run("serve ivf single again")(q => server.search(q, 10, 10))
    spark.stop()
  }
}
