package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// temporary profiling scratchpad — not part of the library surface.
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = graft.core.Tables.load(spark, dir, "documents").select(col("doc_id"), col("text"))
    val model = graft.index.PlaidIndex.train(d, 24, 2)
    val post = graft.index.PlaidIndex.build(d, model).cache()
    val server = new graft.query.PlaidServer(d, post, model).warm()
    val qs = d.where(col("doc_id") < 100).collect().map(r => (r.getLong(0), r.getString(1)))
    server.search(qs.head._1, qs.head._2, 20, 10)
    val times = qs.map { case (id, t) =>
      val t1 = System.nanoTime(); server.search(id, t, 20, 10); (System.nanoTime()-t1)/1e6
    }.sorted
    println(f"[scratch] serve_plaid p50 ${times(times.length/2)}%.2f ms  p99 ${times((times.length*99)/100)}%.2f ms")
    server.unpersist(); post.unpersist()
    spark.stop()
  }
}
