package graft.tools

import org.apache.spark.sql.functions._

object DecodeProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local(32, "decode-probe")
    import spark.implicits._
    val dim = 128
    def pseudo(id: org.apache.spark.sql.Column, i: org.apache.spark.sql.Column, salt: Long) =
      pmod(xxhash64(id, i, lit(salt)), lit(1000003L)).cast("double") / 1000003.0
    val vectors = spark.range(100000L).select(col("id"),
      transform(sequence(lit(0), lit(dim - 1)), i => pseudo(col("id"), i, 0L)).as("vec")).cache()
    vectors.count()
    def t(name: String)(body: => Unit): Unit = {
      body // warm
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }
      println(f"[decode] $name%-28s min=${times.min}%.3f s")
    }
    // decode-only: sum one element per row through the primitive encoder
    t("decode Array[Double]") {
      val n = vectors.select(col("id").cast("long"), col("vec"))
        .as[(Long, Array[Double])]
        .mapPartitions { it => var s = 0.0; var n = 0L; while (it.hasNext) { s += it.next()._2(0); n += 1 }; Iterator.single(n) }
        .reduce(_ + _)
      require(n == 100000L)
    }
    // columnar scan without array decode: just count via id
    t("scan id only") {
      val n = vectors.select(col("id").cast("long")).as[Long]
        .mapPartitions { it => var n = 0L; while (it.hasNext) { it.next(); n += 1 }; Iterator.single(n) }
        .reduce(_ + _)
      require(n == 100000L)
    }
    spark.stop()
  }
}
