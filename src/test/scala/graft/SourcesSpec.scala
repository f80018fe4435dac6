package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Metric, Validation, VectorGen}
import graft.index.FlatIndex
import graft.io.{IndexIO, Migrations}
import graft.sources.TextSources

/** Coverage for the remaining SURVEY §2 surfaces: text/CSV sources
  * (S4/S5/P6), generators (S1–S3), validation guards (P1/P2/P7),
  * migration registry (S11), SQL function registration (§2.10).
  */
class SourcesSpec extends AnyFunSuite {

  lazy val spark = TestSession.spark

  test("csvEmbeddings parses float CSV lines into (id, vec)") {
    val f = Files.createTempFile("graft_emb", ".csv")
    Files.writeString(f, "1.0,2.0,3.0\n4.0,5.0,6.0\n")
    val df = TextSources.csvEmbeddings(spark, f.toString)
    assert(df.count() == 2)
    assert(df.orderBy("id").first().getSeq[Double](1) == Seq(1.0, 2.0, 3.0))
  }

  test("delimitedReviews splits ' | ' fields, strips prefixes, drops malformed (P6)") {
    val f = Files.createTempFile("graft_rev", ".txt")
    Files.writeString(f,
      "Great pizza | Restaurant: Roma | Cuisine: Italian | City: Berlin\n" +
        "malformed line without fields\n" +
        "Nice curry | Restaurant: Taj | Cuisine: Indian | City: London\n")
    val df = TextSources.delimitedReviews(spark, f.toString)
    assert(df.count() == 2)
    val r = df.orderBy("id").collect()
    assert(r.map(_.getString(2)).toSeq == Seq("Roma", "Taj"))
    assert(r.map(_.getString(4)).toSeq == Seq("Berlin", "London"))
  }

  test("generators: random is deterministic; pattern and orthogonal match spec (S1-S3)") {
    val a = VectorGen.random(spark, 10, 8, seed = 42).collect()
    val b = VectorGen.random(spark, 10, 8, seed = 42).collect()
    assert(a.map(_.getSeq[Double](1)).toSeq == b.map(_.getSeq[Double](1)).toSeq)
    val p = VectorGen.pattern(spark, 3, 4).orderBy("id").collect()
    assert(p(1).getSeq[Double](1) == Seq(4.0, 5.0, 6.0, 7.0))
    val o = VectorGen.orthogonal(spark, 3).orderBy("id").collect()
    assert(o(2).getSeq[Double](1) == Seq(0.0, 0.0, 1.0))
  }

  test("validation guards: dim mismatch and zero vectors rejected (P1/P2)") {
    import spark.implicits._
    val ok = Seq((1L, Seq(1.0, 2.0)), (2L, Seq(3.0, 4.0))).toDF("id", "vec")
    Validation.requireDim(ok, 2)
    val mixed = Seq((1L, Seq(1.0, 2.0)), (2L, Seq(3.0))).toDF("id", "vec")
    intercept[IllegalArgumentException](Validation.requireDim(mixed, 2))
    assert(Validation.filterDim(mixed, 2).count() == 1)
    val withZero = Seq((1L, Seq(0.0, 0.0)), (2L, Seq(1.0, 0.0))).toDF("id", "vec")
    intercept[IllegalArgumentException](Validation.requireNonZero(withZero))
    assert(Validation.filterNonZero(withZero).count() == 1)
  }

  test("removeIds drops removed vectors from search results (P7)") {
    val (corpus, queries) = graft.queries.VectorQueries.vecTables(spark, TestSession.Sf0001)
    import spark.implicits._
    val removed = Seq(0L, 1L, 2L, 3L, 4L, 5L, 6L, 7L).toDF("id")
    val pruned = Validation.removeIds(corpus, removed)
    assert(pruned.count() == corpus.count() - 8)
    val res = FlatIndex.knn(pruned, queries, 10, Metric.L2)
    assert(res.where(col("neighbor_id") < 8).count() == 0)
  }

  test("migration registry chains version rewrites (S11)") {
    val (corpus, _) = graft.queries.VectorQueries.vecTables(spark, TestSession.Sf0001)
    val path = Files.createTempDirectory("graft_mig").toString
    IndexIO.saveFlat(spark, path, corpus.limit(10), Metric.L2)
    // simulate an old index
    IndexIO.writeMeta(path, IndexIO.readMeta(path) + ("version" -> "0.9.0"))
    var ran = Vector.empty[String]
    Migrations.register("0.9.0", "0.9.5") { (_, _) => ran :+= "a" }
    Migrations.register("0.9.5", "1.0.0") { (_, _) => ran :+= "b" }
    Migrations.migrate(spark, path, "1.0.0")
    assert(ran == Vector("a", "b"))
    assert(IndexIO.readMeta(path)("version") == "1.0.0")
    IndexIO.checkCompatible(IndexIO.readMeta(path)("version"))
  }

  test("SQL registration exposes graft_l2sq/graft_dot to spark.sql (§2.10)") {
    org.apache.spark.sql.graftx.DistanceExpressions.register(spark)
    val r = spark.sql(
      "SELECT graft_l2sq(array(0.0D, 0.0D), array(3.0D, 4.0D)) AS d2, " +
        "graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS dp").first()
    assert(r.getDouble(0) == 25.0 && r.getDouble(1) == 11.0)
  }
}
