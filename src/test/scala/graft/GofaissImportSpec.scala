package graft

import java.io.{FileOutputStream, OutputStreamWriter}
import java.nio.file.Files
import java.util.zip.GZIPOutputStream

import org.scalatest.funsuite.AnyFunSuite

import graft.core.Metric
import graft.io.{GofaissImport, IndexIO, Migrations}
import graft.query.Searcher

/** gofaiss flat-index JSON import (pkg/storage/serialize.go:27-73 format:
  * a stream of root-level JSON documents — dim, then the Vector array —
  * optionally gzipped). */
class GofaissImportSpec extends AnyFunSuite {

  lazy val spark = TestSession.spark

  // what gofaiss's json.Encoder emits for Save(): dim doc, then vectors doc
  private val fixture =
    """3
      |[
      |  {
      |    "ID": 7,
      |    "Data": [1.0, 0.0, 0.0],
      |    "Norm": 1.0
      |  },
      |  {
      |    "ID": 8,
      |    "Data": [0.0, 2.0, 0.0],
      |    "Norm": 2.0
      |  },
      |  {
      |    "ID": 9,
      |    "Data": [0.0, 0.0, 3.0],
      |    "Norm": 3.0
      |  }
      |]
      |""".stripMargin

  test("plain JSON import round-trips into the Parquet layout") {
    val src = Files.createTempFile("gofaiss", ".json")
    Files.writeString(src, fixture)
    val dest = Files.createTempDirectory("graft_import").toString
    val (vectors, metric) = GofaissImport.importFlat(spark, src.toString, dest)
    assert(metric == Metric.L2)
    val rows = vectors.orderBy("id").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(7L, 8L, 9L))
    assert(rows(1).getSeq[Double](1) == Seq(0.0, 2.0, 0.0))
    // migration stamped the current version; registry has the path
    assert(IndexIO.readMeta(dest)("version") == "1.0.0")
    assert(IndexIO.readMeta(dest)("dim") == "3")
    assert(Migrations.registered.contains("gofaiss->1.0.0"))
    // the imported index opens through the type-detecting facade
    import spark.implicits._
    val q = Seq((0L, Seq(0.0, 2.1, 0.0))).toDF("query_id", "qvec")
    val hit = Searcher.open(spark, dest).withK(1).search(q).collect().head
    assert(hit.getLong(1) == 8L)
  }

  test("gzipped import") {
    val src = Files.createTempFile("gofaiss", ".json.gz")
    val w = new OutputStreamWriter(
      new GZIPOutputStream(new FileOutputStream(src.toFile)), "UTF-8")
    w.write(fixture); w.close()
    val dest = Files.createTempDirectory("graft_import_gz").toString
    val (vectors, _) =
      GofaissImport.importFlat(spark, src.toString, dest, Metric.Cosine, gzipped = true)
    assert(vectors.count() == 3)
    assert(IndexIO.readMeta(dest)("metric") == "cosine")
  }

  test("malformed files fail loudly") {
    val empty = Files.createTempFile("gofaiss_bad", ".json")
    Files.writeString(empty, "")
    intercept[IllegalArgumentException](
      GofaissImport.importFlat(spark, empty.toString,
        Files.createTempDirectory("graft_bad").toString))
    val wrongDim = Files.createTempFile("gofaiss_bad2", ".json")
    Files.writeString(wrongDim, "2\n[{\"ID\":1,\"Data\":[1.0],\"Norm\":1.0}]\n")
    intercept[IllegalArgumentException](
      GofaissImport.importFlat(spark, wrongDim.toString,
        Files.createTempDirectory("graft_bad2").toString))
  }
}
