package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.graftx.TextHashExpressions

/** The native text-hash kernels (sparkx.TextHashKernel) must be
  * VALUE-identical to the original HOF folds they replace — every
  * hashing query's oracle (sqlTokenHash / sqlDocFingerprint / the
  * minhash mirrors) grades against those values, so a divergence is a
  * correctness break across ~30 rows. Fuzzes kernel ≡ HOF on random
  * strings over several alphabets (multi-space runs, empty tokens,
  * multi-byte code points, empty string), plus the real corpus texts.
  */
class TextHashSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSession.spark
  import spark.implicits._

  // the ORIGINAL pure-functions formulations, kept here as the spec
  private def hofTokenHash(t: org.apache.spark.sql.Column) =
    aggregate(filter(split(t, ""), c => c =!= ""), lit(0L),
      (acc, c) => (acc * 31L + ascii(c)) % graft.functions.TextFunctions.Mod)
  private def hofDocFingerprint(text: org.apache.spark.sql.Column) =
    aggregate(split(text, " "), lit(0L),
      (acc, t) => (acc * 31L + hofTokenHash(t)) % graft.functions.TextFunctions.Mod)
  private def hofMinhashSig(text: org.apache.spark.sql.Column) =
    aggregate(transform(array_distinct(split(text, " ")), t => hofTokenHash(t)),
      array_repeat(lit(graft.functions.TextFunctions.Mod), graft.functions.TextFunctions.MinhashH),
      (acc, h) => zip_with(acc, sequence(lit(0), lit(graft.functions.TextFunctions.MinhashH - 1)),
        (m, i) => least(m, ((lit(2L) * i + 1L) * h + lit(7919L) * i) % graft.functions.TextFunctions.Mod)))

  private def fuzzStrings: Seq[String] = {
    val rnd = new scala.util.Random(20260815L)
    val alphabets = Seq("ab ", "abcdefgh  ", "abcdefghijklmnopqrstuvwxyz0123456789 ", "日本語 中文 ", "aé≤ b")
    val rand = for (trial <- 0 until 400) yield {
      val alpha = alphabets(trial % alphabets.size)
      Array.fill(rnd.nextInt(120))(alpha(rnd.nextInt(alpha.length))).mkString
    }
    rand ++ Seq("", " ", "  ", "a", "a ", " a", "a  b", "single")
  }

  test("kernel tokenHash / docFingerprint / minhashSig ≡ HOF folds on fuzz strings") {
    val df = fuzzStrings.toDF("text")
    val bad = df.select(
        TextHashExpressions.tokenHash(col("text")).as("k_th"),
        hofTokenHash(col("text")).as("h_th"),
        TextHashExpressions.docFingerprint(col("text")).as("k_fp"),
        hofDocFingerprint(col("text")).as("h_fp"),
        TextHashExpressions.minhashSig(col("text"), graft.functions.TextFunctions.MinhashH).as("k_mh"),
        hofMinhashSig(col("text")).as("h_mh"))
      .where(col("k_th") =!= col("h_th") || col("k_fp") =!= col("h_fp") ||
        col("k_mh") =!= col("h_mh"))
    assert(bad.count() == 0L, bad.limit(3).collect().mkString("; "))
  }

  test("kernel ≡ HOF on the real sf0.001 corpus texts") {
    val d = graft.core.Tables.load(spark, TestSession.Sf0001, "documents")
    val bad = d.select(
        TextHashExpressions.docFingerprint(col("text")).as("k_fp"),
        hofDocFingerprint(col("text")).as("h_fp"),
        TextHashExpressions.minhashSig(col("text"), graft.functions.TextFunctions.MinhashH).as("k_mh"),
        hofMinhashSig(col("text")).as("h_mh"))
      .where(col("k_fp") =!= col("h_fp") || col("k_mh") =!= col("h_mh"))
    assert(bad.count() == 0L)
  }

  test("TextFunctions facade now routes to the kernels, values unchanged") {
    import graft.functions.TextFunctions
    val df = fuzzStrings.toDF("text")
    val bad = df.select(
        TextFunctions.tokenHash(col("text")).as("f_th"),
        hofTokenHash(col("text")).as("h_th"),
        TextFunctions.docFingerprint(col("text")).as("f_fp"),
        hofDocFingerprint(col("text")).as("h_fp"),
        TextFunctions.minhashSig(col("text")).as("f_mh"),
        hofMinhashSig(col("text")).as("h_mh"))
      .where(col("f_th") =!= col("h_th") || col("f_fp") =!= col("h_fp") ||
        col("f_mh") =!= col("h_mh"))
    assert(bad.count() == 0L)
  }
}
